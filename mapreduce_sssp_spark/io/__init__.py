from .sources import (  # noqa: F401
    TABLES,
    edges_from_lineitem,
    edges_order_chain,
    load_table,
    read_edge_list_text,
    read_tsv_edge_list,
    register_tables,
)
