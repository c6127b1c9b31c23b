from .reverse import adjacency_list, reverse_graph  # noqa: F401
from .sssp import sssp  # noqa: F401
