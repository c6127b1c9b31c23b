"""Probe corpus for the r12 NaN/Infinity wave: copy the adversarial
corpus and plant non-finite doubles (NaN, +Inf, -Inf) in every
double-typed measure column — events.value, lineitem's
quantity/extendedprice/discount/tax, orders.o_totalprice.

Non-finite measures are the one value-domain the NULL (r11-r12) and
magnitude (r11 embeddings 1e19) waves never covered, and they sit in a
different failure class: a NULL is skipped by SQL aggregates, but a NaN
POISONS the sum in both engines, and a non-finite value ANSI-crashes
Spark's CAST(... AS BIGINT) cents carriers where DuckDB's cast also
raises — a whole-job outage, not just a wrong row.

Rows are constructed LOAD-BEARING where the affected query aggregates
per-group: each non-finite cell sits in a group that also has finite
members, so an engine that silently drops vs poisons vs crashes gives
three distinguishable outcomes.

Usage: python tools/make_nonfinite_probe.py [/tmp/sf_nonfinite]
       python tools/check_oracle.py /tmp/sf_nonfinite   # the sweep
"""

from __future__ import annotations

import pathlib
import shutil
import sys

import duckdb

SRC = "/tmp/sf_adv_r12"

EVENT_ROWS = """
    (30000001, TIMESTAMP '2024-03-01 00:00:00', 31, 'view',
     CAST('NaN' AS DOUBLE), NULL),
    (30000002, TIMESTAMP '2024-03-01 00:01:00', 31, 'view', 7.0, NULL),
    (30000003, TIMESTAMP '2024-03-01 00:02:00', 32, 'purchase',
     CAST('Infinity' AS DOUBLE), NULL),
    (30000004, TIMESTAMP '2024-03-01 00:03:00', 32, 'purchase', 9.0, NULL),
    (30000005, TIMESTAMP '2024-03-01 00:04:00', 33, 'click',
     CAST('-Infinity' AS DOUBLE), NULL)
"""

LINEITEM_ROWS = """
    -- NaN quantity in a 2-row order: feeds weighted sums, casts, and
    -- the B1 edge weight (grammar can render 'NaN' silently!)
    (30000001, 9201, 9201, 1, CAST('NaN' AS DOUBLE), 100.00, 0.01, 0.02,
     'N', 'O', TIMESTAMP '1997-07-01 00:00:00'),
    (30000001, 9202, 9202, 2, 2.0, 100.00, 0.01, 0.02,
     'N', 'O', TIMESTAMP '1997-07-01 00:00:00'),
    -- Inf extendedprice: cents cast CAST(ep*100 AS DECIMAL/BIGINT)
    (30000002, 9203, 9203, 1, 1.0, CAST('Infinity' AS DOUBLE), 0.01, 0.02,
     'N', 'O', TIMESTAMP '1997-07-02 00:00:00'),
    -- NaN extendedprice
    (30000003, 9204, 9204, 1, 1.0, CAST('NaN' AS DOUBLE), 0.01, 0.02,
     'R', 'F', TIMESTAMP '1997-07-03 00:00:00'),
    -- -Inf quantity, NaN discount/tax
    (30000004, 9205, 9205, 1, CAST('-Infinity' AS DOUBLE), 100.00,
     CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE),
     'A', 'F', TIMESTAMP '1997-07-04 00:00:00')
"""

ORDER_ROWS = """
    (30000001, 1, 'O', CAST('NaN' AS DOUBLE),
     TIMESTAMP '1997-07-01 00:00:00', '1-URGENT'),
    (30000002, 1, 'O', CAST('Infinity' AS DOUBLE),
     TIMESTAMP '1997-07-02 00:00:00', '2-HIGH')
"""


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_nonfinite"
    p = pathlib.Path(out)
    p.mkdir(parents=True, exist_ok=True)
    for t in (
        "region nation customer supplier part documents embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES {EVENT_ROWS}
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES {LINEITEM_ROWS}
          ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
              l_extendedprice, l_discount, l_tax, l_returnflag,
              l_linestatus, l_shipdate)
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{SRC}/orders.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES {ORDER_ROWS}
          ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              o_orderdate, o_orderpriority)
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)"""
    )
    print(f"wrote non-finite probe corpus to {out}")


if __name__ == "__main__":
    main()
