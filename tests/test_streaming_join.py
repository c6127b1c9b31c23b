"""Stream-stream interval join semantics on a tiny synthetic events
table (written as TIMESTAMP(NANOS) parquet, the testdata's layout):
in-window pair kept, boundary (exactly +1h) kept, out-of-window and
viewless purchases dropped.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_sssp_spark.streaming.joins import streaming_view_purchase_join


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny-events")
    rows = [
        # event_id, ts, user_id, event_type, value
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:30:00", 1, "purchase", 9.5),   # in window of view 1
        (3, "2024-01-01 11:30:00", 1, "purchase", 3.25),  # out of view 1, in view 5
        (5, "2024-01-01 11:00:00", 1, "view", 0.0),
        (4, "2024-01-01 10:15:00", 2, "purchase", 7.0),   # user 2 has no view
        (6, "2024-01-01 09:00:00", 3, "view", 0.0),
        (7, "2024-01-01 10:00:00", 3, "purchase", 1.0),   # exactly +1h: kept
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("ns")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
    )
    # version>=2.6 keeps nanosecond resolution (matches /root/testdata)
    pq.write_table(table, d / "events.parquet", version="2.6")
    return str(d)


def test_interval_join_pairs(spark, tiny_events_dir):
    out = streaming_view_purchase_join(spark, tiny_events_dir)
    pairs = {(r.view_id, r.purchase_id) for r in out.collect()}
    assert pairs == {(1, 2), (5, 3), (6, 7)}
    row = {r.purchase_id: r for r in out.collect()}
    assert row[2].purchase_value == 9.5
    assert row[7].user_id == 3
