"""Custom Python data source (Spark 4 DataSource API) for the
reference's weighted edge-list text format.

The reference defines its input contract as a hand-written Hadoop
InputFormat consuming ``edgeId fromNode toNode distance`` lines
(SingleSourceSP.java:60-66). Spark's native answer to "a format the
built-in readers don't speak" is the Python DataSource API: declare the
schema, split the input into partitions, and yield typed rows —
Catalyst then treats the source like any other relation (column
pruning, downstream pushdown at the logical level, full parallelism
across partitions).

This is the API-surface demonstration: for THIS particular format the
csv reader with an explicit schema (io/sources.py:read_edge_list_text)
is the production path — JVM-side parsing always beats a Python reader.
The DataSource earns its keep on formats no builtin covers (proprietary
binary layouts, quirky scientific formats), where the alternative is a
driver-side preprocessing step that breaks the single-plan pipeline.

At 100 TB: InputPartitions are BYTE-RANGE SPLITS within files (Hadoop
text-split semantics: a split reads the lines whose first byte falls in
(start, end], plus line 0 for the first split), so a single multi-GB
file fans out across the cluster instead of serializing on one task.
``split_bytes`` (default 32 MB) controls the granularity; each split
parses independently executor-side and nothing funnels through the
driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

DEFAULT_SPLIT_BYTES = 32 << 20


class EdgeListDataSource(DataSource):
    """``spark.read.format("edgelist").load(dir)`` for the reference's
    space-separated weighted edge list."""

    @classmethod
    def name(cls) -> str:
        return "edgelist"

    def schema(self) -> str:
        return "edge_id bigint, src bigint, dst bigint, weight double"

    def reader(self, schema) -> "EdgeListReader":
        return EdgeListReader(self.options)

    def writer(self, schema, overwrite: bool) -> "EdgeListWriter":
        return EdgeListWriter(self.options, overwrite)


class _SplitPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class EdgeListReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgelist source requires a path")
        self.split_bytes = int(
            options.get("split_bytes", DEFAULT_SPLIT_BYTES)
        )
        if self.split_bytes < 1:
            raise ValueError("split_bytes must be positive")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        parts = []
        for f in files:
            size = os.path.getsize(f)
            start = 0
            while start < size:
                end = min(start + self.split_bytes, size)
                parts.append(_SplitPartition(f, start, end))
                start = end
        if not parts:
            # Zero-byte input (or a dir of only metadata files): the
            # Python DataSource API hands read() a None partition when
            # partitions() is empty, so return one zero-range dummy —
            # read() yields nothing for an empty range.
            parts.append(
                _SplitPartition(files[0] if files else self.path, 0, 0)
            )
        return parts

    def read(self, partition):
        """Yield the rows whose line starts inside this split, as ONE
        Arrow RecordBatch per split.

        Ownership rule (identical to Hadoop's LineRecordReader): a line
        belongs to the split whose (start, end] range contains its first
        byte — the first split also owns byte 0. Concretely: every split
        with start > 0 discards the first readline() (owned by its
        predecessor, which reads past its own end to finish that line);
        the whole owned byte range is then read in one slurp and the
        tail line finished (or, when the slurp ends exactly on a
        newline at offset ``end``, the line STARTING at ``end`` — which
        this split owns — appended). Every line is read exactly once
        across splits.

        Per-task work is vectorized (optimization guide §4.2): the slice
        is parsed by pandas' C csv engine with whitespace-run
        tokenization — the same semantics as the old per-line Python
        path (``strip()`` + leading-char-isdigit comment skip +
        ``split()`` + skip-on-wrong-field-count + crash on a 4-field
        line with a non-numeric field) — and handed back to Spark as an
        Arrow batch instead of per-row tuples, removing both the
        per-line Python interpreter work and the per-row
        pickle-into-Row conversion (measured ~4x on the roundtrip
        queries).
        """
        if partition.end <= partition.start:
            return  # zero-range dummy for empty inputs: no rows
        import io
        import warnings as _warnings

        import pandas as pd
        import pyarrow as pa

        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                fh.readline()  # predecessor owns the line spanning start
            data_start = fh.tell()
            if data_start > partition.end:
                return  # the spanning line swallowed the whole range
            buf = fh.read(partition.end - data_start)
            # Finish the owned tail: either the last line continues past
            # ``end`` (this split owns it — it STARTS inside), or the
            # slurp ended exactly on a newline at ``end`` and the next
            # line starts AT ``end`` (owned: the old loop's
            # ``tell() > end`` check reads a line starting at == end).
            if not buf.endswith(b"\n") or fh.tell() <= partition.end:
                buf += fh.readline()
        if not buf.strip():
            return
        with _warnings.catch_warnings():
            # delim_whitespace is the C-engine whitespace-run tokenizer
            # (StringTokenizer semantics); the deprecated-alias warning
            # is noise (sep="\\s+" would silently fall back to the slow
            # python engine).
            _warnings.simplefilter("ignore")
            parsed = pd.read_csv(
                io.BytesIO(buf),
                delim_whitespace=True,
                header=None,
                names=["edge_id", "src", "dst", "weight"],
                dtype=str,
                on_bad_lines="skip",  # >4 fields: skipped, as before
                engine="c",
            )
        # Comment tolerance: keep lines whose first non-blank char is a
        # digit; <4-field lines arrive NaN-padded and are skipped (the
        # old loop's len(fields) != 4 continue).
        mask = parsed["edge_id"].str.match(r"\d", na=False)
        for c in ("src", "dst", "weight"):
            mask &= parsed[c].notna()
        kept = parsed[mask]
        if kept.empty:
            return
        # Numeric casts crash on a 4-field line with a malformed value —
        # identical failure contract to the old int()/float() calls.
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(kept["edge_id"].astype("int64"), type=pa.int64()),
                pa.array(kept["src"].astype("int64"), type=pa.int64()),
                pa.array(kept["dst"].astype("int64"), type=pa.int64()),
                pa.array(kept["weight"].astype("float64"), type=pa.float64()),
            ],
            names=["edge_id", "src", "dst", "weight"],
        )


class _WroteFile(WriterCommitMessage):
    """Picklable per-task message: the staged file this task produced."""

    def __init__(self, staged: str):
        self.staged = staged


class EdgeListWriter(DataSourceArrowWriter):
    """The WRITE half of the custom source — the sink contract of the
    reference's text format through the same Python DataSource API:
    ``df.write.format("edgelist").mode(...).save(dir)``.

    Tasks stage ``_staged-*`` part files and report them in their
    commit message; visibility is COMMIT-TIME RENAME on the driver —
    the two-phase pattern every production sink uses, so a failed or
    speculated task's staged output is never observable and abort()
    can discard it. Each task writes its own file (no driver funnel);
    local-FS rename semantics here, an object-store commit protocol at
    cluster scale.

    r12: ``DataSourceArrowWriter`` — write() receives Arrow record
    batches instead of pickled Rows, and each batch is rendered by
    pandas' C csv writer (optimization guide §4.2) rather than a
    per-row f-string. Same bytes contract: space-separated
    ``edge_id src dst weight`` with shortest-roundtrip float text (the
    C writer emits repr-shortest doubles — pinned by
    tests/test_python_datasource.py's byte-flip roundtrip).
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgelist sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _WroteFile:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f"_staged-{uuid.uuid4().hex}.txt"
        )
        cols = ["edge_id", "src", "dst", "weight"]
        with open(staged, "w", encoding="utf-8", newline="") as out:
            for batch in iterator:
                # Column selection by NAME (the old row.edge_id
                # attribute access): a differently-ordered input frame
                # still writes the contract's field order.
                df = batch.to_pandas()[cols]
                df.to_csv(
                    out,
                    sep=" ",
                    header=False,
                    index=False,
                    lineterminator="\n",
                )
        return _WroteFile(staged)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if not f.startswith("_staged-") and not f.startswith("."):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            final = os.path.join(
                self.path,
                os.path.basename(m.staged).replace("_staged-", "part-"),
            )
            os.replace(m.staged, final)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged)
            except OSError:
                pass


def register(spark: SparkSession) -> None:
    """Idempotently register the source on a session. Registration is
    attempted every call — an id()-keyed cache would go stale when a
    session is stopped and a new one reuses the address; duplicate
    registration just replaces the entry (and any error from an older
    Spark that rejects duplicates is non-fatal by construction)."""
    try:
        spark.dataSource.register(EdgeListDataSource)
    except Exception:  # noqa: BLE001 — duplicate registration only
        pass


def q_pyds_edges_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the B1 edges in the reference's text format, read them back
    through the custom Python data source, and return (src, dst, weight)
    — the same oracle as the csv-scan roundtrip, proving the custom
    source parses the contract identically."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources import edges_from_lineitem

    register(spark)
    e = edges_from_lineitem(spark, sf_dir).withColumn(
        "edge_id", F.monotonically_increasing_id()
    )
    # Deterministic sf-keyed path + overwrite: repeated runs reuse one
    # directory instead of accumulating mkdtemp copies.
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-pyds-" + sf_dir.strip("/").replace("/", "_"),
        "edges",
    )
    e.select(
        F.concat_ws(
            " ", "edge_id", "src", "dst", F.col("weight").cast("string")
        ).alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.format("edgelist").load(path)
    return back.select("src", "dst", "weight")


def q_pyds_edges_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full custom-source cycle, BOTH halves Python API: write the
    B1 edges through the custom DataSourceWriter (two-phase staged
    commit), read them back through the custom DataSourceReader, prove
    byte-level losslessness against the source table — the reference's
    complete text I/O contract re-expressed as one Spark format."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources import edges_from_lineitem

    register(spark)
    e = edges_from_lineitem(spark, sf_dir).withColumn(
        "edge_id", F.monotonically_increasing_id()
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-pyds-" + sf_dir.strip("/").replace("/", "_"),
        "edges_written",
    )
    e.select("edge_id", "src", "dst", "weight").write.format(
        "edgelist"
    ).mode("overwrite").save(path)
    back = spark.read.format("edgelist").load(path)
    return back.select("src", "dst", "weight")


QUERIES = {
    "pyds_edges_roundtrip": q_pyds_edges_roundtrip,
    "pyds_edges_writer_roundtrip": q_pyds_edges_writer_roundtrip,
}

_B1_SQL = (
    # B1 edge contract (io.sources.EDGES_SQL mirror, r12: endpoints
    # too): the text format is "src dst:weight" and the writer cannot
    # render a weightless or endpoint-less edge (r11 NULL sweep:
    # f-string of None crashed it; r12 NULL-node-id sweep extended the
    # contract to src/dst).
    "SELECT l_suppkey AS src, l_partkey AS dst, l_quantity AS weight"
    " FROM lineitem WHERE l_suppkey IS NOT NULL"
    " AND l_partkey IS NOT NULL AND isfinite(l_quantity)"
)

ORACLE = {
    "pyds_edges_roundtrip": _B1_SQL,
    "pyds_edges_writer_roundtrip": _B1_SQL,
}
