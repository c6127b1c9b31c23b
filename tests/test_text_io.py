"""The reference's two text input contracts, exercised on literal files.

Parse semantics under test (cited against the reference):
* weighted edge list: 4 space-separated fields, edge id DISCARDED
  (SingleSourceSP.java:60-66)
* TSV edge list: lines not starting with a digit are SKIPPED —
  SNAP-style '#' headers tolerated (ReverseGraph.java:110-128)
"""

from __future__ import annotations

from mapreduce_sssp_spark.io.sources import read_edge_list_text, read_tsv_edge_list


def test_weighted_edge_list_discards_edge_id(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("0 1 2 3.5\n999 2 3 0.25\n")
    rows = sorted(
        read_edge_list_text(spark, str(p)).collect(), key=lambda r: r.src
    )
    assert [tuple(r) for r in rows] == [(1, 2, 3.5), (2, 3, 0.25)]
    assert read_edge_list_text(spark, str(p)).columns == ["src", "dst", "weight"]


def test_tsv_edge_list_skips_comments(spark, tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text("# Directed graph\n# Nodes: 3\n1\t2\n2\t3\nc stray line\n10\t1\n")
    rows = sorted(read_tsv_edge_list(spark, str(p)).collect(), key=lambda r: (r.src, r.dst))
    assert [tuple(r) for r in rows] == [(1, 2), (2, 3), (10, 1)]


def test_python_datasource_tolerates_whitespace_variants(spark, tmp_path):
    """The custom Python data source must match the reference's
    StringTokenizer tolerance (SingleSourceSP.java:60-66): tabs and
    repeated spaces separate fields; malformed field counts are skipped
    rather than failing the partition."""
    from mapreduce_sssp_spark.io.python_datasource import register

    p = tmp_path / "edges.txt"
    p.write_text(
        "0 1 2 3.5\n"
        "1\t2\t3\t0.25\n"        # tab-separated
        "2  3   4  1.0\n"        # repeated spaces
        "# comment line\n"
        "3 9 9\n"                # wrong field count: skipped
    )
    register(spark)
    rows = sorted(
        spark.read.format("edgelist").load(str(p)).collect(),
        key=lambda r: r.src,
    )
    assert [(r.src, r.dst, r.weight) for r in rows] == [
        (1, 2, 3.5),
        (2, 3, 0.25),
        (3, 4, 1.0),
    ]


def test_python_datasource_byte_range_splits(spark, tmp_path):
    """Byte-range splitting must assign every line to exactly one split
    (Hadoop LineRecordReader ownership: a line belongs to the split
    whose (start, end] contains its first byte). Tiny split sizes force
    many splits with boundaries landing mid-line and exactly on
    newlines; the multiset of rows must equal the single-split read."""
    from mapreduce_sssp_spark.io.python_datasource import (
        EdgeListReader,
        register,
    )

    p = tmp_path / "edges.txt"
    lines = [f"{i} {i % 7} {i % 11} {i}.25" for i in range(200)]
    p.write_text("\n".join(lines) + "\n")

    register(spark)
    whole = sorted(
        spark.read.format("edgelist").load(str(p)).collect(),
        key=lambda r: r.edge_id,
    )
    assert len(whole) == 200

    # Sweep split sizes around line-length scale so boundaries hit every
    # phase of a line, including exactly-on-newline.
    for split_bytes in (7, 13, 16, 64, 1 << 20):
        split = sorted(
            spark.read.format("edgelist")
            .option("split_bytes", str(split_bytes))
            .load(str(p))
            .collect(),
            key=lambda r: r.edge_id,
        )
        assert split == whole, f"split_bytes={split_bytes}"

    # The partition planner itself must cover the file exactly once.
    reader = EdgeListReader({"path": str(p), "split_bytes": "16"})
    parts = reader.partitions()
    size = p.stat().st_size
    assert parts[0].start == 0 and parts[-1].end == size
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start


def test_rolling_fingerprint_polynomial(spark, tmp_path):
    """Hand-computed Rabin-Karp values on a tiny corpus, plus edge cases
    (empty text -> NULLs, text shorter than the window -> no winnow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_sssp_spark.operators.text_analysis import (
        RH_B,
        RH_K,
        RH_M,
        q_rolling_fingerprint,
    )

    docs = pa.table({"doc_id": [1, 2, 3], "text": ["abcdefghij", "", "hi"]})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r for r in q_rolling_fingerprint(spark, str(tmp_path)).collect()
    }

    def poly(s):
        a = 0
        for ch in s:
            a = (a * RH_B + ord(ch)) % RH_M
        return a

    s = "abcdefghij"
    assert out[1].content_hash == poly(s)
    assert out[1].winnow_min == min(
        poly(s[i : i + RH_K]) for i in range(len(s) - RH_K + 1)
    )
    assert out[1].n_windows == len(s) - RH_K + 1
    assert (out[2].winnow_min, out[2].content_hash, out[2].n_windows) == (
        None,
        None,
        0,
    )
    assert out[3].winnow_min is None and out[3].content_hash == poly("hi")


def test_bpe_merges_planted_corpus(spark):
    """Planted corpus with known pair counts, including a tie on merge 3
    resolved by the (lhs, rhs) lexicographic tie-break:

    'aaab aaab cd cd cd' -> word counts {aaab: 2, cd: 3}
      merge 1: (a,a) n=4   [two positional (a,a) pairs per 'aaab']
      merge 2: (c,d) n=3   [(aa,a) and (a,b) are only 2 after merge 1]
      merge 3: (a,b) n=2   [ties (aa,a) at 2; 'a' < 'aa' lexicographically]
    """
    from mapreduce_sssp_spark.operators.text_analysis import bpe_merge_table

    docs = spark.sql("SELECT 1L AS doc_id, 'aaab aaab cd cd cd' AS text")
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merge_table(docs).collect()
    ]
    assert got == [(1, "a", "a", 4), (2, "c", "d", 3), (3, "a", "b", 2)]


def test_bpe_encode_planted_corpus(spark):
    """Encoding with the learned merges: 'aaab' -> [aa, ab], 'cd' -> [cd],
    so corpus symbol frequencies are cd:3, aa:2, ab:2 (freq DESC, sym)."""
    from mapreduce_sssp_spark.operators.text_analysis import _learn_bpe
    from pyspark.sql import functions as F

    docs = spark.sql("SELECT 1L AS doc_id, 'aaab aaab cd cd cd' AS text")
    _, words = _learn_bpe(docs, 3)
    freqs = (
        words.select(
            F.explode(
                F.expr("filter(split(trim(s), ' '), x -> x != '')")
            ).alias("sym"),
            "cnt",
        )
        .groupBy("sym")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.desc("freq"), "sym")
        .collect()
    )
    assert [(r.sym, r.freq) for r in freqs] == [("cd", 3), ("aa", 2), ("ab", 2)]


def test_gopher_quality_rules_matches_python(spark):
    import duckdb

    from mapreduce_sssp_spark.operators.text_analysis import (
        GOPHER_MIN_WORDS,
        q_gopher_quality_rules,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT source, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    required = {"the", "a", "to", "of", "and", "that", "have", "with"}
    agg = {}
    for source, text in rows:
        toks = [t for t in text.strip().split() if t]
        nw = len(toks)
        sl = sum(len(t) for t in toks)
        nsw = len(set(toks) & required)
        na = sum(1 for t in toks if t.isalpha() and t.islower())
        f1 = nw < GOPHER_MIN_WORDS
        f2 = not (3 * nw <= sl <= 10 * nw)
        f3 = nsw < 2
        f4 = 5 * na < 4 * nw
        c = agg.setdefault(source, [0, 0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += f1
        c[2] += f2
        c[3] += f3
        c[4] += f4
        c[5] += not (f1 or f2 or f3 or f4)
    got = {r.source: r for r in q_gopher_quality_rules(spark, sf).collect()}
    assert set(got) == set(agg)
    for s, (n, a1, a2, a3, a4, p) in agg.items():
        g = got[s]
        assert (g.n_docs, g.n_fail_short, g.n_fail_wordlen) == (n, a1, a2)
        assert (g.n_fail_stopwords, g.n_fail_alpha, g.n_pass_all) == (
            a3, a4, p,
        )


def test_tokenizer_unicode_whitespace_parity(spark):
    """The token contract is Java's default (non-unicode) \\s class:
    [ \\t\\n\\x0B\\f\\r]. The DuckDB twin must tokenize IDENTICALLY on
    text the ASCII testdata never exercises — unicode spaces (U+3000,
    NBSP, zero-width), vertical tab, CRLF — because every text/dedup
    oracle hash rides on it. Probed r10: DuckDB's trim() strips U+3000
    while Java \\s does not, so the twin now uses the explicit class
    with no trim (text_common module docstring)."""
    import duckdb
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.text_common import (
        DUCK_TOKENS,
        TOKENS_EXPR,
    )

    texts = [
        "a b",
        "  lead trail  ",
        "a\tb\x0bc\fd\re",
        "a\r\nb",
        "　x　",   # ideographic space: NOT \s in Java
        "a​b",         # zero-width space: not whitespace
        "a\xa0b",           # NBSP: not \s in Java
        "",
        "   ",
        "one",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: r.toks
        for r in df.select("i", F.expr(TOKENS_EXPR).alias("toks")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            f"SELECT {DUCK_TOKENS.replace('text', '?')}", [t]
        ).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)


def test_text_scrub_unicode_whitespace_parity(spark, tmp_path):
    """text_scrub's twin must mirror Spark trim (0x20 only) and Java \\s
    on unicode text — same divergence class as the tokenizer (bare
    DuckDB trim strips U+3000; RE2 \\s lacks \\x0B)."""
    import duckdb

    from mapreduce_sssp_spark.operators.text_analysis import (
        ORACLE,
        q_text_scrub,
    )

    texts = [
        "　abc 123　",      # ideographic-space padded: trim must NOT eat
        " x\x0by 42 ",        # vertical tab must collapse like Java \s
        "a\xa0b 7",           # NBSP preserved
        "  plain 99 text  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'src' AS source",
        "cast(length(text) AS long) AS n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.scrubbed, r.n_masked)
        for r in q_text_scrub(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        d: (s, n) for d, s, n in con.execute(ORACLE["text_scrub"]).fetchall()
    }
    assert got == want
