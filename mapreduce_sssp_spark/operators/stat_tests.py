"""Distribution tests, concentration indices, and corpus-mix operators
— the round-8 statistics batch.

Extends the engine's model-monitoring / data-audit family
(mann_whitney_u, psi_stability, distribution_drift) with:

* ``ks_two_sample``       — exact Kolmogorov–Smirnov D per type pair
* ``spearman_corr``       — Spearman rank correlation (tie-averaged)
* ``cramers_v``           — chi-square + Cramér's V on a contingency
* ``hhi_concentration``   — Herfindahl–Hirschman index per nation
* ``degree_gini``         — Gini coefficient of the out-degree dist
* ``harmonic_centrality`` — landmark harmonic centrality (projection)
* ``temperature_mix_weights`` — sqrt-temperature corpus mixing weights
* ``js_divergence_sources``   — Jensen–Shannon drift between sources
* ``calibration_bins``    — reliability diagram over a classifier score
* ``lift_deciles``        — cumulative-gains / lift table (ntile(10))

Exactness contract (the mann_whitney/psi devices, reused verbatim):
everything that can be integer IS integer — histogram rank algebra,
cross-multiplied ECDF differences, quantize-then-sum for transcendental
terms (each ln/sqrt term is ONE identical correctly-rounded float
expression in both engines, quantized to a BIGINT before any
aggregation, so no order-dependent float accumulation ever crosses an
exchange). Final scalar statistics take one closing float expression
with the same operand sequence in both engines.

At 100 TB every operator here reduces the corpus to a histogram or a
per-group aggregate in ONE map-side-combined pass; all test statistics
run on that small aggregate. Nothing in this module joins row-level
data against row-level data except spearman_corr's rank back-join,
which is the standard two-pass ranking shape (histogram out, ranks
back on the value key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contracts import finite
from ..io.sources import EDGES_SQL, load_parallel, load_table
from .graph_queries import LANDMARKS_K, _landmark_state
from .text_common import DUCK_TOKENS, TOKENS_EXPR

CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test for every unordered pair of
    event types: the largest gap between the two value ECDFs — the
    all-purpose "did the distribution move?" test (location AND shape,
    where mann_whitney_u sees location only).

    Exact int64 all the way to D: with cumulative counts cumA/cumB at
    each distinct cents value, |ECDF_A - ECDF_B| = |cumA*nB - cumB*nA|
    / (nA*nB), so the max is taken over EXACT integer cross products
    and D itself is ONE closing division. The asymptotic statistic
    sqrt(nA*nB/(nA+nB)) * D is one division, one correctly-rounded
    sqrt, one multiply — identical in both engines.

    At 100 TB: corpus -> (type, cents) histogram in one map-side
    combined pass (the mann_whitney shape); pair expansion, cumulative
    windows, and the max all run on the |types| x |distinct cents|
    aggregate.
    """
    from pyspark.sql import Window

    hist = (
        load_table(spark, sf_dir, "events")
        # Required-column rail (r11 NULL sweep) extended to the finite-
        # measure contract (r12 non-finite probe: CAST(NaN AS BIGINT)
        # ANSI-crashes the cents carrier). Twin mirrors the WHERE.
        .filter(F.col("event_type").isNotNull() & finite("value"))
        .select("event_type", F.expr(CENTS).alias("cents"))
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("n"))
    )
    types = hist.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            F.broadcast(types.select(F.col("event_type").alias("type_b"))),
            F.col("type_a") < F.col("type_b"),
        )
    )
    ha = pairs.join(hist, F.col("event_type") == F.col("type_a")).select(
        "type_a", "type_b", "cents",
        F.col("n").alias("na_v"), F.lit(0).alias("nb_v"),
    )
    hb = pairs.join(hist, F.col("event_type") == F.col("type_b")).select(
        "type_a", "type_b", "cents",
        F.lit(0).alias("na_v"), F.col("n").alias("nb_v"),
    )
    merged = (
        ha.union(hb)
        .groupBy("type_a", "type_b", "cents")
        .agg(F.sum("na_v").alias("na_v"), F.sum("nb_v").alias("nb_v"))
    )
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wp = Window.partitionBy("type_a", "type_b")
    cum = merged.select(
        "type_a", "type_b",
        F.sum("na_v").over(w).alias("cum_a"),
        F.sum("nb_v").over(w).alias("cum_b"),
        F.sum("na_v").over(wp).alias("n_a"),
        F.sum("nb_v").over(wp).alias("n_b"),
    )
    agg = cum.groupBy("type_a", "type_b").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).alias("d_num"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    ks_d = F.col("d_num").cast("double") / (n_a * n_b).cast("double")
    return agg.select(
        "type_a", "type_b", "n_a", "n_b", "d_num",
        ks_d.alias("ks_d"),
        (
            F.sqrt((n_a * n_b).cast("double") / (n_a + n_b).cast("double"))
            * ks_d
        ).alias("ks_stat"),
    )


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and
    l_extendedprice over lineitem — the monotone-association screen
    (Pearson on tie-averaged ranks; robust to any monotone transform
    and to outliers, the first correlation a feature audit reaches
    for).

    Tie-averaged ranks via the mann_whitney histogram identity —
    DOUBLED rank of value v is the exact integer 2*C_v + t_v + 1 — so
    per-row ranks come from joining each row back to its value's
    histogram entry, never from a corpus-wide row_number. All six
    Pearson aggregates (n, Sx, Sy, Sxx, Syy, Sxy) are exact DECIMAL
    sums of integer products; rho is ONE closing float expression
    ((n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)))
    evaluated on identical correctly-rounded doubles in both engines.

    At 100 TB: two histogram passes (quantity has ~50 distinct values
    — broadcast; price is high-cardinality — its rank map joins back
    on the value key, the standard two-pass ranking shape), then one
    map-side-combined 6-way aggregate. No global sort, no
    single-partition window.
    """
    # Finite-measure contract (r12 non-finite probe: the bigint/decimal
    # carriers crash on NaN/Inf in both engines). Twin mirrors.
    # load_parallel (r12): the cents cast + the 6-way decimal-product
    # aggregate otherwise run on one scan task (exact sums — spread is
    # order-independent).
    li = (
        load_parallel(spark, sf_dir, "lineitem")
        .filter(finite("l_quantity") & finite("l_extendedprice"))
        .select(
            F.col("l_quantity").cast("bigint").alias("x"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("y"),
        )
    )

    def doubled_ranks(col: str) -> DataFrame:
        from pyspark.sql import Window

        h = li.groupBy(col).agg(F.count("*").alias("t"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return h.select(
            col,
            (
                2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1
            ).alias(f"dr_{col}"),
        )

    rx = doubled_ranks("x")
    ry = doubled_ranks("y")
    ranked = li.join(F.broadcast(rx), "x").join(ry, "y")
    dec = "decimal(19,0)"
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("dr_x").cast(dec)).alias("sx"),
        F.sum(F.col("dr_y").cast(dec)).alias("sy"),
        F.sum(F.col("dr_x").cast(dec) * F.col("dr_x").cast(dec)).alias("sxx"),
        F.sum(F.col("dr_y").cast(dec) * F.col("dr_y").cast(dec)).alias("syy"),
        F.sum(F.col("dr_x").cast(dec) * F.col("dr_y").cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # Radicand guard (the _pearson_from_sums convention, r10): an
    # all-tied side makes a radicand 0 (ANSI crash), and a rounding-
    # negative one makes Spark sqrt NaN where DuckDB sqrt RAISES.
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return agg.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
        ).alias("spearman_rho"),
    )


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test + Cramér's V on the event_type x
    ISO-weekday contingency table — "does event mix depend on the day
    of week?", the categorical-association audit (V is chi-square
    normalized to [0,1], comparable across table shapes).

    Quantize-then-sum (the psi device): each cell's chi-square
    contribution (o - e)^2 / e, with e = r*c/n evaluated as ONE
    identical float sequence, is rounded to an e9 BIGINT per cell and
    the per-cell integers are summed — so the table-wide total is an
    exact agg-order-free integer in both engines. V then takes one
    closing sqrt on the already-quantized total.

    At 100 TB: one corpus scan into the map-side (type, dow) count;
    the contingency table is |types| x 7 rows and everything else runs
    on it.
    """
    from pyspark.sql import Window

    cells = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.weekday("ts") + 1).cast("int").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("o"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wall = Window.partitionBy()
    with_margins = cells.select(
        "event_type", "dow", "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wall).alias("n"),
    )
    e = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    contrib_e9 = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
        / e * 1e9
    ).cast("long")
    quant = with_margins.select(
        "n", contrib_e9.alias("cell_e9"),
        F.col("event_type").alias("rk"), F.col("dow").alias("ck"),
    )
    agg = quant.groupBy("n").agg(
        F.sum("cell_e9").alias("chi2_e9"),
        F.count_distinct("rk").alias("n_rows"),
        F.count_distinct("ck").alias("n_cols"),
    )
    dof_min = F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
    return agg.select(
        "n", "n_rows", "n_cols", "chi2_e9",
        F.sqrt(
            F.col("chi2_e9").cast("double") / 1e9
            / (F.col("n") * dof_min).cast("double")
        ).alias("cramers_v"),
    )


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation — the antitrust/market-structure index (sum of squared
    percent shares; DOJ flags > 2500), and in a data pipeline the
    "is this partition dominated by one producer?" skew audit.

    HHI = 1e4 * sum(rev_i^2) / total^2 needs NO per-supplier division:
    revenues are exact cents, their squares sum in DECIMAL(38,0)
    (int64 would overflow at cluster scale), and the index is one
    closing float expression on two exact aggregates. effective_n
    (1/normalized-HHI, "equivalent equal-size suppliers") rides along
    from the same operands.

    At 100 TB: lineitem collapses to per-(nation, supplier) revenue in
    one map-side-combined agg (supplier->nation is a broadcast dim
    join), then per-nation second moments over the supplier aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nation"),
    )
    rev = (
        li.join(F.broadcast(supp), "l_suppkey")
        .groupBy("nation", "l_suppkey")
        .agg(F.sum("cents").alias("rev"))
    )
    dec = "decimal(38,0)"
    agg = rev.groupBy("nation").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("rev").alias("total_cents"),
        F.sum(F.col("rev").cast(dec) * F.col("rev").cast(dec)).alias("sum_sq"),
    )
    hhi = (
        F.col("sum_sq").cast("double")
        / (
            F.col("total_cents").cast("double")
            * F.col("total_cents").cast("double")
        )
        * 1e4
    )
    return agg.select(
        "nation",
        "n_suppliers",
        F.col("total_cents").cast("long").alias("total_cents"),
        F.round(hhi * 1e6).cast("long").alias("hhi_e6"),
        (
            F.lit(1e4)
            / (
                F.col("sum_sq").cast("double")
                / (
                    F.col("total_cents").cast("double")
                    * F.col("total_cents").cast("double")
                )
                * 1e4
            )
        ).alias("effective_n"),
    )


def q_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the graph's out-degree distribution — the
    one-number skew audit behind every "is this graph power-law enough
    to need the capped joins?" decision (see two_hop_paths_capped);
    0 = all nodes equal degree, ->1 = a few hubs own all edges.

    Exact histogram rank algebra (no per-node sort): with the degree
    histogram (d, cnt) and cum_before C_d nodes below d, the block of
    cnt nodes tied at d occupies ranks C_d+1 .. C_d+cnt, contributing
    d * (cnt*C_d + cnt*(cnt+1)/2) to sum(i * d_(i)) — all exact int64.
    Gini = (2*S - (n+1)*T) / (n*T) is one closing division on exact
    integers.

    At 100 TB: edges -> out-degree per node (one exchange) -> degree
    HISTOGRAM (map-side combined, thousands of rows at any scale); the
    rank window runs on the histogram.
    """
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    hist = deg.groupBy("d").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    blocks = hist.select(
        "d", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("c_below")
    )
    agg = blocks.agg(
        F.sum("cnt").alias("n_nodes"),
        F.sum(F.col("d") * F.col("cnt")).alias("sum_deg"),
        F.sum(
            F.col("d")
            * (
                F.col("cnt") * F.col("c_below")
                + F.expr("cnt * (cnt + 1) DIV 2")
            )
        ).alias("rank_weighted"),
    )
    n, t, s = F.col("n_nodes"), F.col("sum_deg"), F.col("rank_weighted")
    return agg.select(
        "n_nodes", "sum_deg",
        (
            (2 * s - (n + 1) * t).cast("double") / (n * t).cast("double")
        ).alias("gini"),
    )


HARMONIC_SCALE = 1_000_000_000_000  # 1e12: per-landmark 1/d quantum


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark harmonic centrality estimate: for every node, the sum
    of reciprocal distances from the k landmarks that reach it —
    harmonic centrality (Boldi & Vigna's preferred closeness variant:
    unreachable pairs contribute 0 instead of poisoning the mean, so
    it is well-defined on disconnected graphs where classic closeness
    is not).

    Pure projection over the SAME memoized converged landmark state as
    q_closeness_landmark — at 100 TB this is the read path of the
    landmark index, not a new fixpoint. Each reciprocal is quantized
    BEFORE aggregation: round(1e12 / d) is one correctly-rounded
    division + round on identical doubles in both engines, and the
    per-node sum is then exact integer addition (agg-order-free) — the
    quantize-then-sum device, here dodging the float-accumulation trap
    that a naive sum(1.0/d) would hit.
    """
    st = _landmark_state(spark, sf_dir)
    reach = st.filter(F.col("node") != F.col("landmark"))
    return reach.groupBy("node").agg(
        F.count("*").alias("n_reach"),
        F.sum(
            F.round(F.lit(float(HARMONIC_SCALE)) / F.col("dist")).cast("long")
        ).alias("harmonic_e12"),
    )


def q_temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing weights per source — the
    multilingual/multi-domain sampling scheme (Conneau & Lample's
    p_i ~ n_i^alpha with alpha = 0.5): up-weight small sources,
    down-weight dominant ones, so the training mix is less skewed than
    the raw corpus without going uniform.

    alpha = 1/2 is chosen deliberately: n^0.5 is ONE correctly-rounded
    sqrt (pow(x, alpha) for general alpha is NOT a correctly-rounded
    libm call and may differ across engines). Each weight is quantized
    to an e6 BIGINT before the normalizing sum (quantize-then-sum), so
    the denominator is exact and shares/boosts are single closing
    float expressions. boost = share / (n_i/N) is the over-sampling
    factor a data loader applies per source.

    At 100 TB: one map-side-combined count per source; everything else
    runs on |sources| rows.
    """
    from pyspark.sql import Window

    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    w_e6 = F.round(F.sqrt(F.col("n_docs").cast("double")) * 1e6).cast("long")
    wall = Window.partitionBy()
    quant = counts.select(
        "source", "n_docs", w_e6.alias("w_e6"),
        F.sum(w_e6).over(wall).alias("tot_w"),
        F.sum("n_docs").over(wall).alias("tot_n"),
    )
    share = F.col("w_e6").cast("double") / F.col("tot_w").cast("double")
    return quant.select(
        "source", "n_docs", "w_e6",
        share.alias("share"),
        (
            share
            * (F.col("tot_n").cast("double") / F.col("n_docs").cast("double"))
        ).alias("boost"),
    )


def q_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the token distributions of
    every source pair — the corpus-drift matrix ("which sources speak
    the same language?") behind mixture design and contamination
    triage; symmetric, bounded by ln 2, defined even where one side
    has zero-probability tokens (unlike KL).

    Per-token contribution 0.5*(p*ln(2p/(p+q)) + q*ln(2q/(p+q))) (a
    one-sided term degenerates to 0.5*p*ln 2) is ONE identical float
    sequence per engine, quantized to an e12 BIGINT, then summed as
    exact integers per pair — quantize-then-sum, the psi_stability ln
    contract: the engines' ln() agree on identical inputs, and the
    e12 quantum keeps any knife-edge rounding 3 orders below the
    reported e9 precision.

    At 100 TB: corpus -> (source, token) counts in one map-side
    combined pass; the pair expansion and divergence run on the
    |sources| x |vocab| aggregate, with Zipf-head tokens riding AQE
    skew-split like every hot-key groupBy.
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.expr(TOKENS_EXPR)).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    srcs = tok.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("src_a")).join(
        F.broadcast(srcs.select(F.col("source").alias("src_b"))),
        F.col("src_a") < F.col("src_b"),
    )
    ta = pairs.join(tok, F.col("source") == F.col("src_a")).select(
        "src_a", "src_b", "token",
        F.col("n").alias("a"), F.lit(0).alias("b"),
    )
    tb = pairs.join(tok, F.col("source") == F.col("src_b")).select(
        "src_a", "src_b", "token",
        F.lit(0).alias("a"), F.col("n").alias("b"),
    )
    merged = (
        ta.union(tb)
        .groupBy("src_a", "src_b", "token")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("src_a", "src_b")
    tot = merged.select(
        "src_a", "src_b", "a", "b",
        F.sum("a").over(wp).alias("n_a"),
        F.sum("b").over(wp).alias("n_b"),
    )
    p = F.col("a").cast("double") / F.col("n_a").cast("double")
    q = F.col("b").cast("double") / F.col("n_b").cast("double")
    term = (
        F.when(
            (F.col("a") > 0) & (F.col("b") > 0),
            F.lit(0.5)
            * (
                p * F.log(F.lit(2.0) * p / (p + q))
                + q * F.log(F.lit(2.0) * q / (p + q))
            ),
        )
        .when(F.col("a") > 0, F.lit(0.5) * p * F.log(F.lit(2.0)))
        .otherwise(F.lit(0.5) * q * F.log(F.lit(2.0)))
    )
    quant = tot.select(
        "src_a", "src_b",
        F.round(term * 1e12).cast("long").alias("term_e12"),
    )
    return (
        quant.groupBy("src_a", "src_b")
        .agg(F.sum("term_e12").alias("js_e12_sum"))
        .select(
            "src_a", "src_b",
            F.round(F.col("js_e12_sum") / 1e3).cast("long").alias("js_e9"),
        )
    )


CALIB_BINS = 10


def _stopword_score(docs: DataFrame) -> DataFrame:
    """(doc_id, score, is_pos): stopword-ratio as a calibration score for
    the binary outcome lang='en'.  The score is ONE exact int/int double
    division (len(filter)/len) — bit-identical in DuckDB — and the
    outcome is a string equality, so the (score, label) pair needs no
    tolerance anywhere downstream."""
    from .text_analysis import STOPWORDS

    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    # Zero-token documents (empty/NULL text — normal in web corpora)
    # have no defined score: filtered BEFORE the division, which would
    # otherwise throw under ANSI mode and kill the whole job. Mirrored
    # in _SCORE_REL's WHERE.
    return docs.filter(F.expr(f"size({TOKENS_EXPR}) > 0")).select(
        "doc_id",
        (
            F.expr(f"size(filter({TOKENS_EXPR}, x -> x IN ({en})))")
            / F.expr(f"size({TOKENS_EXPR})")
        ).alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("is_pos"),
    )


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration bins) for a classifier score —
    the standard model-monitoring readout: bucket the predicted score
    into 10 equal-width bins and compare the mean score against the
    observed positive rate per bin.  Score = per-doc English stopword
    ratio, outcome = lang='en' (the same deterministic score/label pair
    a production run would read from a scored corpus).

    Exactness: the score is one int/int division; per-doc scores are
    quantized to e9 BIGINTs BEFORE the bin aggregate so no
    order-dependent float sum crosses the exchange; mean score and
    observed rate are ONE closing division each.  Bin assignment is
    least(floor(score*10), 9) — floor of a correctly-rounded double is
    engine-stable (see ks_two_sample's quantization contract).

    At 100 TB: one corpus scan computes (score, label) map-side, the
    bin histogram partial-aggregates to <= 10 rows — the whole readout
    is a single map-side-combined pass, the cheapest shape there is.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = _stopword_score(docs)
    binned = s.select(
        F.least(F.floor(F.col("score") * CALIB_BINS), F.lit(CALIB_BINS - 1))
        .cast("long")
        .alias("bin"),
        F.round(F.col("score") * 1e9).cast("long").alias("score_e9"),
        "is_pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_pos").cast("long").alias("n_pos"),
            F.sum("score_e9").alias("sum_score_e9"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "sum_score_e9",
            (F.col("sum_score_e9") / 1e9 / F.col("n").cast("double")).alias(
                "avg_score"
            ),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "obs_rate"
            ),
        )
    )


def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table — "if I act on the top d deciles by
    score, what fraction of positives do I capture, and how much better
    than random is that?" — the campaign-targeting and threshold-tuning
    companion to roc_auc_features.

    Deciles come from ntile(10) over the fully deterministic total order
    (score DESC, doc_id): both engines implement the standard ntile
    split (first n mod k tiles one row larger), so tie-free ordering
    makes tile assignment identical.  capture_rate and lift are single
    closing divisions of EXACT integer cross-products
    (cum_pos*total_n)/(cum_n*total_pos) — the mann_whitney device — so
    no float accumulates anywhere.

    At 100 TB the global ntile is the one genuinely rank-global step —
    production would swap it for approx quantile boundaries on the score
    (the histogram_equidepth device) and keep everything else; per-tile
    aggregates partial-combine to 10 rows either way.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    s = _stopword_score(docs)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    tiled = s.select(
        "is_pos", F.ntile(10).over(w).cast("long").alias("decile")
    )
    per = tiled.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("is_pos").cast("long").alias("n_pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wc).cast("long").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        (
            (F.sum("n_pos").over(wc) * F.sum("n").over(tot)).cast("double")
            / (F.sum("n").over(wc) * F.sum("n_pos").over(tot)).cast("double")
        ).alias("lift"),
        (
            F.sum("n_pos").over(wc).cast("double")
            / F.sum("n_pos").over(tot).cast("double")
        ).alias("capture_rate"),
    )


QN_TILES = 100


def q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of each source's document-length
    distribution onto the global corpus distribution — the batch-effect
    remover (microarray lineage, reused in corpus curation to make
    per-source length/quality features comparable before mixing):
    a doc at the p-th percentile OF ITS SOURCE is assigned the value at
    the p-th percentile of the WHOLE corpus.

    Both percentile maps are ntile({QN_TILES}) over the fully
    deterministic (n_chars, doc_id) order (the lift_deciles ntile-
    parity argument); the normalized value for a (source, tile) cell is
    the global tile's mean length — an int64 sum over one closing
    division. Output is the |sources| x {QN_TILES} mapping table a
    pipeline would broadcast-join back onto the corpus.

    At 100 TB: the per-source ntile partitions by source (parallel);
    the global ntile is the one rank-global step and would swap for
    approx_percentile boundaries (the histogram_equidepth device) with
    everything downstream unchanged; the join is {QN_TILES} rows
    broadcast.
    """
    from pyspark.sql import Window

    # source/n_chars required (r11 NULL sweep; twin mirrors the WHERE):
    # NULL n_chars sorts first in Spark's ntile order and last in
    # DuckDB's, shifting every tile boundary.
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wg = Window.orderBy("n_chars", "doc_id")
    tiled = docs.select(
        "source",
        "n_chars",
        F.ntile(QN_TILES).over(ws).cast("long").alias("tile"),
        F.ntile(QN_TILES).over(wg).cast("long").alias("gtile"),
    )
    global_ref = (
        tiled.groupBy(F.col("gtile").alias("tile"))
        .agg(
            F.sum("n_chars").cast("long").alias("g_sum"),
            F.count("*").alias("g_n"),
        )
        .select(
            "tile",
            (F.col("g_sum").cast("double") / F.col("g_n").cast("double")).alias(
                "norm_value"
            ),
        )
    )
    per_cell = tiled.groupBy("source", "tile").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").cast("long").alias("sum_raw"),
    )
    return per_cell.join(F.broadcast(global_ref), "tile").select(
        "source",
        "tile",
        "n",
        "sum_raw",
        (F.col("sum_raw").cast("double") / F.col("n").cast("double")).alias(
            "avg_raw"
        ),
        "norm_value",
    )


QUERIES = {
    "quantile_normalization": q_quantile_normalization,
    "calibration_bins": q_calibration_bins,
    "lift_deciles": q_lift_deciles,
    "ks_two_sample": q_ks_two_sample,
    "spearman_corr": q_spearman_corr,
    "cramers_v": q_cramers_v,
    "hhi_concentration": q_hhi_concentration,
    "degree_gini": q_degree_gini,
    "harmonic_centrality": q_harmonic_centrality,
    "temperature_mix_weights": q_temperature_mix_weights,
    "js_divergence_sources": q_js_divergence_sources,
}

_HIST = f"""
hist AS (
  SELECT event_type, {CENTS} AS cents, COUNT(*) AS n
  FROM events
  WHERE event_type IS NOT NULL AND isfinite(value)
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM hist) a
  JOIN (SELECT DISTINCT event_type FROM hist) b
    ON a.event_type < b.event_type
),
merged AS (
  SELECT type_a, type_b, cents, SUM(na_v) AS na_v, SUM(nb_v) AS nb_v
  FROM (
    SELECT p.type_a, p.type_b, h.cents, h.n AS na_v, 0 AS nb_v
    FROM pairs p JOIN hist h ON h.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, h.cents, 0, h.n
    FROM pairs p JOIN hist h ON h.event_type = p.type_b
  ) GROUP BY 1, 2, 3
)
"""

from .text_analysis import STOPWORDS as _SW

_EN_SQL = ", ".join(f"'{w}'" for w in _SW["en"])

_SCORE_REL = f"""
scored AS (
  SELECT doc_id,
         len(list_filter({DUCK_TOKENS}, x -> x IN ({_EN_SQL})))
           / len({DUCK_TOKENS}) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
  FROM documents
  WHERE len({DUCK_TOKENS}) > 0
)
"""

ORACLE = {
    "quantile_normalization": f"""
WITH tiled AS (
  SELECT source, n_chars,
         CAST(ntile({QN_TILES}) OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS BIGINT)
           AS tile,
         CAST(ntile({QN_TILES}) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS gtile
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
),
global_ref AS (
  SELECT gtile AS tile,
         CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS norm_value
  FROM tiled GROUP BY gtile
),
per_cell AS (
  SELECT source, tile, COUNT(*) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sum_raw
  FROM tiled GROUP BY 1, 2
)
SELECT source, tile, n, sum_raw,
       CAST(sum_raw AS DOUBLE) / CAST(n AS DOUBLE) AS avg_raw,
       norm_value
FROM per_cell JOIN global_ref USING (tile)
""",
    "calibration_bins": f"""
WITH {_SCORE_REL},
binned AS (
  SELECT least(CAST(floor(score * {CALIB_BINS}) AS BIGINT), {CALIB_BINS - 1}) AS bin,
         CAST(round(score * 1e9) AS BIGINT) AS score_e9,
         is_pos
  FROM scored
)
SELECT bin,
       COUNT(*) AS n,
       CAST(SUM(is_pos) AS BIGINT) AS n_pos,
       CAST(SUM(score_e9) AS BIGINT) AS sum_score_e9,
       SUM(score_e9) / 1e9 / CAST(COUNT(*) AS DOUBLE) AS avg_score,
       CAST(SUM(is_pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS obs_rate
FROM binned GROUP BY bin
""",
    "lift_deciles": f"""
WITH {_SCORE_REL},
tiled AS (
  SELECT is_pos, ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
  FROM scored
),
per AS (
  SELECT decile, COUNT(*) AS n, CAST(SUM(is_pos) AS BIGINT) AS n_pos
  FROM tiled GROUP BY decile
)
SELECT decile, n, n_pos,
       CAST(SUM(n) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       CAST(SUM(n_pos) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * SUM(n) OVER () AS DOUBLE)
         / CAST(SUM(n) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * SUM(n_pos) OVER () AS DOUBLE) AS lift,
       CAST(SUM(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(SUM(n_pos) OVER () AS DOUBLE) AS capture_rate
FROM per
""",
    "ks_two_sample": f"""
WITH {_HIST},
cum AS (
  SELECT type_a, type_b,
         SUM(na_v) OVER (PARTITION BY type_a, type_b ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(nb_v) OVER (PARTITION BY type_a, type_b ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(na_v) OVER (PARTITION BY type_a, type_b) AS n_a,
         SUM(nb_v) OVER (PARTITION BY type_a, type_b) AS n_b
  FROM merged
),
agg AS (
  SELECT type_a, type_b,
         CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
         CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
  FROM cum GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_a, n_b, d_num,
       CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks_d,
       sqrt(CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
         * (CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)) AS ks_stat
FROM agg
""",
    "spearman_corr": """
WITH li AS (
  -- TRUNC mirrors Spark's truncating double->int cast (r12);
  -- isfinite is the finite-measure contract (r12 non-finite probe)
  SELECT CAST(TRUNC(l_quantity) AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
  WHERE isfinite(l_quantity) AND isfinite(l_extendedprice)
),
hx AS (
  SELECT x, 2 * (SUM(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - t)
            + t + 1 AS dr_x
  FROM (SELECT x, COUNT(*) AS t FROM li GROUP BY x)
),
hy AS (
  SELECT y, 2 * (SUM(t) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - t)
            + t + 1 AS dr_y
  FROM (SELECT y, COUNT(*) AS t FROM li GROUP BY y)
),
ranked AS (
  SELECT dr_x, dr_y FROM li JOIN hx USING (x) JOIN hy USING (y)
),
agg AS (
  SELECT COUNT(*) AS n,
         SUM(dr_x::HUGEINT) AS sx, SUM(dr_y::HUGEINT) AS sy,
         SUM(dr_x::HUGEINT * dr_x::HUGEINT) AS sxx,
         SUM(dr_y::HUGEINT * dr_y::HUGEINT) AS syy,
         SUM(dr_x::HUGEINT * dr_y::HUGEINT) AS sxy
  FROM ranked
)
SELECT n,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS spearman_rho
FROM agg
""",
    "cramers_v": """
WITH cells AS (
  SELECT event_type, CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, dow, o,
         SUM(o) OVER (PARTITION BY event_type) AS r,
         SUM(o) OVER (PARTITION BY dow) AS c,
         SUM(o) OVER () AS n
  FROM cells
),
quant AS (
  SELECT n, event_type, dow,
         CAST(round(
           (CAST(o AS DOUBLE)
              - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * 1e9) AS BIGINT) AS cell_e9
  FROM m
),
agg AS (
  SELECT CAST(n AS BIGINT) AS n,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_cols,
         CAST(SUM(cell_e9) AS BIGINT) AS chi2_e9
  FROM quant GROUP BY n
)
SELECT n, n_rows, n_cols, chi2_e9,
       sqrt(CAST(chi2_e9 AS DOUBLE) / 1e9
            / CAST(n * LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)) AS cramers_v
FROM agg
""",
    "hhi_concentration": """
WITH rev AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey,
         SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
agg AS (
  SELECT nation, COUNT(*) AS n_suppliers,
         SUM(rev) AS total_cents,
         SUM(rev::HUGEINT * rev::HUGEINT) AS sum_sq
  FROM rev GROUP BY nation
)
SELECT nation, n_suppliers,
       CAST(total_cents AS BIGINT) AS total_cents,
       CAST(round(CAST(sum_sq AS DOUBLE)
                  / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
                  * 1e4 * 1e6) AS BIGINT) AS hhi_e6,
       1e4 / (CAST(sum_sq AS DOUBLE)
              / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
              * 1e4) AS effective_n
FROM agg
""",
    "degree_gini": f"""
WITH e AS (SELECT DISTINCT src, dst
           FROM (SELECT l_suppkey AS src, l_partkey AS dst FROM lineitem)),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
hist AS (SELECT d, COUNT(*) AS cnt FROM deg GROUP BY d),
blocks AS (
  SELECT d, cnt,
         SUM(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) - cnt AS c_below
  FROM hist
),
agg AS (
  SELECT SUM(cnt) AS n_nodes, SUM(d * cnt) AS sum_deg,
         SUM(d * (cnt * c_below + cnt * (cnt + 1) // 2)) AS rank_weighted
  FROM blocks
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(sum_deg AS BIGINT) AS sum_deg,
       CAST(2 * rank_weighted - (n_nodes + 1) * sum_deg AS DOUBLE)
         / CAST(n_nodes * sum_deg AS DOUBLE) AS gini
FROM agg
""",
    "harmonic_centrality": f"""
WITH RECURSIVE edges AS (
  SELECT src, dst, min(weight) AS weight FROM ({EDGES_SQL}) GROUP BY src, dst
),
lms AS (SELECT DISTINCT src AS landmark FROM edges
        ORDER BY src LIMIT {LANDMARKS_K}),
walk(r, landmark, node, dist) AS (
    SELECT 0, landmark, landmark, CAST(0.0 AS DOUBLE) FROM lms
    UNION
    SELECT w.r + 1, w.landmark, e.dst, min(w.dist + e.weight)
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.r < 64
    GROUP BY w.r + 1, w.landmark, e.dst
),
best AS (
  SELECT landmark, node, min(dist) AS dist
  FROM walk GROUP BY landmark, node
)
SELECT node, COUNT(*) AS n_reach,
       CAST(SUM(CAST(round({HARMONIC_SCALE}.0 / dist) AS BIGINT)) AS BIGINT)
         AS harmonic_e12
FROM best WHERE node <> landmark GROUP BY node
""",
    "temperature_mix_weights": """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
quant AS (
  SELECT source, n_docs,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT) AS w_e6,
         SUM(CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT))
           OVER () AS tot_w,
         SUM(n_docs) OVER () AS tot_n
  FROM counts
)
SELECT source, n_docs, w_e6,
       CAST(w_e6 AS DOUBLE) / CAST(tot_w AS DOUBLE) AS share,
       (CAST(w_e6 AS DOUBLE) / CAST(tot_w AS DOUBLE))
         * (CAST(tot_n AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS boost
FROM quant
""",
    "js_divergence_sources": f"""
WITH tok AS (
  SELECT source, token, COUNT(*) AS n
  FROM (SELECT source, unnest({DUCK_TOKENS}) AS token FROM documents)
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM tok) a
  JOIN (SELECT DISTINCT source FROM tok) b ON a.source < b.source
),
merged AS (
  SELECT src_a, src_b, token, SUM(a) AS a, SUM(b) AS b
  FROM (
    SELECT p.src_a, p.src_b, t.token, t.n AS a, 0 AS b
    FROM pairs p JOIN tok t ON t.source = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, t.token, 0, t.n
    FROM pairs p JOIN tok t ON t.source = p.src_b
  ) GROUP BY 1, 2, 3
),
tot AS (
  SELECT src_a, src_b, a, b,
         SUM(a) OVER (PARTITION BY src_a, src_b) AS n_a,
         SUM(b) OVER (PARTITION BY src_a, src_b) AS n_b
  FROM merged
),
quant AS (
  SELECT src_a, src_b,
         CAST(round(
           CASE
             WHEN a > 0 AND b > 0 THEN
               0.5 * ((CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        * ln(2.0 * (CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE))
                             / ((CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE))
                                + (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE))))
                      + (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        * ln(2.0 * (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE))
                             / ((CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE))
                                + (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE)))))
             WHEN a > 0 THEN
               0.5 * (CAST(a AS DOUBLE) / CAST(n_a AS DOUBLE)) * ln(2.0)
             ELSE
               0.5 * (CAST(b AS DOUBLE) / CAST(n_b AS DOUBLE)) * ln(2.0)
           END * 1e12) AS BIGINT) AS term_e12
  FROM tot
)
SELECT src_a, src_b,
       CAST(round(SUM(term_e12) / 1e3) AS BIGINT) AS js_e9
FROM quant GROUP BY src_a, src_b
""",
}
