"""Statistical-model operators — the round-8 third batch.

Extends the model-audit family (spearman_corr, roc_auc_features,
mann_whitney_u, regression_trend) with the next tier of textbook
statistics a feature platform runs over warehouse aggregates:

* ``cross_correlation_lag`` — lead-lag Pearson cross-correlation
  between two daily event-count series (does `click` today predict
  `purchase` k days later?), the signal-discovery primitive behind
  marketing-mix and demand-forecast pipelines.
* ``kendall_tau_daily``    — Kendall's tau-b rank concordance between
  the daily order count and daily revenue series (the robust "do these
  two KPIs move together?" check; immune to any monotone transform).
* ``ols_multifeature``     — closed-form multiple linear regression
  (2 features + intercept) via the 3x3 normal equations, per group —
  the sufficient-statistics regression every SQL warehouse can run
  without an ML runtime.
* ``weighted_median``      — exact weighted median per group via
  cumulative-weight histogram selection (the robust location estimate
  where rows carry unequal mass, e.g. price weighted by quantity).
* ``pr_auc_features``      — average precision (PR-AUC) of each
  leading embedding coordinate as a one-vs-rest scorer per class
  label: the rank metric that, unlike ROC AUC, stays honest under
  class imbalance — the screen a retrieval/classifier audit actually
  wants on skewed labels.

Exactness contract (the spearman/mann_whitney/psi devices, reused
verbatim): every aggregate that can be an integer IS an integer
(counts, cents, basis points, doubled ranks, concordance pair counts);
sums of integer products ride exact DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB); each statistic closes with ONE float expression whose
operand sequence is written identically in both engines. Where a sum
of per-group float terms is unavoidable (average precision's
per-threshold precision terms), each term is ONE correctly-rounded
double quantized to a BIGINT before aggregation, so no
order-dependent float accumulation ever crosses an exchange.

At 100 TB every operator here reduces the corpus to a histogram or a
calendar-bounded daily aggregate in ONE map-side-combined pass:

* the cross-correlation / Kendall pair joins operate on DAY rows —
  their size is set by the calendar (3 650 rows for a 10-year
  retention window -> ~6.7M pairs worst case for Kendall), NOT by the
  data volume, so the quadratic term cannot grow with corpus size;
* OLS needs exactly nine sufficient statistics per group — one
  partial-aggregated scan, no matrix library, no iteration;
* the weighted median and PR-AUC run on (group, value) histograms
  keyed by the group — the corpus shuffles once.

Reference anchor: extends the aggregate-over-scan family the
reference's reducers implement (SingleSourceSP.java min-reduction;
ReverseGraph.java grouped emission) to second-order statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..contracts import finite
from ..io.sources import load_parallel, load_table
from .similarity import AUC_N_FEATURES

CENTS_EP = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
BP_DISC = "CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)"

XCORR_X = "click"
XCORR_Y = "purchase"
XCORR_MAX_LAG = 7  # inclusive: lags 0..7 days


def _pearson_from_sums(n, sx, sy, sxx, syy, sxy):
    """The shared closing expression: Pearson r from the six exact
    sums, all operands pre-cast to double, written with the same
    operand sequence as every oracle twin in this module.

    NULL when either series has zero-or-negative variance NUMERATOR (a
    constant series has no defined correlation — the SCALE.md
    degenerate-denominator convention). The guard is on the RADICANDS,
    not the sqrt product: a near-constant huge-magnitude series can
    round n*sxx - sx^2 to a tiny NEGATIVE double, where Spark's sqrt
    yields NaN (and NaN > 0 is TRUE in Spark's ordering) while
    DuckDB's sqrt RAISES — guarding the radicands keeps both engines
    on the same branch (r10 review finding). The twin mirrors this
    CASE textually."""
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return F.when(
        (vx > 0) & (vy > 0), (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    )


def q_cross_correlation_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: Pearson r between the daily count of
    '{XCORR_X}' events on day d and the daily count of '{XCORR_Y}'
    events on day d+lag, for lag = 0..{XCORR_MAX_LAG} — the
    which-signal-leads scan behind conversion-lag and demand-forecast
    analyses (the lag with max |r| is the candidate causal delay).

    Missing days count as ZERO events (the day spine is the distinct
    set of event days, left-joined per series) — a day with no clicks
    is a real observation of 0, not a hole; this is what makes the
    pairing deterministic and identical in both engines.

    Exactness: daily counts are exact ints; the six Pearson sums ride
    DECIMAL(38,0)/HUGEINT; r is ONE closing float expression per lag
    (the spearman_corr device).

    At 100 TB: one map-side-combined pass builds the (day, type) count
    histogram — its row count is calendar x |types|, independent of
    event volume. The lag fan-out (x {XCORR_MAX_LAG + 1}) and the
    self-join on shifted days run on that calendar-sized aggregate;
    the big table shuffles once, keyed by day.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    days = ev.select("day").distinct()

    def daily(evt: str, col: str) -> DataFrame:
        c = (
            ev.filter(F.col("event_type") == evt)
            .groupBy("day")
            .agg(F.count("*").alias("_n"))
        )
        return days.join(c, "day", "left").select(
            "day", F.coalesce("_n", F.lit(0)).cast("long").alias(col)
        )

    xs = daily(XCORR_X, "x")
    ys = daily(XCORR_Y, "y")
    lags = spark.range(0, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    paired = (
        xs.crossJoin(F.broadcast(lags))
        .withColumn("yday", F.date_add(F.col("day"), F.col("lag")))
        .join(ys.withColumnRenamed("day", "yday"), "yday")
    )
    dec = "decimal(19,0)"
    agg = paired.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    n = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return agg.select(
        "lag",
        "n_days",
        _pearson_from_sums(n, sx, sy, sxx, syy, sxy).alias("xcorr"),
    )


def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between the daily order count and the daily
    revenue (sum of o_totalprice) over the order calendar — the
    tie-corrected rank-concordance test: of all day pairs, how many
    agree in direction on both KPIs? Spearman's sibling with a
    cleaner probabilistic reading (P(concordant) - P(discordant)).

    The pair enumeration is EXPLICIT and integer-exact: the daily
    aggregate self-joins on day_a < day_b; concordant / discordant /
    tied-in-x / tied-in-y pair counts are conditional COUNTs; tau_b =
    (C - D) / (sqrt(n0 - n1) * sqrt(n0 - n2)) is ONE closing float
    expression (n0 = total pairs, n1/n2 = tied pairs per side,
    counted over the SAME join so the algebra is self-consistent).

    At 100 TB: the self-join is calendar-bounded — TPC-H's order
    calendar is ~2.4k days -> ~2.9M pairs regardless of scale factor;
    ten years of daily partitions is 3 650 rows -> 6.7M pairs. The
    corpus itself contributes one map-side-combined groupBy(day). The
    daily frame broadcasts, so the pair join never shuffles.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    o = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    ).select(
        F.col("o_orderdate").alias("day"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    d = o.groupBy("day").agg(
        F.count("*").alias("x"), F.sum("cents").alias("y")
    )
    a, b = d.alias("a"), F.broadcast(d).alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (F.col("a.x") - F.col("b.x")).alias("dx"),
        (F.col("a.y") - F.col("b.y")).alias("dy"),
    )
    agg = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(
            F.when(
                ((F.col("dx") > 0) & (F.col("dy") > 0))
                | ((F.col("dx") < 0) & (F.col("dy") < 0)),
                1,
            ).otherwise(0)
        ).alias("n_conc"),
        F.sum(
            F.when(
                ((F.col("dx") > 0) & (F.col("dy") < 0))
                | ((F.col("dx") < 0) & (F.col("dy") > 0)),
                1,
            ).otherwise(0)
        ).alias("n_disc"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).alias("n_tie_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).alias("n_tie_y"),
    )
    n0 = F.col("n0").cast("double")
    return agg.select(
        "n0",
        F.col("n_conc").cast("long").alias("n_conc"),
        F.col("n_disc").cast("long").alias("n_disc"),
        F.col("n_tie_x").cast("long").alias("n_tie_x"),
        F.col("n_tie_y").cast("long").alias("n_tie_y"),
        # NULL when every pair ties on a side (n0 == n_tie): tau-b's
        # denominator is 0 there — DuckDB's x/0 is NULL, Spark's ANSI
        # division would crash. Radicands are exact ints, never
        # rounding-negative, so guarding at 0 is complete.
        F.when(
            (n0 - F.col("n_tie_x").cast("double") > 0)
            & (n0 - F.col("n_tie_y").cast("double") > 0),
            (
                F.col("n_conc").cast("double")
                - F.col("n_disc").cast("double")
            )
            / (
                F.sqrt(n0 - F.col("n_tie_x").cast("double"))
                * F.sqrt(n0 - F.col("n_tie_y").cast("double"))
            ),
        ).alias("tau_b"),
    )


def q_ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression per l_returnflag:
    price_cents ~ b0 + b1*quantity + b2*discount_bp, solved from the
    3x3 normal equations by Cramer's rule on nine sufficient
    statistics — multi-feature OLS as a pure aggregate, the way a
    warehouse fits a model without an ML runtime (and the exact
    solution, not a gradient approximation).

    Inputs are integer-exact (cents, whole quantities, basis points);
    the nine sums (n, Sx1, Sx2, Sy, Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y)
    ride DECIMAL(38,0)/HUGEINT. The determinant and the three
    coefficients are closing float expressions — each written with the
    identical operand sequence in both engines, so the IEEE double
    results match bitwise (the spearman device, three times over).

    At 100 TB: ONE partial-aggregated scan per group — nine columns of
    map-side-combined sums keyed by the group; no iteration, no
    driver-side linear algebra, no collect. Adding features grows the
    aggregate quadratically (k^2 sums) but never adds a pass.
    """
    # Required-column rail (r11 NULL sweep) extended to the finite-
    # measure contract (r12 non-finite probe: the bigint/decimal
    # feature carriers crash on NaN/Inf). Twin mirrors the WHERE.
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & finite("l_quantity")
        & finite("l_discount")
        & finite("l_extendedprice")
    ).select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.expr(BP_DISC).alias("x2"),
        F.expr(CENTS_EP).alias("y"),
    )
    dec = "decimal(19,0)"

    def s(expr, name):
        return F.sum(expr).alias(name)

    x1, x2, y = (F.col(c).cast(dec) for c in ("x1", "x2", "y"))
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        s(x1, "sx1"),
        s(x2, "sx2"),
        s(y, "sy"),
        s(x1 * x1, "sx1x1"),
        s(x1 * x2, "sx1x2"),
        s(x2 * x2, "sx2x2"),
        s(x1 * y, "sx1y"),
        s(x2 * y, "sx2y"),
    )
    n = F.col("n").cast("double")
    a1, a2 = F.col("sx1").cast("double"), F.col("sx2").cast("double")
    ay = F.col("sy").cast("double")
    a11, a12 = F.col("sx1x1").cast("double"), F.col("sx1x2").cast("double")
    a22 = F.col("sx2x2").cast("double")
    a1y, a2y = F.col("sx1y").cast("double"), F.col("sx2y").cast("double")
    # | n   a1   a2  |       | ay  |
    # | a1  a11  a12 | * b = | a1y |   (X'X b = X'y, expanded 3x3)
    # | a2  a12  a22 |       | a2y |
    det = (
        n * (a11 * a22 - a12 * a12)
        - a1 * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a12 - a11 * a2)
    )
    det0 = (
        ay * (a11 * a22 - a12 * a12)
        - a1 * (a1y * a22 - a12 * a2y)
        + a2 * (a1y * a12 - a11 * a2y)
    )
    det1 = (
        n * (a1y * a22 - a12 * a2y)
        - ay * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a2y - a1y * a2)
    )
    det2 = (
        n * (a11 * a2y - a1y * a12)
        - a1 * (a1 * a2y - a1y * a2)
        + ay * (a1 * a12 - a11 * a2)
    )
    return agg.select(
        "l_returnflag",
        "n",
        (det0 / det).alias("b0_cents"),
        (det1 / det).alias("b1_cents_per_qty"),
        (det2 / det).alias("b2_cents_per_bp"),
    )


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of the unit price (extendedprice cents)
    per l_returnflag, weighted by l_quantity — "the price of the
    median UNIT shipped", the location estimate that answers a
    different question than the row median whenever rows carry
    unequal mass. Lower-median convention: the smallest value v with
    2 * cumweight(v) >= total weight (integer comparison — no
    interpolation, no floats anywhere).

    At 100 TB: the corpus collapses to a (group, cents) -> sum(weight)
    histogram in one map-side-combined pass; the cumulative-weight
    window runs per group over histogram rows (distinct prices, not
    data rows). One shuffle, keyed by the group.
    """
    # Finite-measure contract (r12 non-finite probe; twin mirrors).
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite("l_quantity") & finite("l_extendedprice")
    ).select(
        "l_returnflag",
        F.expr(CENTS_EP).alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    h = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("tw"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "cents",
        F.sum("tw").over(wcum).alias("cw"),
        F.sum("tw").over(wall).alias("tot"),
    ).filter(F.lit(2) * F.col("cw") >= F.col("tot"))
    rw = Window.partitionBy("l_returnflag").orderBy("cents")
    return (
        c.withColumn("rn", F.row_number().over(rw))
        .filter("rn = 1")
        .select(
            "l_returnflag",
            F.col("cents").alias("wmedian_cents"),
            F.col("tot").alias("total_weight"),
        )
    )


PRAUC_SCALE = 1_000_000_000_000  # 1e12 quantum per precision term


def q_pr_auc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of each of the first
    {AUC_N_FEATURES} embedding coordinates as a one-vs-rest scorer
    per class label — roc_auc_features' imbalance-honest sibling: on
    a skewed label, ROC AUC stays flattering while AP collapses, so a
    feature screen needs both.

    Tie handling is the deterministic "group" convention: scores
    descending, ties processed as ONE block; each block contributes
    delta_TP * precision-at-block-end, and AP = sum(blocks) / P.
    Because a sum of float precision terms would be
    accumulation-order-dependent, each block's term is ONE
    correctly-rounded double quantized to a BIGINT
    (round(dTP * TP / (TP + FP) * 1e{12})) and the sum is exact int64
    — the psi device. AP itself is the single closing division.

    At 100 TB: identical shape to roc_auc_features — one corpus pass
    to a (feature, score, label) histogram, a one-vs-rest fan-out on
    that histogram, a per-(label, feature) cumulative window over
    descending scores, then the quantized-term aggregation. The
    corpus shuffles once, keyed by (feature, score).
    """
    # In-domain vectors only (similarity.vec_domain — the r11 rail:
    # a 1e19 component overflows the round(x*1e6) BIGINT score) and
    # label IS NOT NULL (a NULL one-vs-rest target matches no row —
    # the roc_auc_features div-zero class).
    from .similarity import vec_domain

    emb = vec_domain(load_parallel(spark, sf_dir, "embeddings")).filter(
        F.col("label").isNotNull()
    )
    feats = emb.select(
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("feature_idx"),
                        F.round(
                            F.col("embedding")[j].cast("double") * 1e6
                        )
                        .cast("long")
                        .alias("score"),
                    )
                    for j in range(AUC_N_FEATURES)
                ]
            )
        ).alias("f"),
    ).select("label", "f.feature_idx", "f.score")
    lab_h = feats.groupBy("feature_idx", "score", "label").agg(
        F.count("*").alias("n")
    )
    tot_h = lab_h.groupBy("feature_idx", "score").agg(
        F.sum("n").alias("t_v")
    )
    labels = (
        lab_h.select("label").distinct().withColumnRenamed("label", "target")
    )
    grid = (
        tot_h.crossJoin(F.broadcast(labels))
        .join(
            lab_h,
            (lab_h["feature_idx"] == tot_h["feature_idx"])
            & (lab_h["score"] == tot_h["score"])
            & (lab_h["label"] == F.col("target")),
            "left",
        )
        .select(
            F.col("target"),
            tot_h["feature_idx"],
            tot_h["score"],
            "t_v",
            F.coalesce("n", F.lit(0)).alias("np_v"),
        )
    )
    w = (
        Window.partitionBy("target", "feature_idx")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("target", "feature_idx")
    cum = grid.select(
        "target",
        "feature_idx",
        "np_v",
        F.sum("np_v").over(w).alias("tp"),
        (F.sum("t_v").over(w) - F.sum("np_v").over(w)).alias("fp"),
        F.sum("np_v").over(wall).alias("n_pos"),
        (F.sum("t_v").over(wall) - F.sum("np_v").over(wall)).alias("n_neg"),
    ).filter(F.col("np_v") > 0)
    term = F.round(
        F.col("np_v").cast("double")
        * F.col("tp").cast("double")
        / (F.col("tp") + F.col("fp")).cast("double")
        * F.lit(float(PRAUC_SCALE))
    ).cast("long")
    agg = cum.groupBy("target", "feature_idx").agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.sum(term).alias("ap_e12"),
    )
    return agg.select(
        F.col("target").alias("label"),
        "feature_idx",
        "n_pos",
        "n_neg",
        (
            F.col("ap_e12").cast("double")
            / (F.col("n_pos").cast("double") * F.lit(float(PRAUC_SCALE)))
        ).alias("avg_precision"),
    )


ATE_STRATA = 5
CENTS_VAL = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimate — the workhorse
    observational-causal design: treatment = user ever hit an 'error'
    event, outcome = the user's total purchase value, confounder =
    activity level (total event count), controlled by exact
    stratification into {ATE_STRATA} activity bands. Within each
    stratum the treated-vs-control mean difference is (closer to) an
    apples-to-apples comparison; the per-stratum table IS the
    covariate-balance readout an analyst inspects before trusting any
    pooled number.

    Strata are VALUE-HOMOGENEOUS and integer-exact: the (activity ->
    n_users) histogram's inclusive cumulative count assigns stratum =
    ceil({ATE_STRATA} * cw / N) — computed as (5*cw + N - 1) DIV N on
    exact int64, so users with equal activity always share a stratum
    and both engines agree bit-for-bit. NO global ntile: the quantile
    assignment runs on the bounded histogram, never a single-partition
    row window. Means are each ONE int/int division; the difference is
    one subtract — IEEE-exact in both engines (the ab_test device).
    Cells missing a side emit NULL, never a fabricated 0.

    At 100 TB: one map-side-combined pass to per-user rows, one
    histogram pass (bounded by distinct activity counts), a broadcast
    join of stratum boundaries, one {ATE_STRATA}-row aggregate.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    ev = load_table(spark, sf_dir, "events").filter(
        finite("value")
    ).select(
        "user_id",
        "event_type",
        F.expr(CENTS_VAL).alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("activity"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("treated"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
        ).alias("outcome_cents"),
    )
    hist = per_user.groupBy("activity").agg(F.count("*").alias("n"))
    wcum = Window.orderBy("activity").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bands = hist.select(
        "activity",
        F.sum("n").over(wcum).alias("cw"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    ).select(
        "activity",
        # integer DIV, not float division: ceil on exact int64
        F.expr(
            f"CAST(({ATE_STRATA} * cw + n_total - 1) DIV n_total AS INT)"
        ).alias("stratum"),
    )
    cells = (
        per_user.join(F.broadcast(bands), "activity")
        .groupBy("stratum")
        .agg(
            F.sum(F.col("treated")).alias("n_treated"),
            F.sum(F.lit(1) - F.col("treated")).alias("n_control"),
            F.sum(
                F.when(F.col("treated") == 1, F.col("outcome_cents"))
                .otherwise(0)
            ).alias("sum_t"),
            F.sum(
                F.when(F.col("treated") == 0, F.col("outcome_cents"))
                .otherwise(0)
            ).alias("sum_c"),
        )
    )
    mean_t = F.col("sum_t").cast("double") / F.col("n_treated").cast(
        "double"
    )
    mean_c = F.col("sum_c").cast("double") / F.col("n_control").cast(
        "double"
    )
    both = (F.col("n_treated") > 0) & (F.col("n_control") > 0)
    return cells.select(
        "stratum",
        F.col("n_treated").cast("long").alias("n_treated"),
        F.col("n_control").cast("long").alias("n_control"),
        F.when(F.col("n_treated") > 0, mean_t).alias("mean_treated_cents"),
        F.when(F.col("n_control") > 0, mean_c).alias("mean_control_cents"),
        F.when(both, mean_t - mean_c).alias("ate_cents"),
    )


def q_t_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test for every unordered pair of
    event types on the value column — the parametric sibling of
    mann_whitney_u (location difference in means, robust to unequal
    group variances; the default two-sample test since Welch beats
    Student under heteroscedasticity at no cost).

    Per-type n / sum(cents) / sum(cents^2) are exact int64/DECIMAL
    aggregates from ONE corpus pass; mean, variance, t, and the
    Welch–Satterthwaite df are closing float chains written with the
    identical operand sequence in both engines (every op IEEE
    correctly-rounded — the ab_test device, no quantization needed).

    At 100 TB: one map-side-combined groupBy(type) to |types| rows;
    the pair fan-out (|types| choose 2) is driver-trivial.
    """
    # Finite-measure contract (r12 non-finite probe: the cents carrier
    # crashes on NaN/Inf in both engines). Twin mirrors the WHERE.
    ev = load_table(spark, sf_dir, "events").filter(finite("value")).select(
        "event_type", F.expr(CENTS_VAL).alias("cents")
    )
    dec = "decimal(19,0)"
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias(
            "sxx"
        ),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("type_a") < F.col("type_b")
    )

    def d(c):
        return F.col(c).cast("double")

    m_a = d("sx_a") / d("n_a")
    m_b = d("sx_b") / d("n_b")
    # Degenerate-input guards (the SCALE.md NULL convention, mirrored
    # by the twin's natural x/0 -> NULL in DuckDB): a single-event
    # group has no sample variance (n(n-1) = 0 would ANSI-crash the
    # scan — probed r10), and a zero-variance pair has no t/df. NULL
    # propagates through se2/t/df identically in both engines.
    v_a = F.when(
        d("n_a") >= 2,
        (d("n_a") * d("sxx_a") - d("sx_a") * d("sx_a"))
        / (d("n_a") * (d("n_a") - F.lit(1.0))),
    )
    v_b = F.when(
        d("n_b") >= 2,
        (d("n_b") * d("sxx_b") - d("sx_b") * d("sx_b"))
        / (d("n_b") * (d("n_b") - F.lit(1.0))),
    )
    se_a = v_a / d("n_a")
    se_b = v_b / d("n_b")
    se2 = se_a + se_b
    # se2 can round NEGATIVE for constant huge-magnitude groups (exact
    # n*sxx == sx^2 but the double products disagree past 2^53): the
    # se2 > 0 guard must cover BOTH t and df — squared se terms make
    # df_den positive even when se2 < 0, which produced a bogus df
    # while the twin's sqrt(negative) raised (r10 review finding; the
    # twin now carries the same CASE).
    t = F.when(se2 > 0, (m_a - m_b) / F.sqrt(se2))
    df_den = (se_a * se_a) / (d("n_a") - F.lit(1.0)) + (se_b * se_b) / (
        d("n_b") - F.lit(1.0)
    )
    df = F.when((se2 > 0) & (df_den > 0), (se2 * se2) / df_den)
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        t.alias("t_stat"),
        df.alias("welch_df"),
    )


ANOVA_SCALE = 1_000  # e3 quantum: keeps quantized squares inside int64


def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types on the value column: does the
    mean differ across ANY group? — the k-group generalization of the
    t-test (F = between-group mean square / within-group mean square,
    via the sum-of-squares identities SSB = sum(Sx_g^2/n_g) - Sx^2/N
    and SSW = sum(x^2) - sum(Sx_g^2/n_g), all on exact sums).

    Each group's Sx_g^2/n_g term is ONE correctly-rounded double
    quantized to e{3} BEFORE the cross-group sum (the psi device —
    a raw float sum over groups would be accumulation-order-dependent),
    chosen at e3 because the squared cents terms approach int64 at e6.
    F is one closing expression; the e3 scales cancel in the ratio.
    Quantized magnitudes past 2^53 are OUT OF DOMAIN and yield NULL
    sums-of-squares/F — railed at BOTH levels: each per-group term AND
    their cross-group sum (DECIMAL(38,0)/HUGEINT carrier + s1 < 2^53
    check, r11), so the claim of crash- and divergence-freedom at any
    value magnitude holds even for thousands of near-limit groups.

    At 100 TB: one map-side-combined pass to |types| rows of exact
    sufficient statistics; everything else is |types|-row algebra.
    """
    # Finite-measure contract (r12 non-finite probe: the cents carrier
    # crashes on NaN/Inf in both engines). Twin mirrors the WHERE.
    ev = load_table(spark, sf_dir, "events").filter(finite("value")).select(
        "event_type", F.expr(CENTS_VAL).alias("cents")
    )
    dec = "decimal(19,0)"
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n_g"),
        F.sum(F.col("cents").cast(dec)).alias("sx_g"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias(
            "sxx_g"
        ),
    )
    # Portable-domain rail (probed r10 on an adversarial corpus): the
    # e3-quantized terms are exact only while they fit a double's
    # integer range (< 2^53). Beyond that the long cast ANSI-crashes —
    # a single $10M-value group did — and a wider decimal carrier is
    # NOT portable either: Spark casts a double to decimal via its
    # shortest decimal representation while DuckDB casts the exact
    # binary value, so past 2^53 the two engines disagree in the low
    # digits. The rail compares the IDENTICAL pre-cast doubles in both
    # engines, so both take the same branch: in-domain groups compute
    # as before, out-of-domain inputs yield NULL ssb/ssw/f_stat (the
    # SCALE.md degenerate convention) instead of a crash.
    _DLIM = 9007199254740992.0  # 2^53
    term_d = F.round(
        (
            F.col("sx_g").cast("double")
            * F.col("sx_g").cast("double")
            / F.col("n_g").cast("double")
        )
        * F.lit(float(ANOVA_SCALE))
    )
    # The SUM of in-domain terms is carried in DECIMAL(38,0), not
    # BIGINT: each term is < 2^53 but ~1000+ groups near the limit
    # could push a BIGINT sum past 2^63, where Spark's ANSI sum raises
    # while DuckDB sums into HUGEINT and only fails later (r10 ADVICE).
    # The decimal sum is exact in both engines, and in_dom below also
    # requires s1_e3 < 2^53 — the same branch in both engines — so the
    # rail now covers the sum, not just each per-group term.
    term = F.when(
        term_d < F.lit(_DLIM), term_d.cast("decimal(38,0)")
    )
    agg = g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(F.col("sx_g")).alias("sx"),
        F.sum(F.col("sxx_g")).alias("sxx"),
        F.sum(term).alias("s1_e3"),
        F.max(
            F.when(term_d >= F.lit(_DLIM), F.lit(1)).otherwise(F.lit(0))
        ).alias("oob"),
    )
    t_d = F.round(
        (
            F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n").cast("double")
        )
        * F.lit(float(ANOVA_SCALE))
    )
    sxx_d = F.round(
        F.col("sxx").cast("double") * F.lit(float(ANOVA_SCALE))
    )
    in_dom = (
        (F.col("oob") == 0)
        & (t_d < F.lit(_DLIM))
        & (sxx_d < F.lit(_DLIM))
        # exact decimal-vs-int compare, identical branch in both engines
        & (F.col("s1_e3") < F.lit(9007199254740992))
    )
    withss = agg.select(
        "k",
        F.col("n").cast("long").alias("n"),
        F.when(
            in_dom, F.col("s1_e3").cast("long") - t_d.cast("long")
        ).alias("ssb_e3"),
        F.when(
            in_dom, sxx_d.cast("long") - F.col("s1_e3").cast("long")
        ).alias("ssw_e3"),
    )
    f_stat = (
        F.col("ssb_e3").cast("double") / (F.col("k") - 1).cast("double")
    ) / (
        F.col("ssw_e3").cast("double")
        / (F.col("n") - F.col("k")).cast("double")
    )
    return withss.select("k", "n", "ssb_e3", "ssw_e3", f_stat.alias("f_stat"))


TRIM_PERMILLE = 100  # 10% trimmed from EACH tail


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-two-sided trimmed mean of the unit price per l_returnflag —
    the robust location estimate between mean (trim 0) and median
    (trim 50): drop the cheapest and priciest 10% of rows, average the
    middle. Outlier-immune without the median's information loss.

    Fully integer until the last op: trim cut-points lo = N*{100}/1000
    and hi = N - lo are exact int64; each histogram value contributes
    include_cnt = max(0, min(cb + c, hi) - max(cb, lo)) rows (cb =
    cumulative count before the value) — pure integer interval
    clipping; the trimmed sum is an exact int64 dot product and the
    mean is ONE closing division.

    At 100 TB: the corpus collapses to a (group, cents) histogram in
    one map-side-combined pass; the cumulative window runs per group
    over histogram rows. One shuffle, keyed by the group.
    """
    # Required-column rail (r11 NULL sweep) extended to the finite-
    # measure contract (r12 non-finite probe). Twin mirrors the WHERE.
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & finite("l_extendedprice")
    ).select("l_returnflag", F.expr(CENTS_EP).alias("cents"))
    h = li.groupBy("l_returnflag", "cents").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "cents",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).alias("cb"),
        F.sum("c").over(wall).alias("n"),
    )
    lo = F.expr(f"n * {TRIM_PERMILLE} DIV 1000")
    hi = F.col("n") - lo
    inc = F.greatest(
        F.lit(0),
        F.least(F.col("cb") + F.col("c"), hi) - F.greatest(F.col("cb"), lo),
    )
    agg = c.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        F.sum(inc).alias("n_kept"),
        F.sum(inc * F.col("cents")).alias("kept_cents"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.col("n_kept").cast("long").alias("n_kept"),
        (
            F.col("kept_cents").cast("double")
            / F.col("n_kept").cast("double")
        ).alias("trimmed_mean_cents"),
    )


# z_(0.975) + z_(0.80): standard 5% two-sided / 80% power design point
AB_Z_SUM = 2.801585218126088


def q_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator from the observed pilot: with the
    two variants' observed conversion rates as the design assumption,
    the per-variant n required to detect that difference at alpha=5%
    two-sided / 80% power — n = (z_a + z_b)^2 * (p_a(1-p_a) +
    p_b(1-p_b)) / (p_a - p_b)^2 — the "how long must this test run"
    readout every experimentation platform pairs with the z-test.

    The z-quantile sum is a LITERAL constant ({AB_Z_SUM}); rates and
    the closing formula are IEEE-exact chains on exact counts (the
    ab_test device); n_required = ceil(), NULL when the observed
    delta is zero (an undetectable difference needs infinite n, not a
    fabricated number).

    At 100 TB: one map-side-combined pass to per-user conversion
    flags, a 2-row variant aggregate, constant algebra after that.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    pv = (
        users.select((F.col("user_id") % 2).alias("variant"), "converted")
        .groupBy("variant")
        .agg(F.count("*").alias("n"), F.sum("converted").alias("conv"))
    )
    a = pv.filter("variant = 0").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = pv.filter("variant = 1").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(b)
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    delta = p_a - p_b
    s = p_a * (F.lit(1.0) - p_a) + p_b * (F.lit(1.0) - p_b)
    n_req = F.ceil(
        F.lit(AB_Z_SUM) * F.lit(AB_Z_SUM) * s / (delta * delta)
    )
    return j.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        delta.alias("observed_delta"),
        F.when(F.col("conv_a") * F.col("n_b") != F.col("conv_b") * F.col("n_a"), n_req)
        .cast("long")
        .alias("n_required_per_variant"),
    )


QUERIES = {
    "cross_correlation_lag": q_cross_correlation_lag,
    "kendall_tau_daily": q_kendall_tau_daily,
    "ols_multifeature": q_ols_multifeature,
    "weighted_median": q_weighted_median,
    "pr_auc_features": q_pr_auc_features,
    "stratified_ate": q_stratified_ate,
    "t_test_welch": q_t_test_welch,
    "anova_oneway": q_anova_oneway,
    "trimmed_mean": q_trimmed_mean,
    "ab_power_analysis": q_ab_power_analysis,
}

# Radicand-guarded (mirrors _pearson_from_sums): DuckDB's sqrt RAISES
# on a rounding-negative variance numerator instead of returning NaN.
_PEARSON_CLOSE = """
       CASE WHEN CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN
       (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END
"""

ORACLE = {
    "cross_correlation_lag": f"""
WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
days AS (SELECT DISTINCT day FROM ev),
cx AS (SELECT day, COUNT(*) AS n FROM ev
       WHERE event_type = '{XCORR_X}' GROUP BY day),
cy AS (SELECT day, COUNT(*) AS n FROM ev
       WHERE event_type = '{XCORR_Y}' GROUP BY day),
xs AS (SELECT d.day, COALESCE(cx.n, 0)::HUGEINT AS x
       FROM days d LEFT JOIN cx USING (day)),
ys AS (SELECT d.day, COALESCE(cy.n, 0)::HUGEINT AS y
       FROM days d LEFT JOIN cy USING (day)),
lags AS (SELECT CAST(r AS INT) AS lag FROM range(0, {XCORR_MAX_LAG + 1}) t(r)),
paired AS (
  SELECT l.lag, xs.x, ys.y
  FROM xs CROSS JOIN lags l
  JOIN ys ON ys.day = xs.day + l.lag
),
agg AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM paired GROUP BY lag
)
SELECT lag, n_days,
{_PEARSON_CLOSE}
         AS xcorr
FROM agg
""",
    "kendall_tau_daily": """
WITH d AS (
  SELECT o_orderdate AS day, COUNT(*) AS x,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders WHERE isfinite(o_totalprice) GROUP BY o_orderdate
),
pairs AS (
  SELECT a.x - b.x AS dx, a.y - b.y AS dy
  FROM d a JOIN d b ON a.day < b.day
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
         CAST(SUM(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
         CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_x,
         CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_y
  FROM pairs
)
SELECT n0, n_conc, n_disc, n_tie_x, n_tie_y,
       (CAST(n_conc AS DOUBLE) - CAST(n_disc AS DOUBLE))
       / (sqrt(CAST(n0 AS DOUBLE) - CAST(n_tie_x AS DOUBLE))
          * sqrt(CAST(n0 AS DOUBLE) - CAST(n_tie_y AS DOUBLE))) AS tau_b
FROM agg
""",
    "ols_multifeature": f"""
WITH li AS (
  SELECT l_returnflag,
         -- TRUNC mirrors Spark's truncating double->int cast (r12)
         CAST(TRUNC(l_quantity) AS BIGINT)::HUGEINT AS x1,
         ({BP_DISC})::HUGEINT AS x2,
         ({CENTS_EP})::HUGEINT AS y
  FROM lineitem
  -- isfinite: the r12 finite-measure contract (engine mirrors)
  WHERE l_returnflag IS NOT NULL AND isfinite(l_quantity)
    AND isfinite(l_discount) AND isfinite(l_extendedprice)
),
agg AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
         SUM(x1 * x1) AS sx1x1, SUM(x1 * x2) AS sx1x2,
         SUM(x2 * x2) AS sx2x2,
         SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y
  FROM li GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS dn,
         CAST(sx1 AS DOUBLE) AS a1, CAST(sx2 AS DOUBLE) AS a2,
         CAST(sy AS DOUBLE) AS ay,
         CAST(sx1x1 AS DOUBLE) AS a11, CAST(sx1x2 AS DOUBLE) AS a12,
         CAST(sx2x2 AS DOUBLE) AS a22,
         CAST(sx1y AS DOUBLE) AS a1y, CAST(sx2y AS DOUBLE) AS a2y
  FROM agg
)
SELECT l_returnflag, n,
       (ay * (a11 * a22 - a12 * a12)
          - a1 * (a1y * a22 - a12 * a2y)
          + a2 * (a1y * a12 - a11 * a2y))
       / (dn * (a11 * a22 - a12 * a12)
          - a1 * (a1 * a22 - a12 * a2)
          + a2 * (a1 * a12 - a11 * a2)) AS b0_cents,
       (dn * (a1y * a22 - a12 * a2y)
          - ay * (a1 * a22 - a12 * a2)
          + a2 * (a1 * a2y - a1y * a2))
       / (dn * (a11 * a22 - a12 * a12)
          - a1 * (a1 * a22 - a12 * a2)
          + a2 * (a1 * a12 - a11 * a2)) AS b1_cents_per_qty,
       (dn * (a11 * a2y - a1y * a12)
          - a1 * (a1 * a2y - a1y * a2)
          + ay * (a1 * a12 - a11 * a2))
       / (dn * (a11 * a22 - a12 * a12)
          - a1 * (a1 * a22 - a12 * a2)
          + a2 * (a1 * a12 - a11 * a2)) AS b2_cents_per_bp
FROM d
""",
    "weighted_median": f"""
WITH h AS (
  SELECT l_returnflag, {CENTS_EP} AS cents,
         -- TRUNC mirrors Spark's truncating double->int cast (r12)
         CAST(SUM(CAST(TRUNC(l_quantity) AS BIGINT)) AS BIGINT) AS tw
  FROM lineitem
  WHERE isfinite(l_quantity) AND isfinite(l_extendedprice)
  GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, cents,
         SUM(tw) OVER (PARTITION BY l_returnflag ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(tw) OVER (PARTITION BY l_returnflag) AS tot
  FROM h
),
q AS (
  SELECT l_returnflag, cents, tot,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cents) AS rn
  FROM c WHERE 2 * cw >= tot
)
SELECT l_returnflag, cents AS wmedian_cents,
       CAST(tot AS BIGINT) AS total_weight
FROM q WHERE rn = 1
""",
    "pr_auc_features": f"""
WITH feats AS (
  SELECT label, CAST(j AS INT) AS feature_idx,
         CAST(round(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) * 1e6)
              AS BIGINT) AS score
  FROM embeddings, range(0, {AUC_N_FEATURES}) t(j)
  WHERE label IS NOT NULL
    AND len(list_filter(CAST(embedding AS DOUBLE[]),
                        x -> abs(x) > 1000000.0 OR isnan(x))) = 0
    AND len(list_filter(CAST(embedding AS DOUBLE[]), x -> x <> 0.0)) > 0
),
lab_h AS (
  SELECT feature_idx, score, label, COUNT(*) AS n
  FROM feats GROUP BY 1, 2, 3
),
tot_h AS (
  SELECT feature_idx, score, SUM(n) AS t_v
  FROM lab_h GROUP BY 1, 2
),
labels AS (SELECT DISTINCT label AS target FROM lab_h),
grid AS (
  SELECT l.target, t.feature_idx, t.score, t.t_v,
         COALESCE(lh.n, 0) AS np_v
  FROM tot_h t CROSS JOIN labels l
  LEFT JOIN lab_h lh
    ON lh.feature_idx = t.feature_idx AND lh.score = t.score
   AND lh.label = l.target
),
cum AS (
  SELECT target, feature_idx, np_v,
         SUM(np_v) OVER (PARTITION BY target, feature_idx
                         ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) AS tp,
         SUM(t_v - np_v) OVER (PARTITION BY target, feature_idx
                               ORDER BY score DESC
                               ROWS UNBOUNDED PRECEDING) AS fp,
         SUM(np_v) OVER (PARTITION BY target, feature_idx) AS n_pos,
         SUM(t_v - np_v) OVER (PARTITION BY target, feature_idx) AS n_neg
  FROM grid
),
terms AS (
  SELECT target, feature_idx, n_pos, n_neg,
         CAST(round(CAST(np_v AS DOUBLE) * CAST(tp AS DOUBLE)
                    / CAST(tp + fp AS DOUBLE) * 1e12) AS BIGINT) AS term
  FROM cum WHERE np_v > 0
)
SELECT target AS label, feature_idx,
       CAST(MAX(n_pos) AS BIGINT) AS n_pos,
       CAST(MAX(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(term) AS DOUBLE)
         / (CAST(MAX(n_pos) AS DOUBLE) * 1e12) AS avg_precision
FROM terms GROUP BY 1, 2
""",
    "stratified_ate": f"""
WITH ev AS (
  SELECT user_id, event_type, {CENTS_VAL} AS cents FROM events WHERE isfinite(value)
),
per_user AS (
  SELECT user_id, COUNT(*) AS activity,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS treated,
         SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
           AS outcome_cents
  FROM ev GROUP BY user_id
),
hist AS (SELECT activity, COUNT(*) AS n FROM per_user GROUP BY activity),
bands AS (
  SELECT activity,
         CAST(({ATE_STRATA} * SUM(n) OVER (ORDER BY activity
                                           ROWS UNBOUNDED PRECEDING)
               + SUM(n) OVER () - 1) // SUM(n) OVER () AS INT) AS stratum
  FROM hist
),
cells AS (
  SELECT stratum,
         CAST(SUM(treated) AS BIGINT) AS n_treated,
         CAST(SUM(1 - treated) AS BIGINT) AS n_control,
         SUM(CASE WHEN treated = 1 THEN outcome_cents ELSE 0 END) AS sum_t,
         SUM(CASE WHEN treated = 0 THEN outcome_cents ELSE 0 END) AS sum_c
  FROM per_user JOIN bands USING (activity)
  GROUP BY stratum
)
SELECT stratum, n_treated, n_control,
       CASE WHEN n_treated > 0
            THEN CAST(sum_t AS DOUBLE) / CAST(n_treated AS DOUBLE)
       END AS mean_treated_cents,
       CASE WHEN n_control > 0
            THEN CAST(sum_c AS DOUBLE) / CAST(n_control AS DOUBLE)
       END AS mean_control_cents,
       CASE WHEN n_treated > 0 AND n_control > 0
            THEN CAST(sum_t AS DOUBLE) / CAST(n_treated AS DOUBLE)
                 - CAST(sum_c AS DOUBLE) / CAST(n_control AS DOUBLE)
       END AS ate_cents
FROM cells
""",
    "t_test_welch": f"""
WITH ev AS (SELECT event_type, {CENTS_VAL} AS cents FROM events
         WHERE isfinite(value)),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(cents::HUGEINT) AS sx,
         SUM(cents::HUGEINT * cents::HUGEINT) AS sxx
  FROM ev GROUP BY event_type
),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n AS n_a, a.sx AS sx_a, a.sxx AS sxx_a,
         b.n AS n_b, b.sx AS sx_b, b.sxx AS sxx_b
  FROM g a JOIN g b ON a.event_type < b.event_type
),
d AS (
  SELECT type_a, type_b, n_a, n_b,
         CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS m_a,
         CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m_b,
         ((CAST(n_a AS DOUBLE) * CAST(sxx_a AS DOUBLE)
             - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE))
          / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
           / CAST(n_a AS DOUBLE) AS se_a,
         ((CAST(n_b AS DOUBLE) * CAST(sxx_b AS DOUBLE)
             - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE))
          / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
           / CAST(n_b AS DOUBLE) AS se_b
  FROM p
)
SELECT type_a, type_b, n_a, n_b,
       -- se_a + se_b > 0 guard on BOTH stats, mirroring the engine:
       -- constant huge-magnitude groups round se2 negative, where
       -- sqrt would RAISE here and df would compute a bogus positive.
       CASE WHEN se_a + se_b > 0
            THEN (m_a - m_b) / sqrt(se_a + se_b) END AS t_stat,
       CASE WHEN se_a + se_b > 0
             AND (se_a * se_a) / (CAST(n_a AS DOUBLE) - 1.0)
                 + (se_b * se_b) / (CAST(n_b AS DOUBLE) - 1.0) > 0
            THEN ((se_a + se_b) * (se_a + se_b))
                 / ((se_a * se_a) / (CAST(n_a AS DOUBLE) - 1.0)
                    + (se_b * se_b) / (CAST(n_b AS DOUBLE) - 1.0))
       END AS welch_df
FROM d
""",
    "anova_oneway": f"""
WITH ev AS (SELECT event_type, {CENTS_VAL} AS cents FROM events
         WHERE isfinite(value)),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(cents::HUGEINT) AS sx_g,
         SUM(cents::HUGEINT * cents::HUGEINT) AS sxx_g
  FROM ev GROUP BY event_type
),
gq AS (
  -- The quantized per-group term, computed ONCE (r10 review: edits to
  -- the quantization must never have to hit multiple textual copies —
  -- a missed copy breaks the both-take-the-same-branch rail).
  SELECT g.*,
         round((CAST(sx_g AS DOUBLE) * CAST(sx_g AS DOUBLE)
                / CAST(n_g AS DOUBLE)) * {ANOVA_SCALE}.0) AS term_d
  FROM g
),
agg AS (
  -- Portable-domain rail mirroring the engine: quantized terms fit a
  -- double's integer range (< 2^53) or the group is out-of-domain and
  -- every sum-of-squares output is NULL (see the engine docstring —
  -- long carriers overflow there and double->decimal casts diverge
  -- between engines past 2^53).  s1_e3 sums BIGINT terms into HUGEINT
  -- (exact, like the engine's DECIMAL(38,0) carrier); the ss rail
  -- below also requires s1_e3 < 2^53 so the SUM itself is railed, not
  -- just each term (r10 ADVICE: ~1000+ near-limit groups could pass
  -- every per-term check yet overflow an int64 sum).
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         SUM(sx_g) AS sx, SUM(sxx_g) AS sxx,
         SUM(CASE WHEN term_d < 9007199254740992.0
                  THEN CAST(term_d AS BIGINT) END)::HUGEINT AS s1_e3,
         MAX(CASE WHEN term_d >= 9007199254740992.0
                  THEN 1 ELSE 0 END) AS oob
  FROM gq
),
qd AS (
  SELECT k, n, s1_e3, oob,
         round((CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE)) * {ANOVA_SCALE}.0) AS t_d,
         round(CAST(sxx AS DOUBLE) * {ANOVA_SCALE}.0) AS sxx_d
  FROM agg
),
ss AS (
  SELECT k, n,
         CASE WHEN oob = 0 AND t_d < 9007199254740992.0
                          AND sxx_d < 9007199254740992.0
                          AND s1_e3 < 9007199254740992
              THEN CAST(s1_e3 AS BIGINT) - CAST(t_d AS BIGINT)
         END AS ssb_e3,
         CASE WHEN oob = 0 AND t_d < 9007199254740992.0
                          AND sxx_d < 9007199254740992.0
                          AND s1_e3 < 9007199254740992
              THEN CAST(sxx_d AS BIGINT) - CAST(s1_e3 AS BIGINT)
         END AS ssw_e3
  FROM qd
)
SELECT k, n, ssb_e3, ssw_e3,
       (CAST(ssb_e3 AS DOUBLE) / CAST(k - 1 AS DOUBLE))
       / (CAST(ssw_e3 AS DOUBLE) / CAST(n - k AS DOUBLE)) AS f_stat
FROM ss
""",
    "trimmed_mean": f"""
WITH h AS (
  SELECT l_returnflag, {CENTS_EP} AS cents, COUNT(*) AS c
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND isfinite(l_extendedprice)
  GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, cents, c,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) - c AS cb,
         SUM(c) OVER (PARTITION BY l_returnflag) AS n
  FROM h
),
inc AS (
  SELECT l_returnflag, cents, n,
         GREATEST(0, LEAST(cb + c, n - (n * {TRIM_PERMILLE} // 1000))
                     - GREATEST(cb, n * {TRIM_PERMILLE} // 1000)) AS keep
  FROM c
)
SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(keep * cents) AS DOUBLE) / CAST(SUM(keep) AS DOUBLE)
         AS trimmed_mean_cents
FROM inc GROUP BY l_returnflag
""",
    "ab_power_analysis": f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id),
pv AS (
  SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM users GROUP BY user_id % 2),
a AS (SELECT n AS n_a, conv AS conv_a FROM pv WHERE variant = 0),
b AS (SELECT n AS n_b, conv AS conv_b FROM pv WHERE variant = 1),
j AS (SELECT * FROM a, b),
s AS (
  SELECT n_a, conv_a, n_b, conv_b,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS delta,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           * (1.0 - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         + CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           * (1.0 - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS svar
  FROM j)
SELECT n_a, conv_a, n_b, conv_b,
       delta AS observed_delta,
       CASE WHEN conv_a * n_b <> conv_b * n_a
            THEN CAST(ceil({AB_Z_SUM!r} * {AB_Z_SUM!r} * svar
                           / (delta * delta)) AS BIGINT)
       END AS n_required_per_variant
FROM s
""",
}
