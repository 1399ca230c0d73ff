"""Set-based statistics operators: per-group OLS regression, column
profiling, and robust (median/MAD) outlier detection.

These are the data-quality / drift-detection companions to the CDC
pipeline (the reference recomputes gold per trigger —
``notebooks/04_Current_Inventory.sql:3`` — and a production deployment
needs exactly these checks running next to it), and standard
feature-engineering steps for a training-data pipeline.

Scale design, per operator:

- ``group_regression``: one map-side-partial aggregation producing the
  five OLS sufficient statistics (n, Σx, Σy, Σxy, Σx²) per group — a
  single shuffle keyed by the group columns, no window, no second
  pass. The sums are computed over INTEGER-valued inputs so they are
  exact and aggregation-order-independent; the slope/intercept
  division happens once per group in DOUBLE on identical operands, so
  the result is bit-reproducible across engines and cluster layouts.
- ``column_profile``: ALL columns profiled in ONE pass (a single agg
  row with 4 statistics per column, then an unpivot to rows) — at
  100 TB this matters: k columns cost one scan, not k scans.
- ``mad_outliers``: three aggregations (median, median of absolute
  deviations, outlier count) over a once-materialized projection of
  the fact plus broadcast joins of the tiny per-group statistics —
  one raw-table scan, never a row-to-row self-join.

Later additions (same discipline): ``key_skew_report``,
``quantile_bins``, ``zscore_normalize``, ``transition_pmi``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "group_regression",
    "column_profile",
    "mad_outliers",
    "key_skew_report",
    "quantile_bins",
    "zscore_normalize",
    "transition_pmi",
    "survival_curve",
    "rank_normalize",
    "unigram_js_divergence",
]


def group_regression(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y ~ x``.

    ``x`` and ``y`` must be integer-valued expressions (cast your
    inputs to days / cents / counts first): the five sufficient
    statistics are then exact longs, immune to shuffle order, and the
    final ``slope``/``intercept`` doubles are bit-identical on every
    run. Equivalent to ``regr_slope``/``regr_intercept`` but with the
    deterministic-sum discipline the value-hash gate needs.

    Degenerate groups (constant ``x``, including every single-row
    group) have a zero denominator; ``try_divide`` yields NULL slope
    and intercept there instead of an ANSI DIVIDE_BY_ZERO abort —
    mirror with ``NULLIF(denom, 0)`` in SQL oracles.

    Output: ``group_cols + [n, slope, intercept]``.
    """
    xl = x.cast("long")
    yl = y.cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).alias("sxy"),
        F.sum(xl * xl).alias("sxx"),
    )
    # All operands cast to double FIRST, then one fixed expression
    # shape — same IEEE ops in the oracle ⇒ same bits.
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = F.try_divide(n * sxy - sx * sy, denom)
    intercept = (sy - slope * sx) / n
    return agg.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profiler: for each column, its non-null count,
    approximate-free exact distinct count, and min/max rendered as
    strings (so heterogeneous column types can share one output
    schema).

    Single aggregation over the whole input (map-side partial for the
    counts; ``count(DISTINCT ...)`` per column is expanded by Spark
    into one expand + aggregate — still one scan), then a ``stack``
    unpivot of the 1-row result. Output:
    ``(column_name, n_nonnull, n_distinct, min_value, max_value)``.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__d"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args: list[Column] = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"{c}__n"),
            F.col(f"{c}__d"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
        ]
    n = len(cols)
    return one.select(
        F.stack(
            F.lit(n),
            *stack_args,
        ).alias("column_name", "n_nonnull", "n_distinct", "min_value", "max_value")
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier counts via median absolute deviation.

    ``value`` should be integer-valued (cents) so the exact
    ``percentile(0.5)`` interpolation (midpoint of two longs) matches
    ANSI ``quantile_cont`` bit-for-bit. A row is an outlier when
    ``|v - median| > k * 1.4826 * mad`` (the normal-consistency
    constant); the threshold is computed once per group from identical
    doubles, so the integer comparison is engine-deterministic.

    The projected fact is materialized once (lazy local checkpoint) and
    re-read by the three aggregations (median, MAD, outlier count) —
    one raw-table scan total, plus broadcast joins of the tiny
    per-group statistics. Output
    ``group_cols + [n, median_value, mad, n_outliers]``.
    """
    vl = value.cast("long")
    with_v = df.select(*group_cols, vl.alias("__v")).localCheckpoint(eager=False)
    med = with_v.groupBy(*group_cols).agg(
        F.expr("percentile(__v, 0.5)").alias("__med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = with_v.join(F.broadcast(med), group_cols).withColumn(
        "__adev", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(F.expr("percentile(__adev, 0.5)").alias("__mad"))
    thresh = F.lit(float(k)) * F.lit(1.4826) * F.col("__mad")
    out = (
        dev.join(F.broadcast(mad), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.first("n").alias("n"),
            F.first("__med").alias("median_value"),
            F.first("__mad").alias("mad"),
            F.sum((F.col("__adev") > thresh).cast("long")).alias("n_outliers"),
        )
    )
    return out.select(*group_cols, "n", "median_value", "mad", "n_outliers")


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the pre-flight check for
    any 100 TB shuffle. One count-per-key aggregation, then a single
    summary row: key cardinality, total rows, the hottest key's count,
    p50/p99 of the per-key distribution, and the share (ppm) of all
    rows held by the ``top_k`` hottest keys — the number that tells you
    whether a salted join (operators/joins.py:salted_join) or AQE skew
    split is worth it.

    The top-k sum uses a TakeOrdered (per-partition heaps + driver
    merge of k rows), never a global sort; ties break on the key for
    determinism. ppm is an exact integer.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), *key_cols).limit(top_k)
    topsum = top.agg(F.sum("cnt").alias("top_cnt"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
    )
    return (
        summary.crossJoin(F.broadcast(topsum))
        .select(
            "n_keys",
            "n_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.expr("1000000 * top_cnt div n_rows").alias(
                f"top{top_k}_share_ppm"
            ),
        )
    )


def quantile_bins(
    df: DataFrame,
    value: Column,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) bucketing of an integer-valued
    expression — the feature-engineering discretizer (deciles by
    default). One tiny aggregation computes the n−1 interior exact
    percentile thresholds; the assignment is a broadcast of that 1-row
    threshold array plus a map-only count of thresholds at or below
    each value. Spark's own ``QuantileDiscretizer`` is this with an
    approximate sketch; the exact form stays oracle-replayable.

    Output: input columns + ``out_col`` (0-based bin index).
    """
    probs = [i / n_bins for i in range(1, n_bins)]
    vl = value.cast("long")
    with_v = df.withColumn("__v", vl)
    ths = with_v.agg(
        F.expr(
            "percentile(__v, array({}))".format(",".join(str(p) for p in probs))
        ).alias("__ths")
    )
    binned = with_v.crossJoin(F.broadcast(ths)).withColumn(
        out_col,
        F.size(F.filter(F.col("__ths"), lambda t: F.col("__v") >= t)).cast("int"),
    )
    return binned.drop("__v", "__ths")


def zscore_normalize(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    out_col: str = "z",
    ndigits: int = 6,
) -> DataFrame:
    """Per-group z-score standardization — the feature-normalization
    step (works per language / per source / per store). ``value`` must
    be integer-valued AND sized so its square-sum fits a long (whole
    dollars, not cents, for money at billions of rows): the mean and
    sample-variance then derive from exact integer sums (one map-side-
    partial aggregation), every group's (mean, std) is bit-identical on
    every engine, and the per-row z is one broadcast join + map.

    Rows in groups with zero variance (or a single row) get z = 0.0.

    Output: input columns + ``out_col`` (rounded to ``ndigits``).
    """
    vl = value.cast("long")
    with_v = df.withColumn("__v", vl)
    stats = with_v.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__v").alias("__sx"),
        F.sum(F.col("__v") * F.col("__v")).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    mean = sx / n
    # try_divide: a single-row group has n-1 == 0 and would abort the
    # whole job under ANSI mode; NULL std falls into the z = 0.0 branch.
    std = F.sqrt(F.try_divide(sxx - sx * sx / n, n - F.lit(1.0)))
    stats = stats.select(
        *group_cols, mean.alias("__mean"), std.alias("__std")
    )
    z = F.when(
        F.col("__std") > 0.0,
        F.round((F.col("__v").cast("double") - F.col("__mean")) / F.col("__std"), ndigits),
    ).otherwise(F.lit(0.0))
    return (
        with_v.join(F.broadcast(stats), group_cols)
        .withColumn(out_col, z)
        .drop("__v", "__mean", "__std")
    )


def transition_pmi(
    df: DataFrame,
    seq_cols: list[str],
    state: Column,
    order_cols: list[str],
    ndigits: int = 5,
) -> DataFrame:
    """Pointwise mutual information of consecutive state transitions —
    "which event follows which" beyond raw counts (PMI > 0: the pair
    co-occurs more than independence predicts). The sequence-mining
    companion to the funnel (q80) and sessionize (q48) operators.

    One lead() window per sequence (partitioned by ``seq_cols`` — the
    natural key distribution, no global sort), then three tiny
    aggregations (pair counts, both margins) joined broadcast. PMI =
    ln(n_xy·N / (n_x·n_y)) on exact integer counts, rounded.

    Output: ``(from_state, to_state, n, pmi)``.
    """
    w = Window.partitionBy(*seq_cols).orderBy(*order_cols)
    tr = (
        df.select(
            *seq_cols,
            *order_cols,
            state.alias("__s"),
        )
        .withColumn("__next", F.lead("__s").over(w))
        .filter(F.col("__next").isNotNull())
    )
    pairs = tr.groupBy(
        F.col("__s").alias("from_state"), F.col("__next").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("n"))
    from_m = pairs.groupBy("from_state").agg(F.sum("n").alias("n_x"))
    to_m = pairs.groupBy("to_state").agg(F.sum("n").alias("n_y"))
    total = pairs.agg(F.sum("n").alias("n_tot"))
    pmi = F.round(
        F.log(
            F.col("n").cast("double")
            * F.col("n_tot").cast("double")
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        ),
        ndigits,
    )
    return (
        pairs.join(F.broadcast(from_m), "from_state")
        .join(F.broadcast(to_m), "to_state")
        .crossJoin(F.broadcast(total))
        .select("from_state", "to_state", "n", pmi.alias("pmi"))
    )


def scalable_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    num_buckets: int = 256,
) -> DataFrame:
    """Running (prefix) sum of ``value_col`` in ``order_col`` order
    WITHOUT a single-partition window over the full table.

    ``Window.orderBy(x)`` with no partition spec moves every row to ONE
    partition — fine for sketch-sized tables (histogram bins, day
    spines), a serial bottleneck when the windowed table scales with
    the corpus (e.g. the per-document vocabulary growth curve). This is
    the classic two-level parallel prefix sum, in DataFrame ops:

    1. range-bucket rows on ``order_col`` (equal-width over [min, max],
       bounds cross-broadcast from a 1-row aggregate — no driver
       round-trip, same spine pattern as the gap-fill operator);
    2. running sum WITHIN each bucket — a partitioned window, fully
       parallel;
    3. per-bucket totals (``num_buckets`` rows) get an EXCLUSIVE
       running sum over a single-partition window — serial, but over a
       fixed-size tiny table by construction;
    4. broadcast the bucket offsets back and add.

    Exactness: equal ``order_col`` values land in the same bucket, so
    the result is identical to the global window's for unique
    ``order_col``; with ties, both forms share the same
    within-tie-order caveat. ``value_col`` must be numeric;
    ``order_col`` must be numeric/date-castable for the bucketing.

    Output: input columns + ``out_col``. A constant-``order_col`` or
    empty input degrades to one bucket (still correct).
    """
    bounds = df.agg(
        F.min(F.col(order_col).cast("double")).alias("__mn"),
        F.max(F.col(order_col).cast("double")).alias("__mx"),
    )
    b = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.when(
            F.col("__mx") == F.col("__mn"), F.lit(1)
        ).otherwise(
            F.width_bucket(
                F.col(order_col).cast("double"),
                F.col("__mn"),
                # nudge the upper bound so max lands in the last bucket,
                # not the overflow bucket
                F.col("__mx") + F.lit(1e-9) + (F.col("__mx") - F.col("__mn")) * F.lit(1e-9),
                num_buckets,
            )
        ),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("__run_in", F.sum(value_col).over(w_in))
    totals = b.groupBy("__bkt").agg(F.sum(value_col).alias("__tot"))
    w_off = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        within.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__run_in") + F.col("__off"))
        .drop("__bkt", "__mn", "__mx", "__run_in")
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str = "v_wins",
) -> DataFrame:
    """Per-group winsorization: clamp an integer-valued expression to
    its group's exact [p_lo, p_hi] percentiles — the standard
    heavy-tail tamer for features and label values before training
    (cap, don't drop: the row count and group composition stay
    intact).

    ``value`` must be integer-valued (cents) so the exact
    ``percentile`` interpolation (a midpoint of two longs) is the same
    IEEE double on every engine — the `mad_outliers` discipline. The
    two thresholds come from ONE tiny per-group aggregate broadcast
    back to the rows; the clamp itself is map-only. The clamped value
    is exact on both engines: it is either the original long or a
    threshold double with an exact binary fraction.

    Output: input columns + ``out_col`` (double) + ``capped``
    (boolean, true when the clamp changed the value).
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1: ({p_lo}, {p_hi})")
    vl = value.cast("long")
    with_v = df.withColumn("__v", vl)
    ths = with_v.groupBy(*group_cols).agg(
        F.expr(f"percentile(__v, {p_lo!r})").alias("__lo"),
        F.expr(f"percentile(__v, {p_hi!r})").alias("__hi"),
    )
    clamped = F.greatest(F.col("__lo"), F.least(F.col("__v").cast("double"), F.col("__hi")))
    return (
        with_v.join(F.broadcast(ths), group_cols)
        .withColumn(out_col, clamped)
        .withColumn("capped", F.col(out_col) != F.col("__v").cast("double"))
        .drop("__v", "__lo", "__hi")
    )


def survival_curve(
    df: DataFrame,
    metric: Column,
    thresholds: list[float],
    weight: Column | None = None,
) -> DataFrame:
    """Filter-threshold survival curve — the quality-vs-quantity
    trade-off table behind every curation decision ("minimum length
    40 keeps 62% of docs and 89% of tokens"): for each candidate
    threshold, how many rows and how much weight survive
    ``metric >= threshold``.

    Plan shape matters here: the naive form cross-joins the corpus
    with the threshold list (k× the data through one aggregate).
    Instead each row is binned ONCE to the highest threshold it passes
    (map-only), one aggregation reduces the corpus to <= k+1 bucket
    rows, and the suffix totals are taken on that k-row table — the
    only non-equi join in the plan touches the k-row threshold spine,
    never the corpus. Cost is one corpus scan + one aggregation
    regardless of k.

    Output: ``(threshold, n_rows, weight_sum)`` — one row per
    threshold, zeros (not missing rows) where nothing survives.
    """
    thr = sorted(thresholds)
    arr = F.array(*[F.lit(t) for t in thr])
    per = df.select(
        metric.alias("__m"),
        (weight if weight is not None else F.lit(1)).cast("long").alias("__w"),
    )
    bucket = F.try_element_at(
        F.filter(arr, lambda t: t <= F.col("__m")), F.lit(-1)
    )
    grouped = per.groupBy(bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__w").alias("__ws")
    )
    spine = df.sparkSession.range(1).select(
        F.explode(arr).alias("threshold")
    )
    return (
        spine.join(grouped, F.col("__b") >= F.col("threshold"), "left")
        .groupBy("threshold")
        .agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum("__ws"), F.lit(0)).cast("long").alias("weight_sum"),
        )
    )


def rank_normalize(
    df: DataFrame,
    id_col: str,
    signal_cols: Sequence[str],
    out_col: str = "quality_ppm",
) -> DataFrame:
    """Rank-normalized signal ensemble — how incomparable quality
    signals (a length, a ratio, a classifier margin) combine into ONE
    curation score without calibration: each signal becomes its
    corpus percentile rank in integer ppm (``(rank-1)·1e6 div (n-1)``,
    rank = SQL ``percent_rank`` tie semantics), and the ensemble is
    their integer mean.

    Scale shape — the naive form is k single-partition windows over
    the corpus (``percent_rank() OVER (ORDER BY s)`` moves every row
    to one partition). Instead, per signal: aggregate to the DISTINCT
    value table, prefix-sum the counts with the bucketed two-level
    scan (:func:`scalable_running_sum` — no global window), and join
    the per-value ppm back on the value. Per signal: one aggregation
    + one value-keyed join, both AQE-sized; nothing serial grows with
    the corpus.

    Signals should be INTEGER expressions (scale ratios to ppm first):
    integer values join and tie identically everywhere, floats only
    mostly. Requires n >= 2 rows. Output: (id_col, <signal>_ppm...,
    out_col).
    """
    base = df.select(id_col, *signal_cols)
    n1 = base.agg((F.count(F.lit(1)) - F.lit(1)).alias("__n1"))
    # every ppm table derives from the PRISTINE base — deriving signal
    # i's counts from base-after-(i-1)-joins re-evaluates the earlier
    # joins inside each later aggregation and the plan grows
    # exponentially in the signal count (measured: 712 exchanges for 3
    # signals before this ordering)
    ppms = []
    for s in signal_cols:
        counts = base.groupBy(s).agg(F.count(F.lit(1)).alias("__c"))
        run = scalable_running_sum(counts, s, "__c", out_col="__run")
        ppms.append(
            run.crossJoin(F.broadcast(n1)).select(
                F.col(s).alias(f"__v_{s}"),
                F.expr(f"(__run - __c) * 1000000 div __n1").alias(f"{s}_ppm"),
            )
        )
    for s, ppm in zip(signal_cols, ppms):
        base = base.join(ppm, base[s] == ppm[f"__v_{s}"]).drop(f"__v_{s}")
    k = len(signal_cols)
    total = None
    for s in signal_cols:
        c = F.col(f"{s}_ppm")
        total = c if total is None else (total + c)
    return base.select(
        id_col,
        *[f"{s}_ppm" for s in signal_cols],
        F.expr(f"({' + '.join(f'{s}_ppm' for s in signal_cols)}) div {k}").alias(
            out_col
        ),
    )


def unigram_js_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-slice corpus drift monitor: Jensen–Shannon divergence
    between each group's unigram distribution and the WHOLE corpus —
    the "did this source / this day's crawl shift vocabulary?" check a
    training-data pipeline runs next to ingestion (JSD is symmetric,
    bounded by ln 2, and defined even when supports differ — unlike
    raw KL).

    Words absent from a group contribute a closed-form residual
    (``q·ln 2`` summed over the missing mass), so the computation only
    ever touches (group, word) pairs that EXIST — no group×vocab
    cross-join:
    ``JSD = Σ_seen [p/2·ln(p/m) + q/2·ln(q/m)] + ln2/2·(1 − Σ_seen q)``.

    Scale shape: one token-level shuffle to (group, word) counts, one
    vocab-keyed aggregation + equi-join, and per-group finals; the
    global token total comes from a window over the |groups|-row table
    (bounded by the domain count). Doubles appear only in the final
    per-word terms and are rounded to 5 dp after the sum — the same
    discipline as the bigram-LM scores.

    Output: ``group_col``, ``n_tokens`` (long), ``vocab`` (long),
    ``jsd`` (double, 5 dp; 0 ⇔ identical distribution, ln 2 ≈ 0.693
    ⇔ disjoint).
    """
    from db_cdc_poc_spark.operators.text import whitespace_tokens

    toks = df.select(
        F.col(group_col).alias("__grp"),
        F.explode(whitespace_tokens(text_col)).alias("__word"),
    )
    gw = toks.groupBy("__grp", "__word").agg(F.count(F.lit(1)).alias("c_gw"))
    wtot = gw.groupBy("__word").agg(F.sum("c_gw").alias("c_w"))
    gtot = gw.groupBy("__grp").agg(
        F.sum("c_gw").alias("n_g"), F.count(F.lit(1)).alias("vocab_g")
    )
    gtot = gtot.withColumn(
        "n_tot", F.sum("n_g").over(Window.partitionBy())
    )
    j = gw.join(wtot, "__word").join(F.broadcast(gtot), "__grp")
    p = F.col("c_gw").cast("double") / F.col("n_g").cast("double")
    q = F.col("c_w").cast("double") / F.col("n_tot").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)
    ln2 = F.log(F.lit(2.0))
    return (
        j.groupBy("__grp")
        .agg(
            F.any_value(F.col("n_g")).alias("n_tokens"),
            F.any_value(F.col("vocab_g")).alias("vocab"),
            F.sum(term).alias("__seen"),
            F.sum(q).alias("__qcov"),
        )
        .select(
            F.col("__grp").alias(group_col),
            "n_tokens",
            "vocab",
            F.round(
                F.col("__seen")
                + F.lit(0.5) * ln2 * (F.lit(1.0) - F.col("__qcov")),
                5,
            ).alias("jsd"),
        )
    )
