"""Probabilistic sketches as set-based DataFrame aggregates.

A 100 TB corpus can't afford exact ``count(distinct)`` per dimension
cell (a full shuffle of every distinct key) or an exact membership
set shipped to every executor. The two sketches here are the standard
answers, built from first principles so they stay (a) mergeable —
register tables / bit-position sets combine with ``max`` / ``union``,
the map-side-partial shape Spark aggregates want — and (b) replayable
on the md5 path: every hash, bucket, and register value is derivable
in portable SQL, so the DuckDB oracle recomputes the sketch
value-for-value (see operators/sampling.py for the md5 rationale).

* :func:`hll_registers` / :func:`hll_estimate` — HyperLogLog
  (Flajolet et al., AofA 2007): one 64-bit hash per key; the first
  ``p`` bits pick one of ``m = 2**p`` registers, the register keeps
  the max leading-zero rank of the remainder, and the harmonic mean
  of ``2**-register`` estimates the cardinality with ~1.04/sqrt(m)
  relative error. The register table is ``groupBy(...).agg(max)`` —
  map-side partial combine means the shuffle carries at most
  ``m`` rows PER GROUP per partition, independent of data size.
  Spark's own ``approx_count_distinct`` is the same algorithm fused
  into one aggregate; this form exposes the registers so sketches can
  be stored, merged across days, and oracle-checked.

* :func:`bloom_hits` — Bloom-filter membership: ``k`` hash positions
  in an ``m``-bit filter per key; a candidate "maybe" matches when
  ALL ``k`` of its positions are set by some member. The filter is
  represented as the distinct set of set-bit positions (at most ``m``
  rows, i.e. KB-scale for m=2**16) and joined broadcast — candidates
  never shuffle to the members. False positives are possible (that's
  the contract); false negatives are not. Spark's runtime bloom
  pruning (spark.sql.optimizer.runtime.bloomFilter.enabled, proven in
  test_scale_features) is the planner-injected cousin; this operator
  is the user-facing one for decontamination-style "seen before?"
  checks against a reference corpus.

Exact-integer discipline: estimates avoid ``pow``/``ln`` (not
correctly-rounded, engine-dependent). ``2**-register`` sums are
scaled to integers (``1::long << (SCALE - r)``) so the register sum
is an exact, order-free BIGINT; the only floating point is one final
alpha*m^2/S expression of IEEE basic ops, bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.dedup import token_hash64

#: Integer scaling exponent for the harmonic sum: register value r
#: contributes 2**(HLL_SCALE - r). Ranks are capped at HLL_SCALE so the
#: contribution stays a positive BIGINT; with m=2**14 registers the sum
#: is < 2**(HLL_SCALE - 1 + 14) = 2**63 — no overflow.
HLL_SCALE = 50


def _hll_hash(key: Column, hash_fn: str) -> Column:
    # Non-negative 63-bit hash: bucket and rank both read from it.
    return token_hash64(key, hash_fn).bitwiseAND(F.lit((1 << 63) - 1))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """HyperLogLog register table: (group_cols..., bucket, r).

    bucket = top ``p`` bits of a 63-bit non-negative hash; r = rank
    (1-based leading-zero count + 1) of the remaining ``63 - p`` bits,
    capped at :data:`HLL_SCALE`. ``groupBy(...).agg(max)`` is the whole
    sketch build — partial aggregation bounds shuffle rows at
    ``m = 2**p`` per group per map task, so the build cost is one scan
    regardless of corpus size, and two register tables for different
    days merge with another ``max`` (HLL's union property).
    """
    groups = list(group_cols or [])
    h = _hll_hash(F.col(key_col).cast("string"), hash_fn)
    rem_bits = 63 - p
    # Rank of the low rem_bits: leading zeros + 1 == rem_bits + 1 - bit_length.
    # bit_length via length(bin(w)) — bin() prints no leading zeros and is
    # available (and identical) in Spark and DuckDB; w == 0 caps the rank.
    w = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rank = F.when(w == 0, F.lit(HLL_SCALE)).otherwise(
        F.least(F.lit(rem_bits + 1) - F.length(F.bin(w)), F.lit(HLL_SCALE))
    )
    return (
        df.select(
            *groups,
            F.shiftrightunsigned(h, rem_bits).alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, p: int = 10
) -> DataFrame:
    """Cardinality estimate from a register table.

    Output per group: (m, n_zero, s_scaled, est_distinct). The
    harmonic sum is the exact integer ``sum(1::long << (HLL_SCALE - r))``
    plus ``n_zero << HLL_SCALE`` for never-touched registers — order-free,
    overflow-safe (see :data:`HLL_SCALE`). The only float math is the
    final ``alpha_m * m^2 * 2^HLL_SCALE / s`` — IEEE +,*,/ on exact
    integers, bit-identical across engines. The small-range linear-
    counting correction is deliberately NOT applied here (it needs
    ``ln``, which is not correctly rounded); callers who want it can
    compute it from the (m, n_zero) columns this emits.
    """
    groups = list(group_cols or [])
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard HLL bias constant, m >= 128
    agg = registers.groupBy(*groups).agg(
        F.count("*").alias("n_used"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_SCALE} - r)")).alias("s_used"),
    )
    n_zero = F.lit(m) - F.col("n_used")
    # coalesce: an EMPTY register table (global agg over zero rows)
    # gives s_used = NULL; treating it as 0 makes every register count
    # as untouched and the estimate degrade to the raw all-zero value
    # alpha*m (no linear-counting correction — documented above)
    # instead of NULL-poisoning downstream arithmetic
    s = F.coalesce(F.col("s_used"), F.lit(0)) + n_zero.cast("long") * F.lit(
        1 << HLL_SCALE
    ).cast("long")
    return agg.select(
        *groups,
        F.lit(m).alias("m"),
        n_zero.cast("long").alias("n_zero"),
        s.alias("s_scaled"),
        (
            F.lit(alpha)
            * F.lit(float(m))
            * F.lit(float(m))
            * F.lit(float(1 << HLL_SCALE))
            / s.cast("double")
        ).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``hll_estimate(hll_registers(...))`` in one call."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p=p, hash_fn=hash_fn),
        group_cols,
        p=p,
    )


def bloom_positions(key: Column, k: int = 4, m_bits: int = 1 << 16) -> Column:
    """Array of ``k`` bit positions in [0, m_bits) for a key.

    Position i is the top 32 bits of md5(key + '#' + i) mod m_bits —
    independent draws via the salt, portable via md5 (the filter must
    be checkable by the oracle and by whatever system persisted it).
    """
    return F.array(
        *[
            F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 8), 16, 10)
            .cast("long")
            .__mod__(F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_hits(
    candidates: DataFrame,
    members: DataFrame,
    key_col: str,
    id_col: str | None = None,
    k: int = 4,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Bloom membership check of ``candidates[key_col]`` against the
    filter built from ``members[key_col]``.

    Output: (<id_col or key_col>, hits, maybe_member) — ``maybe_member``
    is true iff all ``k`` positions are set (the Bloom "maybe"; exact
    members always qualify, non-members qualify with probability
    ~(1-e^{-kn/m})^k). ``id_col`` lets callers keep a row identity
    distinct from the hashed key (e.g. doc_id for a text fingerprint).

    Plan shape: the filter is ``members`` → explode k positions →
    distinct (at most ``m_bits`` rows ≈ KB regardless of member count)
    → broadcast to a left join against the candidates' exploded
    positions; hits are counted back per id. The big side shuffles
    once on the id (k rows each); the member corpus is touched once
    to build the filter and never joined row-to-row.
    """
    key = F.col(key_col)
    out = id_col or key_col
    bits = (
        members.select(F.explode(bloom_positions(key, k, m_bits)).alias("pos"))
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    probes = candidates.select(
        (F.col(id_col) if id_col else key).alias("id_"),
        F.explode(bloom_positions(key, k, m_bits)).alias("pos"),
    )
    return (
        probes.join(F.broadcast(bits), "pos", "left")
        .groupBy("id_")
        .agg(F.sum(F.coalesce(F.col("set_"), F.lit(0))).alias("hits"))
        .select(
            F.col("id_").alias(out),
            F.col("hits").cast("int").alias("hits"),
            (F.col("hits") == k).alias("maybe_member"),
        )
    )


def cm_positions(key: Column, depth: int = 4, width: int = 4096) -> Column:
    """Array of ``depth`` (row, position) structs for a count-min
    sketch: row i hashes the key with salt ``#i`` (md5 — portable and
    oracle-replayable, like :func:`bloom_positions`)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.conv(
                    F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 8),
                    16,
                    10,
                )
                .cast("long")
                .__mod__(F.lit(width))
                .alias("pos"),
            )
            for i in range(depth)
        ]
    )


def cm_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Count-min sketch counters (Cormode & Muthukrishnan 2005):
    ``depth x width`` cells, cell (r, pos) = number of input rows whose
    salted hash lands there.

    Output: (r, pos, c) — at most ``depth*width`` rows (16K cells at
    the defaults) REGARDLESS of input size: the explode emits depth
    rows per input row, and the groupBy's map-side partial collapses
    them to the cell space before the shuffle. Two sketches merge by
    summing cells (the CM union property) — same shape as
    :func:`hll_registers` merging by max.
    """
    key = F.col(key_col)
    return (
        df.select(F.explode(cm_positions(key, depth, width)).alias("e"))
        .groupBy(F.col("e.r").alias("r"), F.col("e.pos").alias("pos"))
        .agg(F.count("*").alias("c"))
    )


def cm_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows of the key's
    cell — an overestimate of the true count (never under), within
    ``e*N/width`` with probability ``1 - e^-depth``.

    Plan: the counter table is cell-space-sized, so it broadcasts; the
    keys explode to ``depth`` probe rows and aggregate back by key —
    one shuffle on the key, none on the corpus the sketch summarized.
    Output: (<key_col>, est).
    """
    key = F.col(key_col)
    probes = keys.select(
        key.alias("k"), F.explode(cm_positions(key, depth, width)).alias("e")
    ).select("k", F.col("e.r").alias("r"), F.col("e.pos").alias("pos"))
    return (
        probes.join(F.broadcast(counters), ["r", "pos"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
        .select(F.col("k").alias(key_col), F.col("est").cast("long").alias("est"))
    )


def table_checksums(
    df: DataFrame,
    key_col: str,
    digest_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Anti-entropy bucket checksums: (bucket, n, checksum) — ``n_buckets``
    (count, xor-of-row-digest) cells that summarize the table.

    Two copies of a keyed table (a CDC source and its target, two
    replicas) compare by exchanging just this summary; buckets whose
    cells differ are re-synced row-by-row — the Merkle-style repair
    loop, one level deep. xor is order-free and self-inverse, so the
    checksum is partitioning-independent and a row's insert+delete
    cancels exactly. Both the digest and the bucket come from md5 so
    the summary is portable across engines (DuckDB, or whatever system
    holds the other copy).

    Callers pass ``digest_cols`` already canonicalized to exact-integer
    or string form (floats format differently across engines; integer
    strings don't).
    """
    cols = digest_cols if digest_cols is not None else df.columns
    mask = (1 << 63) - 1
    digest = token_hash64(F.concat_ws("|", *cols), "md5").bitwiseAND(F.lit(mask))
    bucket = token_hash64(F.col(key_col).cast("string"), "md5").bitwiseAND(
        F.lit(mask)
    ) % F.lit(n_buckets)
    return (
        df.select(bucket.alias("bucket"), digest.alias("digest"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.bit_xor("digest").alias("checksum"))
    )


def histogram_quantiles(
    df: DataFrame,
    value: Column,
    qs: list[float] | None = None,
    bin_width: int = 100_000,
) -> DataFrame:
    """Mergeable equi-width-histogram quantile estimates.

    Exact percentiles at 100 TB need a full sort (or Spark's GK-sketch
    ``percentile_approx``, whose internal state no oracle can replay);
    the mergeable alternative is an equi-width histogram: per-bin
    counts combine with ``+`` (map-side partial, storable, unionable
    across days, same shape as the HLL register table) and the
    q-quantile is read off as the lower edge of the first bin whose
    cumulative count reaches ``ceil(q·n)``. Estimation error is
    bounded by ``bin_width`` — pick it from the value scale.

    ``value`` must be an integer-valued expression (cents). Output:
    one row per requested quantile, ``(quantile, est_lo)`` where
    ``est_lo = bin * bin_width`` is the bin's inclusive lower edge.

    The cumulative window runs over the BIN TABLE (|range|/bin_width
    rows — sketch-sized), never the input.
    """
    qs = qs or [0.5, 0.9, 0.99]
    vl = value.cast("long")
    bins = df.groupBy(
        F.floor(vl / F.lit(bin_width)).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    aggs = []
    for i, q in enumerate(qs):
        rank = F.ceil(F.lit(float(q)) * F.col("n").cast("double"))
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("bin"))).alias(f"__b{i}")
        )
    one = cum.agg(*aggs)
    stack_args: list[Column] = []
    for i, q in enumerate(qs):
        stack_args += [
            F.lit(float(q)),
            (F.col(f"__b{i}") * F.lit(bin_width)).cast("long"),
        ]
    return one.select(
        F.stack(F.lit(len(qs)), *stack_args).alias("quantile", "est_lo")
    )


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    p: int = 10,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """HLL set algebra: estimated |A|, |B|, |A ∪ B| and (by
    inclusion–exclusion) |A ∩ B| from two register tables — overlap
    between key sets that are each too large to materialize (shared
    users between products, common documents between crawls). The
    union register table is just ``max`` over the two sketches (HLL's
    union property), so the whole comparison touches ``3·2^p`` register
    rows, never the raw keys; sketches built on different days / by
    different jobs compose the same way.

    Output: one row ``(est_a, est_b, est_union, est_intersection)``.
    Intersection error compounds (it is a difference of estimates) —
    treat small intersections of large sets as noise, the standard HLL
    caveat.
    """
    ra = hll_registers(df_a, key_col, p=p, hash_fn=hash_fn)
    rb = hll_registers(df_b, key_col, p=p, hash_fn=hash_fn)
    ru = ra.unionByName(rb).groupBy("bucket").agg(F.max("r").alias("r"))
    ea = hll_estimate(ra, p=p).select(F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(rb, p=p).select(F.col("est_distinct").alias("est_b"))
    eu = hll_estimate(ru, p=p).select(F.col("est_distinct").alias("est_union"))
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .withColumn(
            "est_intersection",
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        )
    )
