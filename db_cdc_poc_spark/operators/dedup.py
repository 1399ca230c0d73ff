"""Deduplication operators — exact and fuzzy.

The reference's only dedup is ``dropDuplicates(['trans_id','item_id'])``
over the change stream (reference: notebooks/03_Data_Ingestion.py:219),
which keeps an arbitrary survivor. ``dedup_exact`` here makes the survivor
deterministic. The fuzzy family (MinHash+LSH, SimHash, n-gram Jaccard) is
the training-data-pipeline extension: all set-based DataFrame ops — no
driver loops, no per-row Python — so they scale with the cluster.

Hashing: ``xxhash64`` (JVM, whole-stage codegen) for scale paths; ``md5``
where a cross-engine-deterministic hash is needed for oracle checks (md5
is bit-identical in Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import latest_by_key

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str] = (),
) -> DataFrame:
    """Keep one row per key.

    With ``order_by``: the row with the GREATEST (order_by) survives,
    deterministically (aggregate with map-side partial — see
    operators/cdc.py for why this beats a ranking window at scale).
    Without: Spark's ``dropDuplicates`` (arbitrary survivor, cheapest).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not order_by:
        return df.dropDuplicates(keys)
    return latest_by_key(df, keys, order_by)


# --------------------------------------------------------------------------
# shingling / tokenization helpers (pure Column expressions — JVM side)
# --------------------------------------------------------------------------


def tokens_col(text: str = "text") -> F.Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.col(text), r"\s+"), lambda t: t != F.lit(""))


def word_shingles_col(text: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string> column.

    Built with transform over an index sequence: shingle i =
    tokens[i..i+n-1] joined by space. Stays inside codegen.
    """
    toks = tokens_col(text)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - F.lit(1))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))  # noqa: E731
    return F.when(count > 0, F.array_distinct(F.transform(idx, shingle))).otherwise(
        F.array().cast("array<string>")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (the verifiable baseline)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (a < b) whose word-n-gram Jaccard similarity >= threshold.

    Plan: explode distinct shingles -> self-equi-join on shingle (this IS
    the inverted index; Spark shuffles both sides by shingle hash) ->
    count common shingles per pair -> |A ∪ B| = |A| + |B| - common.

    Scale: the shingle join is the classic candidate generator; extremely
    frequent shingles create skew — AQE skew-join splits those partitions.
    For 100 TB corpora prefer ``minhash_lsh_pairs`` below (candidates per
    band bucket, not per shingle). Output: (id_a, id_b, jaccard).
    """
    sizes = df.select(
        F.col(id_col).alias("id"),
        word_shingles_col(text_col, n).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = sizes.select("id", F.explode("shingles").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sz = sizes.select(F.col("id"), F.col("n_shingles"))
    out = (
        common.join(sz.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "sz_a"), "id_a")
        .join(sz.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB path)
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) MinHash signatures.

    h_i(shingle) = xxhash64(shingle, seed=i); signature[i] = min over the
    doc's shingle set. Computed as num_hashes independent array-min
    expressions over the shingle array — single projection, no explode, no
    shuffle. Empty docs get an empty signature and never match.
    """
    shingles = word_shingles_col(text_col, shingle_n)

    # One-arg lambda per seed via a closure factory. A two-parameter lambda
    # handed to F.transform is interpreted as (element, index) — the array
    # index would silently shadow the seed and every hash family collapses
    # to the same function.
    def _minhash(seed: int) -> F.Column:
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s, F.lit(seed)))
        )

    sig = F.array(*[_minhash(i) for i in range(num_hashes)])
    return (
        df.select(F.col(id_col).alias("id"), shingles.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .select("id", sig.alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    verify_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash banding.

    signature -> ``bands`` bands of r = num_hashes/bands rows; documents
    colliding on any full band are candidates (P[collide] = 1-(1-s^r)^b).
    Candidates are optionally verified with exact shingle Jaccard.

    Scale: candidates come from a groupBy on (band_id, band_hash) — state
    is one bucket per band value, shuffle carries (id, band) pairs only.
    Self-join of the corpus never happens.
    Output: (id_a, id_b, est_jaccard [, jaccard]).
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(*[F.xxhash64(F.slice("sig", i * r + 1, r).cast("string")) for i in range(bands)])
        ).alias("band_id", "band_hash"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(num_hashes)),
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    if not verify_exact:
        return est.filter(F.col("est_jaccard") >= threshold)
    # Exact verification on CANDIDATE pairs only: re-join the candidate ids
    # to the per-doc shingle arrays and compute Jaccard from
    # array_intersect/array sizes. Cost scales with |candidates|, never with
    # the corpus pair space — the whole point of LSH at 100 TB.
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles_col(text_col, shingle_n).alias("shingles"),
    )
    return (
        est.join(sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


def simhash_col(text: str = "text", bits: int = 64) -> F.Column:
    """SimHash fingerprint as a bigint Column, pure JVM expressions.

    Token hashes via xxhash64; per-bit vote = Σ ±1 over tokens; bit set if
    vote > 0. Expressed as aggregate() over the token array — no explode,
    no shuffle; one pass per row.
    """
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # Two-arg merge lambda built by a closure factory: a 3-parameter lambda
    # handed to F.aggregate binds the third parameter to a lambda-variable
    # Column, and F.shiftright needs a Python int for the shift amount.
    def _vote(bit: int) -> F.Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    fp = F.lit(0).cast("long")
    for i in range(min(bits, 63)):
        fp = fp + F.when(_vote(i) > 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    if bits == 64:
        # bit 63 would overflow a signed long as +2^63; add it as the sign bit
        fp = fp + F.when(_vote(63) > 0, F.lit(-(2 ** 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    16-bit blocks; distance <= blocks-1 guarantees at least one equal
    block, so the candidate join is an equi-join on (block_id, block_value)
    — shuffle by block, never a cross join. Verify with bit_count(xor).
    Output: (id_a, id_b, hamming).
    """
    assert max_hamming < blocks, "pigeonhole requires max_hamming < blocks"
    width = 64 // blocks
    fps = df.select(F.col(id_col).alias("id"), simhash_col(text_col).alias("fp"))
    mask = (1 << width) - 1
    blocked = fps.select(
        "id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("fp", i * width).bitwiseAND(F.lit(mask))
                    for i in range(blocks)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    cand = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding near-dup (cosine)
# --------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs of vectors with cosine similarity >= threshold (exact).

    Normalizes once, then an inner self-join with the dot-product residual.
    O(n^2) — the correctness baseline; use similarity.lsh_bucketed_topk's
    hyperplane bucketing for the at-scale candidate generation.
    Output: (id_a, id_b, cosine).
    """
    from db_cdc_poc_spark.operators.similarity import normalized, dot

    v = df.select(F.col(id_col).alias("id"), normalized(vec_col).alias("nv"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", dot(F.col("a.nv"), F.col("b.nv")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
