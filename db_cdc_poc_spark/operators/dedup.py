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

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_cdc_poc_spark.checkpointing import materialize
from db_cdc_poc_spark.partitioning import spread_scan
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


def _ident(name: str) -> str:
    """Backtick-quote a column name for embedding in an F.expr SQL
    string (the tokenize/shingle helpers below are built as ONE parsed
    expression each: the lambda-builder API costs ~20 ms of py4j
    round-trips per higher-order function, and these helpers sit in
    every text query's per-trigger construction path — guide §1)."""
    return "`" + name.replace("`", "``") + "`"


def _tokens_sql(text: str) -> str:
    return rf"filter(split({_ident(text)}, '\\s+'), t -> t != '')"


def tokens_col(text: str = "text") -> F.Column:
    """Whitespace tokens, empties removed."""
    return F.expr(_tokens_sql(text))


def word_ngrams_col(text: str = "text", n: int = 3) -> F.Column:
    """ALL word n-grams (positional, duplicates kept) as array<string>.

    The token array is LET-BOUND by wrapping it in a one-element array
    and ``transform``-ing over it: the lambda variable ``t`` holds the
    split evaluated exactly once per row, so each gram is one
    ``slice`` + one ``array_join`` — O(n) bytes per gram. (The naive
    ``transform(sequence(...), i -> slice(tokens_col(...), i, n))``
    re-evaluates the split per index because lambda bodies can't
    reference outer non-column expressions; the previous zip_with-chain
    formulation evaluated the split once but built every gram through
    ``n-1`` successive concats — O(n^2) bytes per gram, measured 3.6x
    slower than this form at sf1.0 for n=8.)
    """

    # single parse (see _ident); size < n would make the sequence bound
    # < 1 and sequence() helpfully counts DOWN — guard to empty instead
    return F.expr(
        f"""element_at(transform(array({_tokens_sql(text)}),
        t -> CASE WHEN size(t) >= {n}
             THEN transform(sequence(1, size(t) - {n - 1}),
                            i -> array_join(slice(t, i, {n}), ' '))
             ELSE cast(array() as array<string>) END), 1)"""
    )


def word_shingles_col(text: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string> column."""
    return F.array_distinct(word_ngrams_col(text, n))


def word_ngram_hashes_col(text: str = "text", n: int = 3) -> F.Column:
    """ALL word n-grams as 64-bit hashes (array<bigint>, positional,
    duplicates kept) — WITHOUT materializing gram strings.

    Each token is hashed ONCE (``xxhash64``), then each gram hash is
    ``xxhash64`` over the n-long slice of token hashes: per gram that
    is one hash of 8n fixed-width bytes instead of building an ~O(10n)
    byte string (slice + array_join allocation) and hashing it. For
    n=8 at sf1.0 this measured ~20% faster over the whole
    tokenize->gram->hash pipeline, and every downstream exchange/join
    carries 8-byte keys instead of ~90-byte strings.

    Same value contract as the span-hash family: counts and joins on
    these hashes are exact up to a 64-bit collision (~1e-7 at 10M
    grams); the hash VALUES are engine-internal and never surface in
    results, so oracle comparisons (which replay on gram strings) are
    unaffected. Let-binding mirrors ``word_ngrams_col``: the token
    array and the token-hash array are each evaluated once per row via
    nested one-element-array ``transform`` wrappers.
    """

    # single parse (see _ident); size < n would make the sequence bound
    # < 1 and sequence() counts DOWN — guard to empty instead
    return F.expr(
        f"""element_at(transform(array({_tokens_sql(text)}),
        t -> element_at(transform(array(transform(t, tok -> xxhash64(tok))),
             hs -> CASE WHEN size(hs) >= {n}
                   THEN transform(sequence(1, size(hs) - {n - 1}),
                                  i -> xxhash64(slice(hs, i, {n})))
                   ELSE cast(array() as array<bigint>) END), 1)), 1)"""
    )


def hashed_shingle_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows with 64-bit HASHED shingles — the drop-in
    fast form of ``shingle_rows`` for every consumer that joins,
    aggregates, or orders on shingles without exposing their values
    (the pair-join family, MinHash, decontamination).

    The input is SPREAD to cluster width first (``partitioning.
    spread_scan``): the explode multiplies 73 MB of sf10 documents
    into gigabytes of rows inside the scan's own stage, and that scan
    plans <= 3 partitions (row-group bound) — without the spread the
    whole corpus tokenization runs on 3 of 32 cores."""
    return spread_scan(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngram_hashes_col(text_col, n))).alias(
            "shingle"
        ),
    )


def shingle_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows — one per DISTINCT shingle per document.

    The explode's Generate operator evaluates the shingle array once
    per input row; every downstream operator then works on materialized
    string rows. This is the shared candidate-generation base for the
    Jaccard and MinHash paths.
    """
    return spread_scan(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(text_col, n)).alias("shingle"),
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (the verifiable baseline)
# --------------------------------------------------------------------------


def _pair_shingle_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """(id_a, id_b, common, sz_a, sz_b) for every document pair (a < b)
    sharing at least one word-n-gram shingle — the shared inverted-index
    core of the Jaccard and containment measures.

    Plan: explode distinct shingles -> self-equi-join on shingle (this IS
    the inverted index; Spark shuffles both sides by shingle hash) ->
    count common shingles per pair. Set sizes come from a count
    aggregate over the SAME exploded rows, not a second evaluation of
    the shingle arrays.

    Scale: the shingle join is the classic candidate generator; a
    shingle appearing in d documents contributes d^2 joined rows, so
    corpus-frequent shingles (stop-word n-grams) blow the join up
    quadratically. AQE skew-join splits the partitions, but the real
    fix is ``max_doc_freq``: drop shingles whose document frequency
    exceeds the cap BEFORE the join — a shingle shared by thousands of
    documents carries almost no similarity signal, and the candidate
    count drops from d^2 to 0 for those. NOTE the cap makes the
    measures approximate (set sizes still count capped shingles;
    common counts don't), so the oracle-checked defaults keep it off.
    For containment at corpus scale, ``winnowed_containment_pairs``
    shrinks the index ~(w+1)/2 x before this same join.
    """
    return _pair_stats_from_rows(
        hashed_shingle_rows(df, id_col, text_col, n), max_doc_freq
    )


def _pair_stats_from_rows(
    sh: DataFrame,
    max_doc_freq: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The row-based core of ``_pair_shingle_stats``: takes any
    (id, shingle) feature rows — word shingles, winnowed fingerprints —
    and produces the per-pair overlap stats.

    The feature rows are referenced three times (sizes + both join
    sides), so they are materialized once (lazy local checkpoint by
    default; reliable parquet under ``checkpoint_dir`` when set — see
    ``checkpointing.materialize``) instead of re-running the upstream
    tokenize/shingle pipeline per reference — the same build-the-index
    choice as the winnowed path.
    """
    # corpus-sized waist: see prefix-rows for the measured 100x guidance
    sh = materialize(sh, checkpoint_dir, eager=False, label="pair-rows")
    # counts is consumed twice (sz_a join, sz_b join) and Spark plans
    # the aggregate + exchange + broadcast build once PER consumer
    # (verified: no ReusedExchange in the executed plan — the subtrees
    # canonicalize differently). One row per doc, so the waist is tiny.
    counts = materialize(
        sh.groupBy("id").agg(F.count("*").alias("n_shingles")),
        checkpoint_dir,
        eager=False,
        label="pair-counts",
    )
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return common.join(
        counts.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("sz_a")),
        "id_a",
    ).join(
        counts.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("sz_b")),
        "id_b",
    )


# Below this many documents the naive uncapped inverted-index join is
# chosen by mode='auto': both paths are EXACT (property-tested pair-for-
# pair equal — tests/test_prefix_filter_property.py), so the choice is
# pure cost-based dispatch, the same family of decision as Spark's
# autoBroadcastJoinThreshold. Rationale: the naive join's failure mode
# is a corpus-hot shingle in d documents paying d^2 candidate rows, and
# d is bounded by the corpus size — at <=10^4 docs the absolute worst
# case is 10^8 joined rows (seconds, distributed), while the typical
# case is far smaller; the prefix-filtered join meanwhile pays ~3 extra
# full exchanges of the shingle table (document-frequency window,
# per-doc rank, candidate verify) whose fixed cost dominates small
# corpora — measured 2.5x slower at 5k docs, 7x FASTER at 50k docs.
_PREFIX_AUTO_MIN_DOCS = 10_000


def _exact_pair_stats(
    sh: DataFrame,
    threshold: float,
    measure: str,
    docs: DataFrame,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    max_pack_shingles: int | None = 2_000_000,
) -> DataFrame:
    """Dispatch the EXACT pair-stats computation by corpus size.

    mode='naive' forces the uncapped inverted-index self-join
    (``_pair_stats_from_rows``), 'prefix' forces the prefix-filtered
    set-similarity join (``_prefix_filtered_pair_stats``), 'auto'
    counts the corpus (one cheap job — a count-star over the docs
    relation, metadata-only for plain parquet scans) and picks naive
    below ``_PREFIX_AUTO_MIN_DOCS``. Results are identical either way;
    only the physical plan differs.
    """
    if mode == "auto":
        from db_cdc_poc_spark.partitioning import metadata_row_count

        # parquet-footer count when the frame is a row-preserving chain
        # over one local parquet relation (zero jobs); df.count() only
        # as the fallback — the count job was a fixed per-construction
        # driver cost on every auto-dispatched call
        n_docs = metadata_row_count(docs)
        if n_docs is None:
            n_docs = docs.count()
        mode = "naive" if n_docs <= _PREFIX_AUTO_MIN_DOCS else "prefix"
    if mode == "naive":
        return _pair_stats_from_rows(sh, checkpoint_dir=checkpoint_dir)
    if mode == "prefix":
        return _prefix_filtered_pair_stats(
            sh,
            threshold,
            measure,
            checkpoint_dir=checkpoint_dir,
            max_pack_shingles=max_pack_shingles,
        )
    raise ValueError(f"unknown mode: {mode!r} (want 'auto'|'naive'|'prefix')")


def _prefix_filtered_pair_stats(
    sh: DataFrame,
    threshold: float,
    measure: str,
    checkpoint_dir: str | None = None,
    max_pack_shingles: int | None = 2_000_000,
) -> DataFrame:
    """(id_a, id_b, common, sz_a, sz_b) for every pair that can reach
    ``measure >= threshold`` — the EXACT set-similarity join with
    prefix filtering (Bayardo et al. WWW'07; Vernica et al. SIGMOD'10
    give the shuffle-based form).

    The naive inverted-index self-join blows up quadratically on
    corpus-frequent shingles: a shingle in d docs contributes d^2
    candidate rows, and d grows linearly with corpus size — measured
    75x runtime for 10x docs at sf1.0. Prefix filtering restores the
    exact result at near-linear cost: order every doc's shingle set by
    a GLOBAL frequency-ascending order and index only its first
    ``n - ceil(t*n) + 1`` shingles. If two sets overlap enough to pass
    the threshold, their SMALLEST common shingle (in that order) must
    sit inside both prefixes (else the >= ceil(t*n) common elements
    would have to fit in a ceil(t*n)-1 suffix), so joining
    prefix-to-prefix loses no true pair — and hot shingles, which sort
    LAST, almost never enter a prefix, so their d^2 explosion is gone.
    Candidates are then verified with an exact overlap count over the
    full shingle rows, restricted to candidate pairs (index-join sized,
    linear in candidates).

    measure='jaccard': needed overlap t*|A union B| >= t*max(|A|,|B|)
    justifies prefix-vs-prefix plus the size-ratio filter
    t*sz_a <= sz_b <= sz_a/t.
    measure='containment' (|A^B| / min(|A|,|B|)): only the SMALLER
    set's prefix is guaranteed to hold the smallest common element, so
    the probe joins every doc's prefix against the positioned index
    and keeps pairs once (normalized a < b). No size-ratio filter
    exists, but a positional bound does: the index-side match row must
    satisfy 1 + n_b - pos_b >= ceil(t * min(n_a, n_b)) — a per-probe
    index prefix that kills the quadratic posting-list growth of
    corpus-common shingles (see the inline comment at the join).

    Output contract: superset of all pairs reaching the threshold,
    with exact stats — callers apply the same final filter they would
    on the unfiltered core, so results are bit-identical.

    Giant-document bound (``max_pack_shingles``): the verify step packs
    each doc's distinct fingerprints into ONE array row (8 bytes each),
    so a pathological 500 MB document (~10^8 distinct shingles) would
    become an ~800 MB single row in a shuffle. Docs whose
    distinct-shingle count exceeds the cap (default 2e6 = ~16 MB/row)
    are EXCLUDED from packing; candidate pairs touching one are
    verified by the row-form overlap count instead — the same exact
    stats at bounded row size, paying the row-join waist only for the
    (rare) giant-touching pairs. Nothing is truncated or dropped;
    ``None`` disables the routing (pure array verify).
    """
    from pyspark.sql import Window as W

    if measure not in ("jaccard", "containment"):
        raise ValueError(f"unknown measure: {measure}")
    t = float(threshold)
    eps = 1e-9  # guards float rounding of t*n at the exact boundary:
    # only ever ADMITS borderline candidates, never drops a true pair
    # The shingle index scales with the corpus. At 100x single-box
    # scale its localCheckpoint blocks compete with execution memory
    # (q66's measured superlinear step); the measured fix is a DURABLE
    # waist — pass checkpoint_dir or set SPARK_GRAFT_CHECKPOINT_DIR
    # (columnar-compressed parquet, 11.0x -> 4.8x step at sf10;
    # SCALING.md "Waist storage at 100x"). Memory stays the default:
    # it measured fastest at <= sf3 and the knobs are zero-code.
    sh = materialize(sh, checkpoint_dir, eager=False, label="prefix-rows")
    # NOT waisted (r14 negative, recorded): checkpointing counts/arrs
    # here deduped their aggregates (no ReusedExchange — subtrees
    # canonicalize differently) but SERIALIZED work the cluster ran in
    # parallel: interleaved sf1 A/B measured q20 consistently ~1.5 s
    # SLOWER with the waists (9.4/12.1 s vs 7.8/10.7 s matched rounds).
    # The prefix path is the at-scale path; recomputing a thin
    # aggregate on idle cores beats pinning + re-reading blocks. The
    # NAIVE path keeps its counts waist — it is small-corpus by
    # construction, where the duplicate exchanges dominate instead.
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    # document frequency via a window over the shingle partition (one
    # exchange of the big table, no separate dfreq materialize+join);
    # per-doc size n arrives by broadcast join with the doc-count agg.
    with_df = sh.withColumn("df", F.count("*").over(W.partitionBy("shingle")))
    positioned = (
        with_df.join(F.broadcast(counts), "id")
        .withColumn(
            "pos",
            F.row_number().over(W.partitionBy("id").orderBy("df", "shingle")),
        )
        .select("id", "shingle", "pos", "n")
    )
    _own_prefix = (
        F.col("pos")
        <= F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(eps)) + 1
    )
    ranked = positioned.filter(_own_prefix)
    if measure == "jaccard":
        a, b = ranked.alias("a"), ranked.alias("b")
        # positional filter (PPJoin, Xiao et al.): matched at prefix
        # positions (pos_a, pos_b), the overlap can't exceed
        # 1 + min(n_a - pos_a, n_b - pos_b); J >= t needs overlap
        # >= t/(1+t) * (n_a + n_b). The smallest-common-element match
        # row always satisfies this bound, so per-row pruning keeps
        # every true pair (dedup by distinct below).
        alpha = F.ceil(
            F.lit(t / (1.0 + t)) * (F.col("a.n") + F.col("b.n")) - F.lit(eps)
        )
        ubound = F.lit(1) + F.least(
            F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
        )
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id"))
                # size-ratio prune: J >= t forces t*n_a <= n_b <= n_a/t
                & (F.col("b.n") >= F.lit(t) * F.col("a.n") - F.lit(eps))
                & (F.col("a.n") >= F.lit(t) * F.col("b.n") - F.lit(eps))
                & (ubound >= alpha),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
            )
            .distinct()
        )
    else:
        # Probe each doc's prefix against a POSITIONED index: only the
        # smaller side's prefix is guaranteed to hold the smallest
        # common element, so the probe prefix alone can't bound the
        # index side by the index doc's OWN size. But the smallest
        # common element g of a true pair needs overlap
        # c >= ceil(t * min(n_a, n_b)) elements ordered at-or-after it
        # on BOTH sides, so 1 + n_b - pos_b >= c holds for g on the
        # index side too — a positional bound that depends on the
        # PROBE's size, applied per matched row (the PPJoin positional
        # filter carried to the containment/index side; equivalently a
        # probe-length-bucketed index prefix evaluated exactly instead
        # of materializing per-bucket index copies). Without it every
        # corpus-common shingle probes the FULL posting list and the
        # candidate-join output grows ~quadratically with the corpus
        # (measured 38.5M -> 259M joined rows at sf10 -> sf30, q66);
        # with it the index side is cut to the rows that could still
        # reach the threshold. EXACT: for any true pair the row where
        # both sides match on g passes both bounds, so no pair is lost
        # (property suite: test_prefix_filter_property.py).
        need = F.ceil(
            F.lit(t) * F.least(F.col("a.n"), F.col("b.n")) - F.lit(eps)
        )
        cand = (
            ranked.alias("a")
            .join(
                positioned.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") != F.col("b.id"))
                & (F.lit(1) + F.col("a.n") - F.col("a.pos") >= need)
                & (F.lit(1) + F.col("b.n") - F.col("b.pos") >= need),
            )
            .select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
            )
            .distinct()
        )
    # Verify by per-pair set intersection over PACKED per-doc arrays,
    # not by re-exploding the shingle rows: the row form (cand x all of
    # doc_a's shingles -> shuffle by (id_b, shingle) -> join -> groupBy)
    # moves |cand| x |doc| ROWS through two exchanges and a hash
    # aggregate — the waist that grew 9.9x at sf10 (q66, 178.9 s).
    # Packing each doc's (distinct) shingles into one sorted array row
    # moves the same bytes as |cand| compact rows, drops the per-pair
    # groupBy entirely, and counts the overlap in-row with
    # array_intersect (set semantics — shingle rows are distinct per
    # doc, so the count is the exact common). Sizes come free from the
    # arrays, which also removes the final join back to `cand`.
    cand = cand.select("id_a", "id_b")
    if max_pack_shingles is not None:
        # route giant-touching pairs off the packed path (docstring
        # "Giant-document bound"); giants are rare by construction, so
        # the marker set broadcasts (one long column)
        big = counts.filter(F.col("n") > int(max_pack_shingles)).select("id")
        marked = cand.join(
            F.broadcast(
                big.select(F.col("id").alias("id_a"), F.lit(True).alias("__ga"))
            ),
            "id_a",
            "left",
        ).join(
            F.broadcast(
                big.select(F.col("id").alias("id_b"), F.lit(True).alias("__gb"))
            ),
            "id_b",
            "left",
        )
        pack_cand = marked.filter(
            F.col("__ga").isNull() & F.col("__gb").isNull()
        ).select("id_a", "id_b")
        giant_cand = marked.filter(
            F.col("__ga").isNotNull() | F.col("__gb").isNotNull()
        ).select("id_a", "id_b")
        pack_src = sh.join(F.broadcast(big), "id", "left_anti")
    else:
        pack_cand, giant_cand, pack_src = cand, None, sh

    # consumed twice (id_a join, id_b join) but deliberately NOT
    # waisted — see the prefix-counts note above (sf1 A/B negative)
    arrs = pack_src.groupBy("id").agg(
        F.array_sort(F.collect_list("shingle")).alias("__arr")
    )
    packed = (
        pack_cand.join(
            arrs.select(F.col("id").alias("id_a"), F.col("__arr").alias("__arr_a")),
            "id_a",
        )
        .join(
            arrs.select(F.col("id").alias("id_b"), F.col("__arr").alias("__arr_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__arr_a", "__arr_b")).alias("common"),
            F.size("__arr_a").alias("sz_a"),
            F.size("__arr_b").alias("sz_b"),
        )
    )
    if giant_cand is None:
        return packed
    # row-form exact overlap for the giant-touching pairs: candidate
    # pairs always share >= 1 shingle, so the groupBy drops nothing
    giant_common = (
        giant_cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    giant_stats = giant_common.join(
        counts.select(F.col("id").alias("id_a"), F.col("n").alias("sz_a")), "id_a"
    ).join(
        counts.select(F.col("id").alias("id_b"), F.col("n").alias("sz_b")), "id_b"
    ).select("id_a", "id_b", "common", "sz_a", "sz_b")
    return packed.unionByName(giant_stats)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    max_pack_shingles: int | None = 2_000_000,
) -> DataFrame:
    """All pairs (a < b) whose word-n-gram Jaccard similarity >= threshold.

    |A ∩ B| / |A ∪ B| over distinct shingle sets, with |A ∪ B| =
    |A| + |B| - common. Without ``max_doc_freq`` the result is EXACT;
    ``mode`` picks the physical strategy (``_exact_pair_stats``):
    the prefix-filtered set-similarity join (near-linear in corpus
    size) above ``_PREFIX_AUTO_MIN_DOCS`` documents, the naive
    inverted-index join below it — identical outputs, cost-based
    dispatch. With a ``max_doc_freq`` cap, the approximate capped
    inverted-index path (``_pair_shingle_stats``). For 100 TB corpora
    ``minhash_lsh_pairs`` below remains the probabilistic alternative
    (candidates per band bucket). Output: (id_a, id_b, jaccard).
    """
    stats = (
        _exact_pair_stats(
            hashed_shingle_rows(df, id_col, text_col, n),
            threshold,
            "jaccard",
            df,
            mode,
            checkpoint_dir,
            max_pack_shingles,
        )
        if max_doc_freq is None
        else _pair_shingle_stats(df, id_col, text_col, n, max_doc_freq)
    )
    return (
        stats
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    max_pack_shingles: int | None = 2_000_000,
) -> DataFrame:
    """All pairs (a < b) with shingle containment >= threshold:
    |A ∩ B| / min(|A|, |B|) — Broder's containment measure.

    Catches the asymmetric near-dup Jaccard misses: a short document
    pasted verbatim inside a much longer one scores Jaccard ≈
    |small| / |large| (tiny) but containment ≈ 1. The standard use is
    quote/boilerplate/copy detection before training, alongside — not
    instead of — symmetric Jaccard dedup.

    Same core family as ``ngram_jaccard_pairs``: uncapped is EXACT
    with size-dispatched strategy (prefix-filtered join at corpus
    scale — smaller-side prefix probed against a positionally-bounded
    index, the containment-safe variant — naive inverted index on
    small corpora); capped runs the approximate inverted-index path.
    Output: (id_a, id_b, containment).
    """
    stats = (
        _exact_pair_stats(
            hashed_shingle_rows(df, id_col, text_col, n),
            threshold,
            "containment",
            df,
            mode,
            checkpoint_dir,
            max_pack_shingles,
        )
        if max_doc_freq is None
        else _pair_shingle_stats(df, id_col, text_col, n, max_doc_freq)
    )
    return (
        stats
        .withColumn(
            "containment",
            F.col("common") / F.least(F.col("sz_a"), F.col("sz_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def winnowed_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, h) winnowing fingerprints — the MOSS-style sampled
    substitute for the full k-gram set in containment detection.

    Value-based winnowing: hash every word k-gram, slide a window of
    ``window`` consecutive hashes, keep the DISTINCT window-minimum
    values. Guarantee: two documents sharing a verbatim run of at
    least ``window + k - 1`` tokens share at least one fingerprint
    (every full window inside the shared run selects the same minimum
    on both sides). Expected density ~2/(window+1) of all k-grams, so
    the downstream inverted-index join handles ~(window+1)/2 x fewer
    rows — the scale lever for `containment_pairs` at corpus size.

    Hashes are masked to 63 bits so the min-ordering agrees between
    Spark's signed long and the oracle's unsigned replay. Documents
    shorter than ``window + k - 1`` tokens yield no full window and no
    fingerprints (they can't meet the guarantee anyway — use the exact
    path for them). Plan: posexplode the k-gram array once, one
    running-min window per doc, distinct — a single shuffle by id.
    """
    from pyspark.sql import Window as W

    grams = spread_scan(df).select(
        F.col(id_col).alias("id"), word_ngrams_col(text_col, k).alias("g")
    ).select("id", F.size("g").alias("n"), F.posexplode("g").alias("pos", "gram"))
    h = token_hash64("gram", hash_fn).bitwiseAND(F.lit((1 << 63) - 1))
    spec = W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("h", h)
        .withColumn("wmin", F.min("h").over(spec))
        .filter(F.col("pos") <= F.col("n") - window)  # full windows only
        .select("id", F.col("wmin").alias("h"))
        .distinct()
    )


def winnowed_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    threshold: float = 0.5,
    hash_fn: str = "md5",
    max_doc_freq: int | None = None,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    max_pack_shingles: int | None = 2_000_000,
) -> DataFrame:
    """Containment over winnowed fingerprint sets — the corpus-scale
    form of ``containment_pairs``: same |A ∩ B| / min(|A|, |B|)
    measure, computed on the ~2/(window+1)-density fingerprint sample
    instead of every shingle, with the same size-dispatched exact pair
    core and ``max_doc_freq`` skew cap. Output: (id_a, id_b, containment).
    """
    # The pair core materializes the fingerprint index once (lazy
    # local checkpoint) — without it the scan -> posexplode ->
    # window-min pipeline measured 4 full passes in the executed plan.
    fp = winnowed_fingerprints(df, id_col, text_col, k, window, hash_fn).select(
        "id", F.col("h").alias("shingle")
    )
    stats = (
        _exact_pair_stats(
            fp, threshold, "containment", df, mode, checkpoint_dir,
            max_pack_shingles,
        )
        if max_doc_freq is None
        else _pair_stats_from_rows(fp, max_doc_freq, checkpoint_dir)
    )
    return (
        stats
        .withColumn(
            "containment",
            F.col("common") / F.least(F.col("sz_a"), F.col("sz_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


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

    h_i(shingle) = xxhash64(shingle, i); signature[i] = min over the
    doc's shingle set. Computed as ``num_hashes`` MIN aggregates over
    the exploded (id, shingle) rows — declarative aggregates get
    whole-stage codegen and a map-side partial, so the shuffle carries
    one partially-reduced signature row per (doc x input partition).
    (The array-expression formulation — num_hashes x array_min(
    transform(shingles, hash)) in one projection — re-evaluates the
    shingle construction per hash function, O(num_hashes * L^2) per
    row, and runs interpreted. Measured 60x slower.)

    Docs with no shingles have no rows and so no signature — they can
    never match, same as before. Shingles arrive pre-hashed
    (``hashed_shingle_rows``): h_i then hashes a fixed 12 bytes
    (long + int) per function instead of re-hashing the gram string
    ``num_hashes`` times.
    """
    sh = hashed_shingle_rows(df, id_col, text_col, shingle_n)
    # ONE F.expr parse for the whole signature instead of one per
    # aggregate (r13 had already collapsed four py4j calls per hash
    # into one parse each; 64-128 parses still measured ~0.2-0.3 s of
    # pure DRIVER latency per query build, and the bench times
    # construction — guide §1). Catalyst extracts the embedded min()
    # aggregates and projects the array afterwards, so the physical
    # aggregate is identical to the per-column form; SQL integer
    # literals stay IntegerType, so the hashes are bit-identical.
    sig = ", ".join(f"min(xxhash64(shingle, {i}))" for i in range(num_hashes))
    return sh.groupBy("id").agg(F.expr(f"array({sig}) AS sig"))


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig, band_id, band_hash) rows — one per document per band.

    The LSH probe unit shared by the batch pair-finder below and the
    streaming dedup index (`streaming/dedup_index.py`): equal
    ``band_hash`` within a ``band_id`` marks two documents candidates.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    # one parse for all bands (see minhash_signatures)
    band_arr = ", ".join(
        f"xxhash64(cast(slice(sig, {i * r + 1}, {r}) as string))"
        for i in range(bands)
    )
    return sigs.select(
        "id",
        "sig",
        F.expr(f"posexplode(array({band_arr}))").alias("band_id", "band_hash"),
    )


def est_jaccard_col(sig_a: str | F.Column, sig_b: str | F.Column, num_hashes: int) -> F.Column:
    """Signature-agreement estimate of Jaccard: fraction of equal
    MinHash components (unbiased; variance 1/num_hashes * J(1-J))."""
    return (
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m))
        / F.lit(float(num_hashes))
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
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding.

    signature -> ``bands`` bands of r = num_hashes/bands rows; documents
    colliding on any full band are candidates (P[collide] = 1-(1-s^r)^b).
    Candidates are optionally verified with exact shingle Jaccard.

    Scale: candidates come from a groupBy on (band_id, band_hash) — state
    is one bucket per band value, shuffle carries (id, band) pairs only.
    Self-join of the corpus never happens. ``max_bucket_size`` is the
    skew guard: a band bucket of d documents contributes d^2 candidate
    rows, so one boilerplate bucket can dominate the join; buckets
    larger than the cap are dropped BEFORE the self-join (docs that
    collide with >cap others almost surely still collide in another
    band, and AQE skew splitting only rebalances the pain — the cap
    removes it). Off by default so the oracle-checked entries stay
    exhaustive; production call sites (pipelines/corpus.py) set it.
    Output: (id_a, id_b, est_jaccard [, jaccard]).
    """
    banded = minhash_bands(df, id_col, text_col, num_hashes, bands, shingle_n)
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("band_id", "band_hash")
        )
        banded = banded.join(small, ["band_id", "band_hash"])
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
        "est_jaccard", est_jaccard_col("sig_a", "sig_b", num_hashes)
    ).select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    if not verify_exact:
        return est.filter(F.col("est_jaccard") >= threshold)
    # Exact verification on CANDIDATE pairs only: re-join the candidate ids
    # to the per-doc shingle arrays and compute Jaccard from
    # array_intersect/array sizes. Cost scales with |candidates|, never with
    # the corpus pair space — the whole point of LSH at 100 TB. Shingles
    # are the 64-bit hashed form (word_ngram_hashes_col): the intersect
    # compares 8-byte longs, and the signature stage above already
    # shares its collision contract.
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngram_hashes_col(text_col, shingle_n)).alias("shingles"),
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


def _fp_from_votes(vote_col: Callable[[int], F.Column], bits: int) -> F.Column:
    """Assemble a signed-long fingerprint from per-bit vote columns
    (bit set iff vote > 0; bit 63 enters as the sign bit to stay in
    signed-long space)."""
    fp = F.lit(0).cast("long")
    for i in range(min(bits, 63)):
        fp = fp + F.when(vote_col(i) > 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    if bits == 64:
        fp = fp + F.when(vote_col(63) > 0, F.lit(-(2 ** 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def simhash_col(text: str = "text", bits: int = 64) -> F.Column:
    """SimHash fingerprint as a single bigint Column expression.

    Token hashes via xxhash64; per-bit vote = Σ ±1 over token
    occurrences; bit set if vote > 0. One self-contained expression —
    convenient for ad-hoc projections, but the expression tree is
    large (``bits`` aggregate folds); for whole-table fingerprinting
    use ``simhash_fingerprints`` (explode + codegen'd SUM aggregates).
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

    return _fp_from_votes(_vote, bits)


def token_hash64(col: str | F.Column, hash_fn: str = "xxhash64") -> F.Column:
    """64-bit token hash as a signed long.

    ``'xxhash64'``: JVM codegen, the scale default. ``'md5'``: the
    big-endian first 8 bytes of the md5 hex digest — md5 is
    bit-identical in Spark and DuckDB, so fingerprints built from it
    are cross-engine checkable (the oracle computes the same value as
    ``('0x' || substr(md5(t),1,16))::UBIGINT``; signed/unsigned differ
    only in interpretation, the BITS are equal).
    """
    c = F.col(col) if isinstance(col, str) else col
    if hash_fn == "xxhash64":
        return F.xxhash64(c)
    if hash_fn == "md5":
        hex_ = F.md5(c.cast("string"))
        hi = F.conv(F.substring(hex_, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hex_, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fp) SimHash fingerprints for a whole table — the scale path.

    Explode tokens once, hash each occurrence, then ``bits`` SUM
    aggregates of ±1 votes (map-side partial, whole-stage codegen);
    the fingerprint is assembled from the vote columns after the
    aggregate. Vote semantics match ``simhash_col`` exactly (token
    multiplicity counts). Docs with no tokens get no row.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).withColumn("h", token_hash64("tok", hash_fn))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    return agg.select("id", _fp_from_votes(lambda i: F.col(f"_v{i}"), bits).alias("fp"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    16-bit blocks; distance <= blocks-1 guarantees at least one equal
    block, so the candidate join is an equi-join on (block_id, block_value)
    — shuffle by block, never a cross join. Verify with bit_count(xor).
    The blocking is EXACT (not probabilistic): max_hamming < blocks
    pigeonholes at least one equal block for every qualifying pair, so
    the output is precisely the Hamming ball regardless of ``hash_fn``.
    Output: (id_a, id_b, hamming).
    """
    assert max_hamming < blocks, "pigeonhole requires max_hamming < blocks"
    width = 64 // blocks
    fps = simhash_fingerprints(df, id_col, text_col, hash_fn=hash_fn)
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
# near-dup clustering: pairs -> connected components -> survivors
# --------------------------------------------------------------------------

#: Row cap for the explicit broadcast hint on the driver-built cluster
#: map: 2M (id, cluster_id) pairs ~= 32 MB framed — comfortably inside
#: executor memory on any sane config. Bigger maps (possible near the
#: 10M-edge driver-union-find gate) lose the hint and let Catalyst
#: decide from the LocalRelation's known size.
_BROADCAST_HINT_MAX_ROWS = 2_000_000


def neardup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    max_driver_edges: int = 10_000_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (id, cluster_id)
    where cluster_id = the smallest id reachable through pair edges.

    Two execution paths, picked by edge count:

    * **driver union-find** (edge count <= ``max_driver_edges``): the
      pair graph is orders of magnitude smaller than the corpus — only
      near-duplicate ids appear in it — so collecting the EDGES (never
      the documents) and running path-compressed union-find is one
      O(E α(E)) pass. Even a 100 TB corpus with tens of millions of
      duplicate pairs fits comfortably; this is what production dedup
      pipelines do.
    * **distributed min-label propagation with pointer jumping** above
      the cap: each round a node adopts min(own label, neighbors'
      labels, label-of-own-label) — O(log diameter) rounds. Loop
      hygiene that the implementation had to learn the hard way:
      ``localCheckpoint`` every iterate (plain persist caches data but
      the logical plan nests per round and Catalyst re-analyzes the
      ever-deeper tree), and materialize the edge set once (an
      unpersisted lineage re-runs the whole LSH pipeline per round).
      Per-round fixed costs (planning + codegen ~seconds) only
      amortize on genuinely large graphs — hence the size gate.

    ``checkpoint_dir``: when set, every per-iterate materialization is
    a RELIABLE parquet checkpoint under that (durable) directory
    instead of executor-local block storage — on a multi-node cluster
    ``localCheckpoint`` truncates lineage with no recompute path, so
    one lost executor kills the whole propagation loop; the reliable
    form re-reads the last iterate instead. Results are identical
    (asserted in tests); single-node default stays local.

    Input: (id_a, id_b) pairs (extra columns ignored).
    Output: (id, cluster_id) for every id that appears in a pair.
    """
    # materialize the (small) pair list FIRST: the symmetric-edge union
    # below references it twice, and an unmaterialized lineage would
    # re-run the whole upstream pair pipeline (LSH, shingling, exact
    # verification) once per reference
    # lazy (eager=False): the first consumer below (edges.count())
    # materializes both waists in ONE job instead of two standalone
    # eager-checkpoint jobs — same blocks, two fewer driver round-trips
    p = materialize(
        pairs.select("id_a", "id_b"), checkpoint_dir, eager=False, label="cc-pairs"
    )
    edges = materialize(
        p.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(p.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct(),
        checkpoint_dir,
        eager=False,
        label="cc-edges",
    )
    if edges.count() <= max_driver_edges:
        from pyspark.sql.types import StructField, StructType

        from db_cdc_poc_spark.sources.exchange import local_df

        spark = pairs.sparkSession
        # output ids keep the input id type (bigint doc ids, string
        # content hashes, ... — anything orderable works)
        id_type = pairs.schema["id_a"].dataType
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # one Arrow pull instead of a pickled toLocalIterator: the
        # edge list is already gated to fit the driver, and columnar
        # transfer + plain-python values are both cheaper than Row
        # objects (guide §6: Arrow for driver transfers). Peak driver
        # memory is ~2x the framed edge list (Arrow table + pandas) —
        # ~320 MB at the 10M-edge gate, inside the 16g driver with
        # an order of magnitude of slack; raising max_driver_edges
        # beyond ~100M would need a chunked pull here first.
        epdf = edges.toPandas()
        for src, dst in zip(epdf["src"].tolist(), epdf["dst"].tolist()):
            ra, rb = find(src), find(dst)
            if ra != rb:
                # union by smaller id so the root IS the cluster label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = set(parent)
        for x in list(nodes):
            nodes.add(find(x))
        rows = [(x, find(x)) for x in sorted(nodes)]
        schema = StructType(
            [
                StructField("id", id_type, nullable=False),
                StructField("cluster_id", id_type, nullable=False),
            ]
        )
        # LocalRelation (Arrow), not a pickled RDD: q40's executed plan
        # scanned the cluster map THREE times through Python workers
        # (applySchemaToPythonRDD) and sort-merge-joined it against the
        # corpus because a LogicalRDD's size is unknown. The map is
        # driver-bounded by the same gate that let us collect the
        # edges, so mark it broadcastable: every downstream join
        # (docs ⋈ clusters) becomes a broadcast hash join with zero
        # corpus-side shuffle. The HINT is row-gated (ADVICE r13): near
        # the 10M-edge driver gate the map is a multi-hundred-MB
        # relation, and an unconditional hint would bypass
        # autoBroadcastJoinThreshold and double driver memory; above
        # the gate Catalyst sees the LocalRelation's true size and
        # picks the strategy itself.
        out = local_df(spark, rows, schema)
        if len(rows) <= _BROADCAST_HINT_MAX_ROWS:
            out = F.broadcast(out)
        return out
    labels = materialize(
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(F.col("src").alias("id"), F.least("m", "src").alias("label")),
        checkpoint_dir,
        label="cc-labels",
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        via_neighbors = labels.join(
            neighbor_min, labels["id"] == neighbor_min["src"], "left"
        ).select(
            "id",
            F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
        )
        # pointer jump: follow my label's label (path halving)
        parents = via_neighbors.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        new_labels = materialize(
            via_neighbors.join(
                parents, via_neighbors["label"] == parents["p_id"], "left"
            ).select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("p_label", F.col("label"))
                ).alias("label"),
            ),
            checkpoint_dir,
            label="cc-iter",
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"label propagation did not converge in {max_iterations} iterations"
    )


def dedup_fuzzy(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min_id",
    quality_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Remove near-duplicates: cluster the pair graph, keep ONE
    representative per cluster (plus every unpaired document).

    keep='min_id': smallest id survives (deterministic, cheap).
    keep='best_quality': the row with the greatest ``quality_col``
    survives (ties to smallest id) — the training-data policy of
    keeping the highest-quality copy.

    CONTRACT (keep='min_id'): every id in ``pairs`` must be present in
    ``df``. The fast path keeps exactly the rows whose id equals their
    cluster label (the cluster's min member id); if a cluster's
    min-labeled id were paired but absent from ``df`` — pairs built
    from a superset corpus, or df pre-filtered between pairing and
    dedup — that cluster would lose ALL members instead of keeping its
    smallest present one (ADVICE r13). Every in-repo pipeline derives
    ``pairs`` from ``df`` itself, which satisfies this by construction;
    callers pairing one corpus and deduping another must re-pair or use
    keep='best_quality' (whose outer-join path has no such assumption).

    ``checkpoint_dir``: reliable-checkpoint directory forwarded to
    :func:`neardup_clusters` for fault-tolerant clustering on real
    clusters (see there).
    """
    clusters = neardup_clusters(pairs, checkpoint_dir=checkpoint_dir)
    if keep == "min_id":
        # A cluster's label IS its smallest member id (both cluster
        # paths converge labels to the min reachable id), so the
        # survivor of every cluster is the row whose id equals its
        # cluster_id — no docs ⋈ clusters outer join, no per-cluster
        # MIN aggregate, no survivor semi-join. Dedup = drop the
        # paired ids that are NOT their cluster's label: ONE anti-join
        # against a pair-graph-bounded drop set (executed plan went
        # SMJ LeftOuter + aggregate + SMJ LeftSemi + union — 4
        # corpus-side operators — to a single broadcast anti-join).
        drop = clusters.filter(F.col("id") != F.col("cluster_id")).select("id")
        return df.join(drop, df[id_col] == drop["id"], "anti")
    joined = df.join(
        clusters, df[id_col] == clusters["id"], "left"
    ).drop("id")
    member = joined.filter(F.col("cluster_id").isNotNull())
    if keep == "best_quality":
        if quality_col is None:
            raise ValueError("keep='best_quality' requires quality_col")
        # greatest quality wins, ties to smallest id — two aggregates so
        # the tiebreak needs only an orderable id (no numeric negation,
        # string ids work too); renamed join keys sidestep the
        # same-lineage self-join ambiguity
        best_q = (
            member.groupBy("cluster_id")
            .agg(F.max(quality_col).alias("__best_q"))
            .withColumnRenamed("cluster_id", "__bq_cluster_id")
        )
        survivors = (
            member.join(
                best_q,
                (F.col("cluster_id") == F.col("__bq_cluster_id"))
                & (F.col(quality_col) == F.col("__best_q")),
            )
            .groupBy("cluster_id")
            .agg(F.min(id_col).alias("__keep_id"))
        )
    else:
        raise ValueError(f"unknown keep policy {keep!r}")
    # survivors derives from member, so joining member.cluster_id to
    # survivors.cluster_id directly is a same-lineage self-join that
    # Spark resolves as trivially true; a semi-join on the survivor ids
    # (unique across clusters by construction) sidesteps it
    kept_members = member.join(
        survivors.select(F.col("__keep_id").alias(id_col)), id_col, "semi"
    ).select(*df.columns)
    unpaired = joined.filter(F.col("cluster_id").isNull()).select(*df.columns)
    return unpaired.unionByName(kept_members)


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

    Each side projects (vector, norm) per ROW below the self-join, so
    the per-pair work is a single dot fold + scalar divide
    (similarity.paired_cosine). Norms must NOT be computed per pair:
    the filter predicate is pushed into the nested-loop join condition
    and re-evaluates its whole expression per candidate pair — inline
    norms there measured 50x slower.

    O(n^2) pairs — the correctness baseline; use similarity.ann_topk's
    hyperplane bucketing for at-scale candidate generation.
    Output: (id_a, id_b, cosine).
    """
    from db_cdc_poc_spark.operators.similarity import norm, paired_cosine

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            paired_cosine(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
# Exact repeated-span detection (substring-level dedup accounting)
# --------------------------------------------------------------------------


def span_hash_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, h) — one 64-bit hash per positional ``window``-gram span.

    The unit of exact substring-level duplication analysis ("repeated
    n-gram spans" in the deduplicating-training-data literature): every
    length-``window`` token window, duplicates kept, hashed so the
    corpus-wide span index carries 8 bytes per span instead of the
    text. Map-only; documents shorter than ``window`` tokens emit no
    rows.

    ``hash_fn='fast'`` skips gram-string materialization entirely
    (``word_ngram_hashes_col``: per-token xxhash64 + one hash of the
    n-long slice) — the default scale path. 'md5'/'xxhash64' hash the
    gram string; md5 stays available for cross-engine value replay.
    """
    df = spread_scan(df)
    if hash_fn == "fast":
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(word_ngram_hashes_col(text_col, window)).alias("h"),
        )
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams_col(text_col, window)).alias("gram"),
    )
    return grams.select("id", token_hash64("gram", hash_fn).alias("h"))


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
    hash_fn: str = "fast",
) -> DataFrame:
    """Per-document duplicated-span accounting: how much of each doc is
    a verbatim span shared with >= ``min_docs`` documents (itself
    included). Output: (id, n_spans, n_dup_spans, dup_ppm).

    The scale shape deliberately differs from the pair-based dedup
    family: spans are aggregated (span-hash -> doc frequency), never
    self-joined, so a boilerplate span in d documents costs d rows —
    not d^2 — and the whole job is three linear shuffles (distinct
    (h,id), count per h, re-join + per-doc aggregate). That is what
    makes substring-level accounting feasible where a pair join is not:
    at 100 TB the hot spans ARE the interesting ones. ``dup_ppm`` is an
    exact integer (floor of parts-per-million), so value hashes are
    engine-independent.
    """
    spans = span_hash_rows(df, id_col, text_col, window, hash_fn)
    # Pre-aggregate to one row per (doc, span): everything downstream —
    # the doc-frequency count, the re-join, the per-doc rollup — then
    # carries distinct (id, h) rows instead of raw occurrences, so a
    # span repeated k times inside one document costs one joined row,
    # and the occurrence multiplicity survives as an integer weight.
    # Materialized once (lazy local checkpoint): the doc-frequency
    # branch and the join branch both consume per_doc, and without the
    # checkpoint the executed sf1.0 plan ran the full scan -> explode
    # -> md5 -> (id,h) aggregate subtree TWICE (no ReusedExchange
    # across the AQE stage boundary) — the map phase is the expensive
    # part of this job.
    per_doc = (
        spans.groupBy("id", "h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .localCheckpoint(eager=False)
    )
    docfreq = (
        per_doc.groupBy("h")
        .agg(F.count(F.lit(1)).alias("span_docs"))
        .filter(F.col("span_docs") >= min_docs)
    )
    return (
        per_doc.join(docfreq, "h", "left")
        .groupBy("id")
        .agg(
            F.sum("occ").alias("n_spans"),
            F.sum(F.when(F.col("span_docs").isNotNull(), F.col("occ")).otherwise(F.lit(0)))
            .alias("n_dup_spans"),
        )
        .select(
            "id",
            "n_spans",
            "n_dup_spans",
            F.expr("1000000 * n_dup_spans div n_spans").alias("dup_ppm"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_count: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact-substring deduplication (ExactSubstr, Lee et al. ACL'22,
    public method): REMOVE from every document the token spans covered
    by any ``window``-gram occurring >= ``min_count`` times in the
    corpus (within- or cross-document), returning the trimmed text plus
    span accounting. ``duplicate_span_stats`` above measures the
    duplication; this is the surgery.

    Plan (all linear, no pair joins — a span duplicated in d docs
    costs d rows): positional gram hashes (per-token xxhash64 + one
    hash per n-slice, gram strings never materialized — span-hash
    family contract: hash VALUES never surface, so the oracle replays
    on gram strings and agrees up to a 64-bit collision), corpus-wide
    count, re-join the >= min_count hashes onto their start positions,
    expand each flagged start to its ``window`` covered positions
    (distinct), anti-join the exploded tokens, and reassemble each doc
    with order restored via the array_sort-struct pattern (q09/chunker
    shape). Contiguous covered runs are counted with one per-doc
    window (gaps-and-islands) — partitioned by doc, never global.

    Output: ``id_col``, ``n_tokens``, ``dup_tokens``, ``n_spans``
    (maximal removed runs), ``clean_text`` (kept tokens joined by
    single spaces; fully-duplicated docs yield ``''`` — filter on
    ``dup_tokens < n_tokens`` to drop them).
    """
    df = spread_scan(df)
    grams = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngram_hashes_col(text_col, window)).alias(
            "p", "h"
        ),
    )
    # grams feeds the corpus count AND the covered-position join;
    # covered feeds the anti-join AND the span accounting. Cut lineage
    # at both (multi-consumer subtrees otherwise re-run the explode +
    # hash once per reference — the q85/q150 2x-wall disease).
    grams = materialize(grams, checkpoint_dir, eager=False, label="spans-grams")
    dup_h = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    covered = (
        grams.join(dup_h, "h")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    covered = materialize(
        covered, checkpoint_dir, eager=False, label="spans-covered"
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(tokens_col(text_col)).alias("pos", "tok"),
    )
    # map-only: size() of the token array per row replaces a second
    # explode + groupBy pass over the corpus (the count was the only
    # consumer that needed no positions). null text -> 0 tokens,
    # matching count('tok') over posexplode_outer; cast keeps the
    # count()'s long type so the output schema is unchanged.
    tokens_arr = tokens_col(text_col)
    totals = df.select(
        F.col(id_col).alias("id"),
        F.when(tokens_arr.isNull(), F.lit(0))
        .otherwise(F.size(tokens_arr))
        .cast("long")
        .alias("n_tokens"),
    )
    clean = (
        toks.join(covered, ["id", "pos"], "left_anti")
        .groupBy("id")
        .agg(
            F.count("tok").alias("kept_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        covered.withColumn(
            "__new",
            (
                F.col("pos") - F.coalesce(F.lag("pos").over(w), F.lit(-2))
                > 1
            ).cast("long"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("dup_tokens"),
            F.sum("__new").alias("n_spans"),
        )
    )
    return (
        totals.join(spans, "id", "left")
        .join(clean, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias(
                "n_spans"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


# --------------------------------------------------------------------------
# Cross-corpus LSH (fuzzy decontamination / dedup against a prior corpus)
# --------------------------------------------------------------------------


def cross_lsh_pairs(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora via MinHash banding — the
    fuzzy form of eval-set decontamination (decontam.contaminated_docs
    is the exact-n-gram form) and of dedup-against-prior-training-set.

    ``max_bucket_size`` is the same skew guard as in
    ``minhash_lsh_pairs``, applied to the BIG (df_a) side: a band
    bucket holding d_a train docs joins d_a x d_b candidate rows, so a
    boilerplate bucket can dominate; buckets larger than the cap are
    dropped before the join (docs colliding with >cap others almost
    surely still collide in another band). Off by default so the
    oracle-checked entry stays exhaustive; production call sites set it.

    Both sides are banded with the SAME hash family, so a duplicate
    pair collides on a band with the q21 S-curve probability
    (miss ~ (1-J^r)^b ~ 4e-8 at J>=0.9 with 64/16); candidates come
    from an equi-join on (band_id, band_hash) ACROSS the corpora — the
    big side never self-joins, and a small eval set broadcasts. Every
    candidate is exact-verified with shingle Jaccard, so output pairs
    provably equal the exact cross-corpus pair set at the threshold.
    Output: (id_a from df_a, id_b from df_b, jaccard).
    """
    ba = minhash_bands(df_a, id_col, text_col, num_hashes, bands, shingle_n).select(
        F.col("id").alias("id_a"), "band_id", "band_hash"
    )
    bb = minhash_bands(df_b, id_col, text_col, num_hashes, bands, shingle_n).select(
        F.col("id").alias("id_b"), "band_id", "band_hash"
    )
    if max_bucket_size is not None:
        small = (
            ba.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("band_id", "band_hash")
        )
        ba = ba.join(small, ["band_id", "band_hash"])
    cand = ba.join(bb, ["band_id", "band_hash"]).select("id_a", "id_b").distinct()
    # exact verify on hashed shingle sets: array_intersect over 8-byte
    # longs, gram strings never built (same collision contract as
    # word_ngram_hashes_col — a miscounted intersect needs a 64-bit
    # collision WITHIN one document pair's shingles)
    sh_a = df_a.select(
        F.col(id_col).alias("id_a"),
        F.array_distinct(word_ngram_hashes_col(text_col, shingle_n)).alias("sh_a"),
    )
    sh_b = df_b.select(
        F.col(id_col).alias("id_b"),
        F.array_distinct(word_ngram_hashes_col(text_col, shingle_n)).alias("sh_b"),
    )
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# LSH quality measurement: candidate recall vs the exact pair set
# --------------------------------------------------------------------------


def minhash_recall_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """One-row LSH quality report: MinHash/LSH band-candidate RECALL
    and PRECISION against the EXACT n-gram-Jaccard pair set at
    ``threshold`` — "measure, don't guess" for the probabilistic dedup
    path. Run this on a sample before trusting (num_hashes, bands) on
    the full corpus: the S-curve says r-row bands catch a J=s pair
    with p = 1-(1-s^r)^b, and this report checks that claim against
    ground truth on real data.

    The hash family here is the md5-derived ``token_hash64`` (not the
    xxhash64 scale default) so the whole pipeline — signatures, band
    buckets, candidate set — replays bit-for-bit in the DuckDB oracle;
    same estimator, engine-independent bits. Candidate generation is
    the same band equi-join as ``minhash_lsh_pairs``; the exact pair
    set comes from the prefix-filtered exact join. Both sides are pair
    sets keyed (id_a < id_b); the report is three COUNT aggregates and
    two exact integer-ppm divisions — one output row:
    (n_exact, n_candidates, n_hits, recall_ppm, precision_ppm).
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}) — partial bands would silently change the S-curve"
        )
    mask = (1 << 63) - 1
    sh = shingle_rows(df, id_col, text_col, shingle_n)
    mins = [
        F.min(
            token_hash64(
                F.concat(F.lit(f"mh{i}:"), F.col("shingle")), "md5"
            ).bitwiseAND(F.lit(mask))
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    rows_per_band = num_hashes // bands
    band_cols = []
    for bnd in range(bands):
        piece = F.concat_ws(
            ",",
            *[
                F.col(f"_h{bnd * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        )
        band_cols.append(
            F.struct(F.lit(bnd).alias("band_id"), piece.alias("band_key"))
        )
    banded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("b")
    ).select("id", F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key"))
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(
        df, id_col, text_col, shingle_n, threshold
    ).select("id_a", "id_b")
    hits = exact.join(cand, ["id_a", "id_b"], "left_semi")
    counts = (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
    )
    return counts.select(
        "n_exact",
        "n_candidates",
        "n_hits",
        F.when(
            F.col("n_exact") > 0, F.expr("n_hits * 1000000 div n_exact")
        ).alias("recall_ppm"),
        F.when(
            F.col("n_candidates") > 0,
            F.expr("n_hits * 1000000 div n_candidates"),
        ).alias("precision_ppm"),
    )
