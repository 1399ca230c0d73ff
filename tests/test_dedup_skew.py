"""Adversarial-skew stress tests for the LSH/band family's caps.

The batch unit tests prove WHAT the caps drop; these prove the caps
keep the candidate join FLAT under adversarial skew — a hot shingle in
50% of the corpus, a single band bucket with 10^4 members — while
recall on planted rare-shingle near-dups stays at 1.0. Runtime is
asserted as a ratio against a 100x-smaller corpus with the same cap:
capped plans are linear in corpus size, so generous 10x slack still
fails loudly if the quadratic bucket blowup (C(10^4,2) = 5*10^7
candidate rows) ever sneaks back in.
"""

from __future__ import annotations

import time

from db_cdc_poc_spark.operators import dedup as dd


def _planted(base_id: int, n_pairs: int) -> list[tuple[int, str]]:
    """n_pairs of highly-similar doc pairs built from rare tokens."""
    rows = []
    for i in range(n_pairs):
        stem = f"rareword{i}a rareword{i}b rareword{i}c rareword{i}d rareword{i}e rareword{i}f"
        rows.append((base_id + 2 * i, stem + " suffix one"))
        rows.append((base_id + 2 * i + 1, stem + " suffix two"))
    return rows


def _pair_ids(rows) -> set[tuple[int, int]]:
    return {(r.id_a, r.id_b) for r in rows}


def _expected_pairs(base_id: int, n_pairs: int) -> set[tuple[int, int]]:
    return {(base_id + 2 * i, base_id + 2 * i + 1) for i in range(n_pairs)}


def test_lsh_hot_bucket_10k_members_stays_flat(spark):
    n_hot, n_pairs, cap = 10_000, 20, 100
    hot = [(i, "identical boilerplate text repeated everywhere always forever") for i in range(n_hot)]
    big = spark.createDataFrame(
        hot + _planted(1_000_000, n_pairs), "doc_id long, text string"
    )
    # small comparator's hot set must also EXCEED the cap (so both runs
    # drop it) — 50x fewer docs, same capped plan
    small = spark.createDataFrame(
        hot[:200] + _planted(1_000_000, n_pairs), "doc_id long, text string"
    )

    def run(df):
        t0 = time.time()
        rows = dd.minhash_lsh_pairs(
            df, num_hashes=16, bands=8, threshold=0.3,
            verify_exact=False, max_bucket_size=cap,
        ).collect()
        return rows, time.time() - t0

    rows_big, t_big = run(big)       # pays codegen warm-up
    rows_small, t_small = run(small)  # warm — the fair comparator
    # recall floor: every planted rare-shingle pair survives the cap
    assert _pair_ids(rows_big) >= _expected_pairs(1_000_000, n_pairs)
    # the 10^4-member bucket contributes nothing
    assert all(r.id_a >= 1_000_000 for r in rows_big)
    assert _pair_ids(rows_small) == _pair_ids(rows_big)
    # flat runtime: 100x the hot docs must NOT cost anywhere near
    # 100x (let alone the quadratic 10^4x); 10x slack absorbs noise
    assert t_big < 10 * max(t_small, 2.0), (t_big, t_small)


def test_jaccard_hot_shingle_half_corpus_stays_flat(spark):
    n_docs, n_pairs, cap = 10_000, 20, 50
    # 50% of the corpus shares one boilerplate shingle run
    corpus = [
        (
            i,
            ("common boiler plate header " if i % 2 == 0 else "")
            + f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}",
        )
        for i in range(n_docs)
    ]
    big = spark.createDataFrame(
        corpus + _planted(1_000_000, n_pairs), "doc_id long, text string"
    )
    # 100 hot docs in the small comparator — still above the cap
    small = spark.createDataFrame(
        corpus[:200] + _planted(1_000_000, n_pairs), "doc_id long, text string"
    )

    def run(df):
        t0 = time.time()
        rows = dd.ngram_jaccard_pairs(
            df, threshold=0.3, max_doc_freq=cap
        ).collect()
        return rows, time.time() - t0

    rows_big, t_big = run(big)
    rows_small, t_small = run(small)
    # recall floor 1.0 on the planted pairs; hot-shingle cross pairs gone
    assert _pair_ids(rows_big) >= _expected_pairs(1_000_000, n_pairs)
    assert all(r.id_a >= 1_000_000 for r in rows_big)
    assert _pair_ids(rows_small) == _pair_ids(rows_big)
    assert t_big < 10 * max(t_small, 2.0), (t_big, t_small)


def test_cross_lsh_hot_train_bucket_stays_flat(spark):
    n_hot, cap = 10_000, 100
    contaminated = "unique evaluation question about spark adaptive execution behavior"
    train = spark.createDataFrame(
        [(i, "identical training boilerplate repeated everywhere always forever") for i in range(n_hot)]
        + [(999_999, contaminated)],
        "doc_id long, text string",
    )
    eval_ = spark.createDataFrame(
        [(1, contaminated), (2, "an unrelated eval prompt concerning database recovery")],
        "doc_id long, text string",
    )
    t0 = time.time()
    rows = dd.cross_lsh_pairs(
        train, eval_, threshold=0.9, max_bucket_size=cap
    ).collect()
    t = time.time() - t0
    # the contaminated doc is found; the 10^4 hot-bucket train docs
    # never join (their bucket exceeds the cap)
    assert {(r.id_a, r.id_b) for r in rows} == {(999_999, 1)}
    # linear work: banding 10^4 docs + a 2-row probe — seconds, not the
    # minutes a 10^4 x 2 x 8-band unguarded hot join would approach
    assert t < 60, t
