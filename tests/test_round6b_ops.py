"""Round-6b operators: DSIR importance weights, distribution-matching
rejection sampler, water-filling token-budget allocator, JS-divergence
drift monitor.  Each validated against an independent Python/NumPy
reference implementation, plus the edge cases the closed forms rely on."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.sampling import (
    dsir_log_weights,
    match_distribution_sample,
    token_budget_fill,
)
from db_cdc_poc_spark.operators.stats import unigram_js_divergence


# ---------------------------------------------------------------------------
# token_budget_fill — closed-form water-filling vs the iterative algorithm
# ---------------------------------------------------------------------------


def _waterfill_reference(domains, budget):
    """Textbook iterative water-filling: repeatedly give every uncapped
    domain its proportional share; any domain whose share exceeds its
    available tokens is capped at that mass and the loop re-solves the
    remainder.  Integer arithmetic mirroring the operator's div."""
    capped: dict[str, int] = {}
    while True:
        free = {k: (n, w) for k, (n, w) in domains.items() if k not in capped}
        rem_b = budget - sum(capped.values())
        rem_w = sum(w for _, w in free.values())
        if not free or rem_w <= 0:
            break
        newly = {
            k: n for k, (n, w) in free.items() if n * rem_w <= rem_b * w
        }
        if not newly:
            break
        capped.update(newly)
    alloc = dict(capped)
    rem_b = budget - sum(capped.values())
    rem_w = sum(w for k, (_, w) in domains.items() if k not in capped)
    for k, (n, w) in domains.items():
        if k not in capped:
            alloc[k] = max(0, min(n, (rem_b * w) // rem_w)) if rem_w > 0 else 0
    return alloc


def _run_fill(spark, domains, budget):
    df = spark.createDataFrame(
        [(k, n, w) for k, (n, w) in domains.items()],
        "src string, n long, w long",
    )
    out = token_budget_fill(df, "src", "n", "w", budget=budget).collect()
    return {r.src: r for r in out}


def test_token_budget_matches_iterative_reference(spark):
    domains = {
        "wiki": (1_000, 5_000_000),  # scarce, heavily weighted -> capped
        "books": (40_000, 3_000_000),
        "crawl": (900_000, 1_000_000),
        "code": (250, 2_000_000),  # tiny -> capped
        "forums": (60_000, 500_000),
    }
    budget = 100_000
    got = _run_fill(spark, domains, budget)
    want = _waterfill_reference(domains, budget)
    assert {k: r.alloc_tokens for k, r in got.items()} == want
    # capped flags agree with "allocation == available mass"
    for k, r in got.items():
        assert r.capped == (want[k] == domains[k][0])
    # invariants: never over-allocate a domain, never blow the budget
    assert all(r.alloc_tokens <= domains[k][0] for k, r in got.items())
    assert sum(r.alloc_tokens for r in got.values()) <= budget


def test_token_budget_budget_exceeds_supply_caps_everything(spark):
    domains = {"a": (10, 7), "b": (20, 3)}
    got = _run_fill(spark, domains, budget=1_000)
    assert all(r.capped for r in got.values())
    assert {k: r.alloc_tokens for k, r in got.items()} == {"a": 10, "b": 20}


def test_token_budget_zero_budget_allocates_nothing(spark):
    got = _run_fill(spark, {"a": (10, 7), "b": (20, 3)}, budget=0)
    assert all(r.alloc_tokens == 0 for r in got.values())
    assert sum(r.alloc_tokens for r in got.values()) == 0


def test_token_budget_single_domain(spark):
    got = _run_fill(spark, {"only": (500, 1)}, budget=200)
    assert got["only"].alloc_tokens == 200 and not got["only"].capped
    got = _run_fill(spark, {"only": (150, 1)}, budget=200)
    assert got["only"].alloc_tokens == 150 and got["only"].capped


def test_token_budget_proportional_when_nothing_caps(spark):
    # plentiful supply everywhere but budget small: pure proportional split
    domains = {"a": (10**9, 3), "b": (10**9, 1)}
    got = _run_fill(spark, domains, budget=4_000)
    assert got["a"].alloc_tokens == 3_000
    assert got["b"].alloc_tokens == 1_000


# ---------------------------------------------------------------------------
# dsir_log_weights — hashed-ngram likelihood ratio vs a hashlib reference
# ---------------------------------------------------------------------------


def _md5_bucket(s: str, salt: str, buckets: int) -> int:
    h = int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:16], 16)
    return (h & ((1 << 63) - 1)) % buckets


def _dsir_reference(rows, n_buckets, salt="dsir"):
    """Independent Python DSIR: same hashing trick, same micro-nat
    quantization, brute-force dictionaries instead of DataFrames."""
    doc_counts: dict[tuple[int, int], int] = {}
    tgt: dict[int, bool] = {}
    for doc_id, text, is_tgt in rows:
        toks = [t for t in text.split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tgt[doc_id] = is_tgt
        for g in grams:
            b = _md5_bucket(g, salt, n_buckets)
            doc_counts[(doc_id, b)] = doc_counts.get((doc_id, b), 0) + 1
    raw: dict[int, int] = {}
    tc: dict[int, int] = {}
    for (d, b), c in doc_counts.items():
        raw[b] = raw.get(b, 0) + c
        if tgt[d]:
            tc[b] = tc.get(b, 0) + c
    raw_tot, tgt_tot = sum(raw.values()), sum(tc.values())
    lr = {
        b: round(
            (
                math.log(tc.get(b, 0) + 1)
                - math.log(tgt_tot + n_buckets)
                - math.log(raw[b] + 1)
                + math.log(raw_tot + n_buckets)
            )
            * 1_000_000.0
        )
        for b in raw
    }
    out = {}
    for (d, b), c in doc_counts.items():
        n, w = out.get(d, (0, 0))
        out[d] = (n + c, w + c * lr[b])
    return out


def test_dsir_matches_python_reference(spark):
    rows = [
        (1, "the cat sat on the mat", True),
        (2, "the dog sat on the log", True),
        (3, "der hund sass auf dem baumstamm", False),
        (4, "the cat sat on the mat", False),  # identical to a target doc
        (5, "xyzzy plugh", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r.doc_id: (r.n_grams, r.log_w_micro)
        for r in dsir_log_weights(
            df, "doc_id", "text", target=F.col("tgt"), n_buckets=64
        ).collect()
    }
    assert got == _dsir_reference(rows, 64)


def test_dsir_target_lookalike_outranks_disjoint_text(spark):
    # doc 4 shares every gram with the target slice; doc 3 shares none —
    # the whole point of DSIR is that 4 scores higher than 3.
    rows = [
        (1, "the cat sat on the mat", True),
        (2, "the dog sat on the log", True),
        (3, "der hund sass auf dem baumstamm", False),
        (4, "the cat sat on the mat", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {
        r.doc_id: r.log_w_micro / r.n_grams
        for r in dsir_log_weights(
            df, "doc_id", "text", target=F.col("tgt"), n_buckets=4096
        ).collect()
    }
    assert w[4] > w[3]


def test_dsir_gram_count_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", True), (2, "solo", False)],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r.doc_id: r.n_grams
        for r in dsir_log_weights(
            df, "doc_id", "text", target=F.col("tgt"), n_buckets=16
        ).collect()
    }
    assert got == {1: 4 + 3, 2: 1}  # single-token doc: no bigrams, no crash


# ---------------------------------------------------------------------------
# match_distribution_sample — histogram density-ratio rejection sampling
# ---------------------------------------------------------------------------


def test_match_distribution_acceptance_rates(spark):
    # reference: 90% bin 0 / 10% bin 1; candidates: 10% bin 0 / 90% bin 1.
    # Expect bin-0 candidates kept ~100% (ratio 9, clamped), bin-1 kept ~1/9.
    rows = [(i, 0 if i % 10 < 9 else 1, True) for i in range(1000)]
    rows += [(10_000 + i, 0 if i % 10 == 0 else 1, False) for i in range(9000)]
    df = spark.createDataFrame(rows, "doc_id long, bin long, ref boolean")
    kept = match_distribution_sample(
        df, "doc_id", bin_col=F.col("bin"), is_reference=F.col("ref")
    )
    by_bin = {
        r.bin: r.n
        for r in kept.groupBy("bin").agg(F.count("*").alias("n")).collect()
    }
    assert by_bin[0] == 900  # ratio > 1 clamps to keep-all
    assert 820 * (1 / 9) * 0.6 < by_bin[1] < 8100 * (1 / 9) * 1.4
    # only candidates come back, original columns preserved
    out_rows = kept.collect()
    assert all(not r.ref for r in out_rows)
    assert set(out_rows[0].asDict()) == {"doc_id", "bin", "ref"}


def test_match_distribution_drops_bins_absent_from_reference(spark):
    rows = [(1, 0, True), (2, 0, False), (3, 7, False)]
    df = spark.createDataFrame(rows, "doc_id long, bin long, ref boolean")
    kept = {
        r.doc_id
        for r in match_distribution_sample(
            df, "doc_id", bin_col=F.col("bin"), is_reference=F.col("ref")
        ).collect()
    }
    assert 3 not in kept  # p_ref(bin 7) = 0 -> rejected
    assert kept <= {2}


def test_match_distribution_deterministic(spark):
    rows = [(i, i % 3, i % 4 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, bin long, ref boolean")

    def run():
        return {
            r.doc_id
            for r in match_distribution_sample(
                df, "doc_id", bin_col=F.col("bin"), is_reference=F.col("ref")
            ).collect()
        }

    assert run() == run()


# ---------------------------------------------------------------------------
# unigram_js_divergence — vs a direct Python computation; bounds
# ---------------------------------------------------------------------------


def _jsd_reference(rows):
    """Direct JSD of each group vs the whole corpus over the FULL vocab
    (no closed-form residual trick) — the thing the operator must equal."""
    gw: dict[tuple[str, str], int] = {}
    for grp, text in rows:
        for w in text.split():
            if w:
                gw[(grp, w)] = gw.get((grp, w), 0) + 1
    vocab = {w for _, w in gw}
    groups = {g for g, _ in gw}
    n_tot = sum(gw.values())
    out = {}
    for g in groups:
        n_g = sum(c for (gg, _), c in gw.items() if gg == g)
        jsd = 0.0
        for w in vocab:
            p = gw.get((g, w), 0) / n_g
            q = sum(c for (_, ww), c in gw.items() if ww == w) / n_tot
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        out[g] = round(jsd, 5)
    return out


def test_jsd_matches_full_vocab_reference(spark):
    rows = [
        ("news", "the markets rose the markets fell"),
        ("news", "rates rose again"),
        ("forum", "lol the thread is great lol"),
        ("spam", "buy buy buy now now"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: r.jsd
        for r in unigram_js_divergence(df, "source", "text").collect()
    }
    want = _jsd_reference(rows)
    for g in want:
        assert abs(got[g] - want[g]) <= 1e-5, (g, got[g], want[g])


def test_jsd_bounds_and_disjoint_vocab(spark):
    # group with vocabulary disjoint from everything else: JSD -> ln 2
    # as its corpus share -> 0; always within (0, ln 2].
    rows = [("big", " ".join(f"w{i % 50}" for i in range(2000)))] + [
        ("odd", "qqq zzz qqq")
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: r
        for r in unigram_js_divergence(df, "source", "text").collect()
    }
    ln2 = math.log(2.0)
    assert 0.0 < got["odd"].jsd <= ln2 + 1e-9
    assert got["odd"].jsd > 0.6  # nearly disjoint -> near ln 2
    assert got["big"].jsd < 0.05  # dominates the corpus -> near 0
    assert got["big"].n_tokens == 2000 and got["big"].vocab == 50


def test_jsd_single_group_is_zero(spark):
    df = spark.createDataFrame(
        [("only", "a b a c")], "source string, text string"
    )
    [r] = unigram_js_divergence(df, "source", "text").collect()
    assert r.jsd == 0.0 and r.n_tokens == 4 and r.vocab == 3


# ---------------------------------------------------------------------------
# semdedup — keep-the-outlier policy on handcrafted clusters
# ---------------------------------------------------------------------------


def test_semdedup_drops_the_more_typical_member(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.similarity import semdedup

    # ids 1/2 are a near-dup pair in cluster 0; the paper's policy keeps
    # the member with the LOWER cosine to the cluster centroid. Compute
    # the expected survivor with numpy instead of trusting hand-math.
    v1, v2 = np.array([1.0, 0.1, 0.0]), np.array([1.0, 0.3, 0.0])
    cen = np.round((v1 + v2) / 2, 6)
    cos = [
        float(v @ cen / (np.linalg.norm(v) * np.linalg.norm(cen)))
        for v in (v1, v2)
    ]
    survivor = 1 if cos[0] < cos[1] else 2
    rows = [
        (1, [1.0, 0.1, 0.0], 0),
        (2, [1.0, 0.3, 0.0], 0),
        (3, [0.0, 0.0, 1.0], 1),  # own cluster, no neighbor
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semdedup(df, threshold=0.95)
    kept = {r.vec_id for r in out.collect()}
    assert kept == {survivor, 3}


def test_semdedup_below_threshold_keeps_everything(spark):
    from db_cdc_poc_spark.operators.similarity import semdedup

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),  # orthogonal: cosine 0 < any threshold
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    assert out_ids(semdedup(df, threshold=0.5)) == {1, 2}


def out_ids(df):
    return {r.vec_id for r in df.collect()}


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    from db_cdc_poc_spark.operators.similarity import semdedup

    # near-identical vectors (cosine > 0.999) that land in different
    # clusters: the pair is never screened, so both survive even above
    # the threshold.
    rows = [
        (1, [1.0, 0.02, 0.0], 0),
        (2, [1.0, -0.02, 0.0], 1),
        (3, [0.9, 0.1, 0.0], 0),   # anchors keep centroids distinct
        (4, [0.9, -0.1, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.vec_id: r.cluster for r in semdedup(df, threshold=0.999).collect()}
    assert 1 in out and 2 in out and out[1] != out[2]


# ---------------------------------------------------------------------------
# remove_duplicate_spans — ExactSubstr surgery on handcrafted docs
# ---------------------------------------------------------------------------


def _spans(spark, docs, window=3):
    from db_cdc_poc_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in remove_duplicate_spans(
            df, "doc_id", "text", window=window
        ).collect()
    }


def test_remove_dup_spans_cross_doc_span_removed_from_both(spark):
    got = _spans(
        spark,
        [
            (1, "a b c d e unique1 tail1"),
            (2, "head2 a b c d e unique2"),
        ],
        window=5,
    )
    # the shared 5-gram "a b c d e" is removed from BOTH docs
    assert got[1].clean_text == "unique1 tail1"
    assert got[2].clean_text == "head2 unique2"
    assert got[1].dup_tokens == 5 and got[1].n_spans == 1
    assert got[2].dup_tokens == 5 and got[2].n_spans == 1
    assert got[1].n_tokens == 7


def test_remove_dup_spans_overlapping_grams_merge_into_one_span(spark):
    # "a b c d" duplicated: grams (a b c) and (b c d) both flagged,
    # covered positions merge into ONE contiguous span of 4 tokens.
    got = _spans(
        spark,
        [(1, "a b c d x"), (2, "y a b c d")],
        window=3,
    )
    assert got[1].dup_tokens == 4 and got[1].n_spans == 1
    assert got[1].clean_text == "x"


def test_remove_dup_spans_within_doc_repetition_counts(spark):
    # the same doc repeats its own trigram: both occurrences removed
    got = _spans(spark, [(1, "p q r z p q r")], window=3)
    assert got[1].dup_tokens == 6 and got[1].n_spans == 2
    assert got[1].clean_text == "z"


def test_remove_dup_spans_short_and_clean_docs_untouched(spark):
    got = _spans(
        spark,
        [(1, "tiny"), (2, "all fresh words here"), (3, "all fresh words here")],
        window=5,
    )
    # doc 1 shorter than the window: no grams, kept whole
    assert got[1].clean_text == "tiny" and got[1].dup_tokens == 0
    # docs 2/3 duplicate each other but are only 4 tokens < window=5:
    # no gram exists, so nothing is flagged (window sets the granularity)
    assert got[2].dup_tokens == 0 and got[2].n_spans == 0


def test_remove_dup_spans_fully_duplicated_doc_empties(spark):
    got = _spans(spark, [(1, "a b c"), (2, "a b c")], window=3)
    assert got[1].clean_text == "" and got[1].dup_tokens == 3
    assert got[2].clean_text == "" and got[2].n_spans == 1


# ---------------------------------------------------------------------------
# strip_boilerplate — per-group frequency-threshold chunk removal
# ---------------------------------------------------------------------------


def _boiler(spark, docs, **kw):
    from db_cdc_poc_spark.operators.text import strip_boilerplate

    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    return {
        r.doc_id: r
        for r in strip_boilerplate(df, "doc_id", "text", "source", **kw).collect()
    }


def test_strip_boilerplate_removes_all_copies_in_group(spark):
    # 2-token chunks; "nav bar" leads 2 of 3 docs in source A -> removed
    # from BOTH (not keep-first); source B's identical chunk survives
    # because frequency is judged per group.
    docs = [
        (1, "nav bar body one", "A"),
        (2, "nav bar body two", "A"),
        (3, "fresh text only here", "A"),
        (4, "nav bar lone copy", "B"),
        (5, "other stuff here too", "B"),
    ]
    got = _boiler(spark, docs, window=2, min_docs=2, min_doc_ppm=10_000)
    assert got[1].clean_text == "body one"
    assert got[2].clean_text == "body two"
    assert got[1].n_boiler_chunks == 1 and got[1].n_chunks == 2
    assert got[3].clean_text == "fresh text only here"
    assert got[4].clean_text == "nav bar lone copy"  # B: only 1 doc has it
    assert got[4].n_boiler_chunks == 0


def test_strip_boilerplate_ppm_threshold_blocks_rare_chunks(spark):
    # chunk in 2 docs but the group has 2000 docs -> 1000 ppm < 500000
    docs = [(i, f"filler{i} text{i}", "A") for i in range(2000)]
    docs += [(9001, "nav bar", "A"), (9002, "nav bar", "A")]
    got = _boiler(spark, docs, window=2, min_docs=2, min_doc_ppm=500_000)
    assert got[9001].n_boiler_chunks == 0
    assert got[9001].clean_text == "nav bar"


def test_strip_boilerplate_fully_boiler_doc_yields_empty(spark):
    docs = [(1, "nav bar", "A"), (2, "nav bar", "A")]
    got = _boiler(spark, docs, window=2, min_docs=2, min_doc_ppm=10_000)
    assert got[1].clean_text == "" and got[1].n_boiler_chunks == 1
