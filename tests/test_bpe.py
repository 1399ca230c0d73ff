"""Corpus-trained deterministic BPE (text.bpe_*): pure-Python
reference == Spark path word-for-word (the value check standing in for
a SQL oracle — BPE training is an iterative algorithm, the documented
rows-only-check category), plus determinism, merge semantics, and the
OOV fallback contract."""

from __future__ import annotations

from collections import Counter

from db_cdc_poc_spark.operators.text import (
    BpeModel,
    _bpe_apply_merge,
    bpe_token_counts,
    bpe_tokenize,
    bpe_train,
)

CORPUS = [
    (1, "low lower lowest low low", "a"),
    (2, "new newer newest new lower", "a"),
    (3, "low new wider wide wide", "b"),
    (4, "the the the the wider lowest", "b"),
]


def _py_train(texts: list[str], num_merges: int, vocab_cap: int):
    """Independent reference implementation of the training loop."""
    freq = Counter(w for t in texts for w in t.split())
    head = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    freq = dict(head)
    syms = {w: tuple(w) for w in freq}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, sym in syms.items():
            for pair in zip(sym, sym[1:]):
                counts[pair] += freq[w]
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        syms = {w: _bpe_apply_merge(s, pair) for w, s in syms.items()}
    return merges, {w: len(s) for w, s in syms.items()}


def test_merge_application_is_leftmost_first():
    assert _bpe_apply_merge(tuple("aaa"), ("a", "a")) == ("aa", "a")
    assert _bpe_apply_merge(tuple("aaaa"), ("a", "a")) == ("aa", "aa")
    assert bpe_tokenize("banana", [("a", "n"), ("b", "an")]) == (
        "ban",
        "an",
        "a",
    )


def test_training_matches_reference_and_is_deterministic(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    m1 = bpe_train(df, num_merges=50, vocab_cap=100)
    m2 = bpe_train(df, num_merges=50, vocab_cap=100)
    assert m1.merges == m2.merges  # bit-for-bit replay
    ref_merges, ref_counts = _py_train(
        [t for _, t, _ in CORPUS], num_merges=50, vocab_cap=100
    )
    assert m1.merges == ref_merges
    assert m1.token_counts == ref_counts
    # token_counts agree with re-applying the merges from scratch
    for w, n in m1.token_counts.items():
        assert len(bpe_tokenize(w, m1.merges)) == n


def test_spark_counts_match_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    model = bpe_train(df, num_merges=50, vocab_cap=100)  # full coverage
    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens, r.oov_words)
        for r in bpe_token_counts(df, model).collect()
    }
    for doc_id, text, _ in CORPUS:
        words = text.split()
        want_bpe = sum(len(bpe_tokenize(w, model.merges)) for w in words)
        assert got[doc_id] == (len(words), want_bpe, 0)


def test_oov_falls_back_to_char_count_and_is_reported(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    # cap the vocab to 3 words: everything else is OOV
    model = bpe_train(df, num_merges=50, vocab_cap=3)
    assert len(model.token_counts) == 3
    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens, r.oov_words)
        for r in bpe_token_counts(df, model).collect()
    }
    for doc_id, text, _ in CORPUS:
        words = text.split()
        want = sum(
            model.token_counts.get(w, len(w)) for w in words
        )
        n_oov = sum(1 for w in words if w not in model.token_counts)
        assert got[doc_id] == (len(words), want, n_oov)


def test_training_stops_when_nothing_repeats(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef gh")], "doc_id long, text string"
    )
    model = bpe_train(df, num_merges=50, vocab_cap=100)
    assert model.merges == []  # every pair count is 1: memorization guard
    assert model.token_counts == {"ab": 2, "cd": 2, "ef": 2, "gh": 2}


def test_q170_runs_and_ratio_is_sane(spark):
    from db_cdc_poc_spark.queries import registry

    from .conftest import SF_DIR

    rows = registry()["q170_bpe_calibration"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens  # BPE never merges across words
        assert r.bpe_per_ws_ppm >= 1_000_000
        assert 0 <= r.oov_words <= r.ws_tokens