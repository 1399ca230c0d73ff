"""Hypothesis sweep over the corpus-trained BPE seam (VERDICT r10 ask
#7): random corpora -> trainer/encoder invariants. The q170
calibration covers one corpus; these pin the seam the way the q102
sweep caught water-filling:

1. round-trip: concatenating a word's BPE tokens reproduces the word
   (merges only ever concatenate adjacent symbols);
2. determinism: re-training on the same corpus replays the merge list
   and token counts bit-for-bit;
3. trainer/encoder agreement: ``token_counts[w]`` (the trainer's final
   symbolization) equals ``len(bpe_tokenize(w, merges))`` — the
   sequential-exhaustive application rule is the SAME function in both
   places;
4. monotonicity: more merges never increases any vocab word's token
   count, and every count sits in [1, len(word)].
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_cdc_poc_spark.operators.text import bpe_tokenize, bpe_train

_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "12"))

# small alphabet: forces shared pairs (merges actually fire) while
# keeping each example's train cheap
_WORD = st.text(alphabet="abcd", min_size=1, max_size=8)
_CORPUS = st.lists(
    st.lists(_WORD, min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=8,
)


def _train(spark, texts, num_merges):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return bpe_train(df, num_merges=num_merges, vocab_cap=64)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS, merges=st.integers(min_value=0, max_value=12))
def test_bpe_roundtrip_agreement_and_bounds(spark, texts, merges):
    model = _train(spark, texts, merges)
    vocab = {w for t in texts for w in t.split()}
    assert set(model.token_counts) == vocab  # cap not binding here
    for w in vocab:
        toks = bpe_tokenize(w, model.merges)
        assert "".join(toks) == w, "merges must only concatenate"
        assert model.token_counts[w] == len(toks), (
            "trainer symbolization and encoder must agree"
        )
        assert 1 <= model.token_counts[w] <= len(w)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_bpe_training_is_deterministic(spark, texts):
    a = _train(spark, texts, 8)
    b = _train(spark, texts, 8)
    assert a.merges == b.merges
    assert a.token_counts == b.token_counts


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS, m1=st.integers(0, 6), extra=st.integers(1, 6))
def test_bpe_token_counts_monotone_in_merges(spark, texts, m1, extra):
    small = _train(spark, texts, m1)
    big = _train(spark, texts, m1 + extra)
    # a merge prefix is shared: extra merges only extend the table
    assert big.merges[: len(small.merges)] == small.merges
    for w, n in big.token_counts.items():
        assert n <= small.token_counts[w]
