"""End-to-end corpus cleaning pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.pipelines.corpus import clean_corpus
from db_cdc_poc_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_clean_corpus_end_to_end(spark):
    docs = load_table(spark, SF_DIR, "documents")
    clean, report = clean_corpus(docs, min_quality=0.3, jaccard_threshold=0.5)
    assert report.n_input == docs.count()
    assert 0 < report.n_output <= report.n_after_filter <= report.n_input
    assert report.deduped_out > 0  # the testdata plants near-dups
    rows = clean.collect()
    assert all(r.quality_score >= 0.3 for r in rows)
    # no near-dup cluster may keep two members: re-detect on the output
    from db_cdc_poc_spark.operators.dedup import ngram_jaccard_pairs

    assert ngram_jaccard_pairs(clean, threshold=0.5).count() == 0


def test_clean_corpus_language_filter(spark):
    docs = load_table(spark, SF_DIR, "documents")
    clean, _ = clean_corpus(docs, min_quality=0.0, languages=("en",))
    assert {r.lang_pred for r in clean.select("lang_pred").distinct().collect()} == {
        "en"
    }


def test_clean_corpus_keeps_best_quality_copy(spark):
    # doc 2 = doc 1 plus a short suffix: trigram Jaccard ~0.79 (a real
    # near-copy, comfortably above the LSH recall curve at 64/16) and
    # slightly higher quality (longer, one more stopword) — so the
    # cluster's survivor must be 2, not the smaller id
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank "
                "today and tomorrow"),
            (3, "totally different content about the spark catalyst optimizer"),
        ],
        "doc_id long, text string",
    )
    clean, report = clean_corpus(docs, min_quality=0.0, jaccard_threshold=0.4)
    ids = {r.doc_id for r in clean.collect()}
    assert ids == {2, 3}
    assert report.deduped_out == 1


def test_prepare_training_corpus_end_to_end(spark):
    """Full pipeline on testdata: every stage monotonically shrinks the
    corpus, planted near-dups are gone, eval-contaminated docs are
    gone, PII is scrubbed, every survivor has packing coordinates."""
    from pyspark.sql import functions as F

    from db_cdc_poc_spark.operators.decontam import contaminated_docs
    from db_cdc_poc_spark.pipelines.corpus import prepare_training_corpus

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(" reach me at someone@example.com"))
    )
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    packed, rep = prepare_training_corpus(train, ev)

    assert rep.n_input >= rep.n_after_quality >= rep.n_after_repetition
    assert rep.n_after_repetition >= rep.n_after_decontam >= rep.n_after_dedup
    assert rep.n_after_dedup == packed.count() > 0
    assert rep.n_sequences > 0

    # PII scrubbed everywhere
    assert packed.filter(F.col("text").contains("@example.com")).count() == 0
    # no residual eval contamination among survivors (text was redacted,
    # but the planted email suffix is shared with eval docs too — use
    # the pipeline's own n-gram rule against the ORIGINAL eval slice)
    residual = contaminated_docs(packed, ev, n=8)
    assert residual.join(
        packed.select("doc_id"), residual["id"] == F.col("doc_id")
    ).count() == 0
    # packing coordinates are consistent: start_tok < budget
    assert packed.filter(F.col("start_tok") >= 256).count() == 0
