"""Corpus cleaning — the canonical training-data pipeline, composed
from the engine's operators:

    documents ─► quality features ─► language/quality filter
              ─► MinHash-LSH near-dup pairs ─► cluster ─► best-quality
                 survivor ─► clean corpus (+ per-stage accounting)

Every stage is a DataFrame transform; the only driver-side values are
the stage counts in the report. At 100 TB each arrow is a distributed
pass: the quality filter is map-only, LSH shuffles by band bucket,
clustering shuffles pair-graph labels (tiny), and survivor selection
is one max_by aggregate per cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.dedup import dedup_fuzzy, minhash_lsh_pairs
from db_cdc_poc_spark.operators.text import lang_id, quality_features


@dataclass(frozen=True)
class CorpusReport:
    n_input: int
    n_after_filter: int
    n_output: int

    @property
    def filtered_out(self) -> int:
        return self.n_input - self.n_after_filter

    @property
    def deduped_out(self) -> int:
        return self.n_after_filter - self.n_output


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.4,
    languages: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_band_bucket: int | None = 1000,
) -> tuple[DataFrame, CorpusReport]:
    """Returns (clean_docs, report). clean_docs carries the original
    columns plus quality_score and lang_pred; near-duplicate clusters
    keep their highest-quality member.

    ``max_band_bucket`` caps the LSH band-bucket size (skew guard): a
    bucket holding d documents contributes d^2 candidate pairs, so one
    pathological bucket (boilerplate-heavy corpora produce them) can
    dominate the join. Capped buckets are skipped — documents that
    near-identical to >cap others are overwhelmingly caught in their
    other bands. Defaults ON here (production path); the oracle-checked
    query entries keep it off for exactness.
    """
    feats = quality_features(docs, id_col=id_col, text_col=text_col).select(
        F.col("id").alias(id_col), "quality_score"
    )
    scored = (
        docs.join(feats, id_col)
        .withColumn("lang_pred", lang_id(text_col))
    )
    kept = scored.filter(F.col("quality_score") >= min_quality)
    if languages is not None:
        kept = kept.filter(F.col("lang_pred").isin(*languages))
    kept.persist()
    try:
        pairs = minhash_lsh_pairs(
            kept,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            threshold=jaccard_threshold,
            max_bucket_size=max_band_bucket,
        )
        clean = dedup_fuzzy(
            kept, pairs, id_col=id_col, keep="best_quality", quality_col="quality_score"
        )
        report = CorpusReport(
            n_input=docs.count(),
            n_after_filter=kept.count(),
            n_output=clean.count(),
        )
    finally:
        # n_output forced clean through the cache; release executor
        # storage so repeated calls don't accumulate cached blocks
        kept.unpersist()
    return clean, report


@dataclass(frozen=True)
class TrainingCorpusReport:
    n_input: int
    n_after_quality: int
    n_after_repetition: int
    n_after_decontam: int
    n_after_dedup: int
    n_sequences: int


def prepare_training_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.4,
    max_dup_2gram_frac: float = 0.5,
    decontam_n: int = 8,
    jaccard_threshold: float = 0.5,
    seq_budget: int = 256,
    pack_groups: int = 8,
    max_band_bucket: int | None = 1000,
) -> tuple[DataFrame, TrainingCorpusReport]:
    """The full pre-training data pipeline, end to end:

        documents ─► quality filter (map-only)
                  ─► repetition filter (Gopher-style; explode+agg)
                  ─► PII redaction (map-only regexp chain)
                  ─► eval-set decontamination (broadcast n-gram semi)
                  ─► MinHash-LSH fuzzy dedup (best-quality survivor)
                  ─► sequence packing (per-group running totals)

    Returns (packed, report): ``packed`` has the surviving documents
    with redacted text plus (grp, seq_id, start_tok) packing
    coordinates; the report counts every stage's survivors so the
    pipeline accounts for what it dropped (the no-silent-caps rule).

    Scale shape per stage: quality/redaction pipeline with the scan;
    repetition adds one explode+aggregate pass; decontamination
    broadcasts the (small) eval n-gram set — the corpus is never
    shuffled for it; LSH shuffles (id, band) pairs with the band-bucket
    skew cap ON; packing is one shuffle by pack group. Nothing
    collects documents to the driver.
    """
    from db_cdc_poc_spark.operators.decontam import contaminated_docs
    from db_cdc_poc_spark.operators.text import (
        pack_sequences,
        redact_pii,
        repetition_features,
    )

    n_input = docs.count()

    feats = quality_features(docs, id_col=id_col, text_col=text_col).select(
        F.col("id").alias(id_col), "quality_score"
    )
    quality_kept = docs.join(feats, id_col).filter(
        F.col("quality_score") >= min_quality
    )
    n_after_quality = quality_kept.count()

    rep = repetition_features(quality_kept, id_col=id_col, text_col=text_col).select(
        F.col("id").alias(id_col), "dup_2gram_frac"
    )
    rep_kept = (
        quality_kept.join(rep, id_col)
        .filter(F.col("dup_2gram_frac") <= max_dup_2gram_frac)
        .drop("dup_2gram_frac")
    )
    n_after_repetition = rep_kept.count()

    redacted = rep_kept.drop(text_col).join(
        redact_pii(rep_kept, id_col=id_col, text_col=text_col).select(
            F.col("id").alias(id_col), F.col("clean_text").alias(text_col)
        ),
        id_col,
    )

    contaminated = contaminated_docs(
        redacted, eval_docs, id_col=id_col, text_col=text_col, n=decontam_n
    ).select(F.col("id").alias(id_col))
    decontaminated = redacted.join(
        F.broadcast(contaminated), id_col, "left_anti"
    )
    decontaminated.persist()
    try:
        n_after_decontam = decontaminated.count()

        pairs = minhash_lsh_pairs(
            decontaminated,
            id_col=id_col,
            text_col=text_col,
            threshold=jaccard_threshold,
            max_bucket_size=max_band_bucket,
        )
        deduped = dedup_fuzzy(
            decontaminated,
            pairs,
            id_col=id_col,
            keep="best_quality",
            quality_col="quality_score",
        )
        packed = deduped.join(
            pack_sequences(
                deduped,
                budget=seq_budget,
                num_groups=pack_groups,
                id_col=id_col,
                text_col=text_col,
            ).select(
                F.col("id").alias(id_col), "grp", "seq_id", "start_tok"
            ),
            id_col,
        )
        n_after_dedup = deduped.count()
        n_sequences = (
            packed.select("grp", "seq_id").distinct().count()
        )
    finally:
        decontaminated.unpersist()

    report = TrainingCorpusReport(
        n_input=n_input,
        n_after_quality=n_after_quality,
        n_after_repetition=n_after_repetition,
        n_after_decontam=n_after_decontam,
        n_after_dedup=n_after_dedup,
        n_sequences=n_sequences,
    )
    return packed, report
