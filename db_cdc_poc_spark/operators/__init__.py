"""Engine operators: CDC apply, dedup (exact & fuzzy), similarity
search, text analysis, multimodal column plumbing, envelope
extraction."""

from db_cdc_poc_spark.operators.cdc import apply_changes, latest_by_key
from db_cdc_poc_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from db_cdc_poc_spark.operators.envelopes import (
    parse_cdc_envelope,
    parse_transaction_events,
)
from db_cdc_poc_spark.operators.multimodal import extract_features, frame_sample_plan
from db_cdc_poc_spark.operators.similarity import ann_topk, cosine_topk
from db_cdc_poc_spark.operators.text import lang_id, quality_features

__all__ = [
    "apply_changes",
    "latest_by_key",
    "dedup_exact",
    "embedding_neardup_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "parse_cdc_envelope",
    "parse_transaction_events",
    "extract_features",
    "frame_sample_plan",
    "ann_topk",
    "cosine_topk",
    "lang_id",
    "quality_features",
]
