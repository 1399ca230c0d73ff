"""Linear bag-of-tokens text classification — the fastText-style
quality/domain classifier stage of a training-data pipeline, kept
entirely in exact integer arithmetic so every score is
engine-replayable.

Production pipelines (CCNet, fastText quality filters, FineWeb-Edu
classifiers) score every document with a linear model over sparse
token features and keep/bucket documents by the score. At 100 TB the
only viable plan is: a SMALL weight table (vocabulary-sized, ~1e5-1e7
rows) broadcast against the exploded (doc, token) rows, one sum per
document — a map-side-partial aggregate with no corpus-sized shuffle
beyond the per-doc-id combine.

The model here is the difference-of-class-rates linear scorer: each
token's weight is ``rate_ppm(token | positive) - rate_ppm(token |
negative)`` (document-frequency rates in exact integer parts-per-
million). That is the zero-hyperparameter member of the linear-model
family (the sign of a naive-Bayes log-odds weight, first-order in the
rates), and it keeps training a single aggregation pass — no
iterations, no floats, no log(). Scoring with an EXTERNALLY-trained
weight table (fastText export, logistic regression) is the same
``score_documents`` call with integer-scaled weights.

Reference parity: the reference engine (btison/db-cdc-poc) has no
classifier surface; this extends the LLM-pipeline family alongside
operators/text.py quality scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.dedup import tokens_col

__all__ = ["train_token_weights", "score_documents"]


def _doc_tokens(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool
) -> DataFrame:
    """(id, token) rows, one per DISTINCT token per document."""
    toks = tokens_col(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(toks)).alias("token"),
    )


def train_token_weights(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Train the difference-of-rates linear model: one aggregation pass
    over (doc, distinct token) rows.

    ``label`` is a boolean Column evaluated on ``df`` (e.g.
    ``F.col("lang") == "en"``). For each token seen in at least
    ``min_doc_freq`` documents::

        weight_ppm = round(1e6 * df_pos / n_pos) - round(1e6 * df_neg / n_neg)

    where ``df_pos``/``df_neg`` are the token's document frequencies in
    each class and ``n_pos``/``n_neg`` the class sizes. All quantities
    are exact integers (ratios of small integers divide identically on
    every IEEE engine, and round(x, 0) pins the result), so the weight
    table — and every downstream score — is bit-reproducible.

    Plan: class sizes are a 1-row aggregate broadcast into the per-token
    aggregation; the only corpus-sized shuffle is the (token) combine,
    with map-side partials. Output: (token, df_pos, df_neg, weight_ppm).
    """
    labeled = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text"),
        label.cast("boolean").alias("__pos"),
    )
    sizes = labeled.agg(
        F.sum(F.col("__pos").cast("long")).alias("n_pos"),
        F.sum((~F.col("__pos")).cast("long")).alias("n_neg"),
    )
    tok = _doc_tokens(labeled, "id", "__text", lowercase).join(
        labeled.select("id", "__pos"), "id"
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.col("__pos").cast("long")).alias("df_pos"),
        F.sum((~F.col("__pos")).cast("long")).alias("df_neg"),
    )
    return (
        counts.filter(F.col("df_pos") + F.col("df_neg") >= min_doc_freq)
        .crossJoin(F.broadcast(sizes))
        .select(
            "token",
            "df_pos",
            "df_neg",
            (
                F.round(F.lit(1_000_000) * F.col("df_pos") / F.col("n_pos"), 0)
                - F.round(F.lit(1_000_000) * F.col("df_neg") / F.col("n_neg"), 0)
            )
            .cast("long")
            .alias("weight_ppm"),
        )
    )


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    bias_ppm: int = 0,
) -> DataFrame:
    """Score every document with a linear bag-of-tokens model:
    ``margin_ppm = bias + sum(weight_ppm over the doc's DISTINCT
    tokens)``, predicted class = margin > 0.

    ``weights`` is any (token, weight_ppm) table — the trainer above or
    an external model export scaled to integer ppm. The weight side is
    vocabulary-sized, so Spark broadcasts it (AQE-sized; force with
    ``F.broadcast`` upstream for fixed vocabularies); documents with no
    in-vocabulary token score exactly ``bias_ppm`` (left join +
    coalesce, so no document is dropped). Integer sums are exact and
    order-independent — the 100 TB aggregation is safe.

    Output: (id_col, n_hits, margin_ppm, pred).
    """
    tok = _doc_tokens(df, id_col, text_col, lowercase)
    hits = tok.join(
        weights.select("token", "weight_ppm"), "token", "left"
    ).groupBy("id")
    scored = hits.agg(
        F.count(F.col("weight_ppm")).alias("n_hits"),
        F.coalesce(F.sum("weight_ppm"), F.lit(0)).cast("long").alias("__w"),
    )
    return (
        df.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("__w", F.lit(0)) + F.lit(int(bias_ppm)))
            .cast("long")
            .alias("margin_ppm"),
        )
        .withColumn("pred", (F.col("margin_ppm") > 0).cast("boolean"))
    )
