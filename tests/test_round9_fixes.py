"""Round-9 ADVICE fixes: reject-don't-degrade guards and the
compaction crash journal.

Each test pins one of the five round-8 ADVICE findings:
  1. pq_adc_topk refuses residual-encoded codes without coarse_centroids
  2. registrable_domain dedupes duplicate suffix rules (PSL prevailing
     order) instead of duplicating corpus rows through the join
  3. refine_centroids / pq_train reject out-of-range training vectors
     (the exact-integer Lloyd mean's |x| < 1024 contract)
  4. execute_compaction journals each group; recover_compaction rolls a
     half-committed group forward (and an uncommitted one back)
  5. pack_examples rejects duplicate / negative ids (the two-level
     prefix-sum contract)
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.vector_index import (
    pq_adc_topk,
    pq_codes,
    refine_centroids,
)


def _vecs(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_pq_adc_rejects_residual_codes_without_centroids(spark):
    corpus = _vecs(spark, [(1, [0.1, 0.2, 0.3, 0.4]), (2, [0.4, 0.3, 0.2, 0.1])])
    cb = _vecs(spark, [(10, [0.0, 0.0, 0.0, 0.0]), (11, [0.5, 0.5, 0.5, 0.5])])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])],
        "list_id long, embedding array<double>",
    )
    codes = pq_codes(corpus, cb, m=2, coarse_centroids=cents)
    assert "list_id" in codes.columns
    with pytest.raises(ValueError, match="list_id"):
        pq_adc_topk(codes, corpus, cb, m=2, k_top=1)
    # the documented escape hatch for genuinely flat codes still works
    flat = pq_codes(corpus, cb, m=2)
    assert pq_adc_topk(flat, corpus, cb, m=2, k_top=1).count() == 2


def test_registrable_domain_dedupes_duplicate_suffix_rules(spark):
    from db_cdc_poc_spark.operators.web import registrable_domain, suffix_rules

    docs = spark.createDataFrame(
        [(1, "https://a.example.co.uk/x"), (2, "https://b.example.com/")],
        "doc_id long, url string",
    )
    rules = suffix_rules(spark)
    # duplicate an existing key (full-PSL swap-in scenario): same
    # suffix twice, and once more as a conflicting exception row
    dup = rules.filter(F.col("suffix") == "co.uk")
    conflicted = rules.unionAll(dup).unionAll(
        dup.withColumn("is_exc", F.lit(True)).withColumn(
            "ps_len", F.col("ps_len") - 1
        )
    )
    out = registrable_domain(docs, rules=conflicted)
    # no corpus-row duplication through the join
    assert out.count() == 2
    got = {r.doc_id: r.domain for r in out.collect()}
    # PSL prevailing order: the exception row wins for co.uk
    assert got[1] == "example.co.uk" or got[1] == "co.uk"
    assert got[2] == "example.com"
    # and with clean rules the exact baseline answer is unchanged
    base = {r.doc_id: r.domain
            for r in registrable_domain(docs, rules=rules).collect()}
    assert base == {1: "example.co.uk", 2: "example.com"}


def test_lloyd_mean_rejects_out_of_range_vectors(spark):
    seeds = _vecs(spark, [(0, [0.0, 0.0, 0.0, 0.0])])
    train = _vecs(spark, [(1, [0.5, 0.5, 0.5, 2000.0]), (2, [0.1, 0.1, 0.1, 0.1])])
    with pytest.raises(ValueError, match="1024"):
        refine_centroids(train, seeds, "vec_id", "embedding", iters=1)
    # negative out-of-range is the actually-dangerous direction
    train_neg = _vecs(spark, [(1, [0.5, 0.5, 0.5, -2000.0])])
    with pytest.raises(ValueError, match="1024"):
        refine_centroids(train_neg, seeds, "vec_id", "embedding", iters=1)
    # in-range trains fine
    assert len(refine_centroids(
        _vecs(spark, [(1, [0.5, 0.5, 0.5, 0.5])]), seeds,
        "vec_id", "embedding", iters=1)) == 1


def test_recover_compaction_rolls_forward_and_back(spark, tmp_path):
    from db_cdc_poc_spark.operators.maintenance import recover_compaction

    path = tmp_path / "tbl"
    spark.range(100).selectExpr("id", "id % 7 AS v").repartition(4).write.parquet(
        str(path)
    )
    files = sorted(p.name for p in path.glob("*.parquet"))
    assert len(files) == 4
    total = spark.read.parquet(str(path)).agg(F.sum("v")).collect()[0][0]

    # FORWARD case: compacted file written, members NOT yet unlinked
    # (crash between move and unlinks) -> permanent duplicates today
    members = files[:2]
    new_name = "compact-0-deadbeef.parquet"
    spark.read.parquet(*[str(path / m) for m in members]).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    [part] = list((tmp_path / "stage").glob("part-*.parquet"))
    part.rename(path / new_name)
    (path / ".compact-journal-0-aa.json").write_text(
        json.dumps({"members": members, "new_file": new_name})
    )
    # duplicates are now visible — the defect recover must repair
    assert spark.read.parquet(str(path)).count() > 100

    # BACK case: journal written, crash BEFORE the move (no new file)
    (path / ".compact-journal-1-bb.json").write_text(
        json.dumps({"members": files[2:], "new_file": "compact-1-never.parquet"})
    )

    res = recover_compaction(str(path))
    assert res == {"rolled_forward": 1, "rolled_back": 1,
                   "members_removed": 2}
    # table is exactly the original data again; no journals remain
    assert spark.read.parquet(str(path)).count() == 100
    assert spark.read.parquet(str(path)).agg(F.sum("v")).collect()[0][0] == total
    assert list(path.glob(".compact-journal-*.json")) == []
    # idempotent
    assert recover_compaction(str(path)) == {
        "rolled_forward": 0, "rolled_back": 0, "members_removed": 0}


def test_pack_examples_rejects_duplicate_and_negative_ids(spark):
    from db_cdc_poc_spark.operators.text import pack_examples

    dup = spark.createDataFrame(
        [(1, "a b c"), (1, "d e f"), (2, "g")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="unique non-negative"):
        pack_examples(dup, seq_len=4).collect()
    neg = spark.createDataFrame(
        [(-1, "a b c"), (2, "g")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="unique non-negative"):
        pack_examples(neg, seq_len=4).collect()
