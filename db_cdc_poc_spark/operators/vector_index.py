"""Persisted IVF vector index: build once, probe many.

`similarity.ivf_topk` re-assigns the whole corpus to inverted lists on
every call — right for a one-shot query, wrong for a serving/recall
workload where the same 100 TB corpus answers many query batches. This
module persists the build products:

    <path>/centroids/            -- the coarse codebook (small parquet)
    <path>/lists/list_id=<n>/    -- corpus vectors + norms, hive-
                                    PARTITIONED by inverted list

Partitioning by ``list_id`` makes Spark's partition pruning implement
the IVF selectivity: probing ``nprobe`` of ``nlist`` lists compiles to
``PartitionFilters: [list_id IN (...)]`` — the scan never opens the
other lists' files (asserted in tests). Per-vector norms are computed
at build time and stored, so probes skip them entirely.

Build cost is one corpus pass (broadcast codebook, max_by assignment,
one partitioned write). Probe cost is |probed lists| scan + one
equi-join — no corpus shuffle. The same layout serves any number of
query batches until the corpus changes; rebuilds are full rewrites
(an incremental variant would route new vectors to their list
directory, the same append shape as `streaming/dedup_index.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.similarity import norm, paired_cosine


class IvfIndex:
    """Handle to a built index directory (see module docstring)."""

    def __init__(self, path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.path = path.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col

    # -- build ------------------------------------------------------------

    @staticmethod
    def build(
        corpus: DataFrame,
        centroids: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """One corpus pass: broadcast the codebook, assign each vector
        to its argmax-cosine list (ties to the smaller centroid id —
        same rule as ``ivf_topk``), write lists partitioned by
        ``list_id`` with norms precomputed."""
        cent = centroids.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("ce"),
            norm(vec_col).alias("cen"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(vec_col).alias("cn"),
        )
        assign = (
            c.crossJoin(F.broadcast(cent))
            .withColumn("cos_c", paired_cosine("cv", "ce", "cn", "cen"))
            .groupBy("neighbor_id")
            .agg(
                F.max_by(
                    "cid", F.struct(F.col("cos_c"), (-F.col("cid")).alias("nc"))
                ).alias("list_id")
            )
        )
        out = path.rstrip("/")
        cent.write.mode("overwrite").parquet(f"{out}/centroids")
        c.join(assign, "neighbor_id").write.partitionBy("list_id").mode(
            "overwrite"
        ).parquet(f"{out}/lists")
        return IvfIndex(out, id_col, vec_col)

    # -- incremental maintenance ------------------------------------------

    def append(self, new_vectors: DataFrame) -> None:
        """Route a batch of new vectors into the existing lists: assign
        against the STORED codebook (so earlier assignments stay valid)
        and append to the touched list partitions only — dynamic
        partition overwrite semantics are unnecessary because lists are
        append-only until a full rebuild. The codebook drifts from the
        true corpus distribution as appends accumulate; rebuild when
        recall degrades (the classic IVF maintenance tradeoff)."""
        spark = new_vectors.sparkSession
        cent = spark.read.parquet(f"{self.path}/centroids")
        c = new_vectors.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("cv"),
            norm(self.vec_col).alias("cn"),
        )
        assign = (
            c.crossJoin(F.broadcast(cent))
            .withColumn("cos_c", paired_cosine("cv", "ce", "cn", "cen"))
            .groupBy("neighbor_id")
            .agg(
                F.max_by(
                    "cid", F.struct(F.col("cos_c"), (-F.col("cid")).alias("nc"))
                ).alias("list_id")
            )
        )
        c.join(assign, "neighbor_id").write.partitionBy("list_id").mode(
            "append"
        ).parquet(f"{self.path}/lists")

    # -- probe ------------------------------------------------------------

    def probe(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
    ) -> DataFrame:
        """Top-k per query over the union of each query's ``nprobe``
        nearest lists. The probed list ids (a driver-side set bounded
        by nlist, NOT by corpus size) become an ``isin`` filter, which
        partition-prunes the lists scan; the per-query restriction is
        the (query_id, list_id) equi-join. Output matches
        ``cosine_topk``: (query_id, neighbor_id, cosine, rank)."""
        cent = spark.read.parquet(f"{self.path}/centroids")
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("qv"),
            norm(self.vec_col).alias("qn"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.col("cos_c").desc(), F.col("cid")
        )
        probes = (
            q.crossJoin(F.broadcast(cent))
            .withColumn("cos_c", paired_cosine("qv", "ce", "qn", "cen"))
            .withColumn("pr", F.row_number().over(wp))
            .filter(F.col("pr") <= nprobe)
            .select("query_id", "qv", "qn", F.col("cid").alias("list_id"))
        )
        probed_lists = sorted({r.list_id for r in probes.select("list_id").distinct().collect()})
        lists = spark.read.parquet(f"{self.path}/lists").filter(
            F.col("list_id").isin(probed_lists)
        )
        wk = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            probes.join(lists, "list_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cosine", F.round(paired_cosine("qv", "cv", "qn", "cn"), 6)
            )
            .withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
