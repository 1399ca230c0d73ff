"""Graph operators over edge-list DataFrames — link-analysis weighting
for corpus curation, in exact integer arithmetic.

Production web-corpus pipelines weight documents by link-graph
centrality (Common Crawl ranks hosts with harmonic centrality /
PageRank and quality-filters by it). The natural Spark shape is the
classic one: the graph is an (src, dst) edge DataFrame, one power-
iteration step is ``edges JOIN ranks GROUP BY dst`` — a keyed shuffle
per iteration, no driver-side graph, no adjacency materialization —
and the driver loop only carries the iteration count.

Determinism discipline (matches the rest of the engine): ranks are
BIGINT mass units, every division is integer ``div``, every sum is an
integer sum — order-independent on any engine, so a fixed-iteration
run is bit-reproducible and the DuckDB oracle replays it by unrolling
the same iterations as chained CTEs. Floors lose mass monotonically
(total mass never grows), which bounds every intermediate:
``max_rank * damping_ppm <= N*scale*1e6 < 2^63`` by the scale choice
below.

The reference engine (btison/db-cdc-poc) has no graph surface; this
extends the LLM-pipeline family (corpus quality weighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.checkpointing import materialize

__all__ = ["pagerank", "derive_scale"]

#: 2^62 — headroom numerator for the automatic scale choice.
_HEADROOM = 1 << 62


def derive_scale(n_nodes: int) -> int:
    """Mass units per node such that no intermediate can overflow:
    ``scale = 2^62 div (N * 1e6)`` makes total mass ``N*scale <=
    2^62/1e6``, so ``rank * damping_ppm < 2^62 < 2^63`` always.
    ~4.6e12 units at N=1000; still ~46k units (4+ significant digits
    of rank resolution) at N = 100M nodes."""
    return _HEADROOM // (max(n_nodes, 1) * 1_000_000)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_ppm: int = 850_000,
    scale: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over an (src, dst) edge list.

    Per iteration, each node's next rank is::

        base + dangling_share + SUM over in-edges (u -> v) of
            ((r_u * damping_ppm) div 1e6) div outdeg_u

    with ``base = (scale * (1e6 - damping_ppm)) div 1e6`` (constant)
    and ``dangling_share = ((sum of dangling ranks) * damping_ppm div
    1e6) div N`` — the standard redistribution of sink mass, kept
    integer. Initial rank is ``scale`` for every node.

    Plan per iteration: one broadcast-or-shuffle join of ranks to
    edges + one sum-by-dst — the minimal shape; ranks are
    materialized each round so the logical plan stays flat (same
    loop hygiene as `dedup.neardup_clusters`; executor-local blocks by
    default, reliable parquet under ``checkpoint_dir`` when set — a
    long 100 TB job must survive executor loss). The driver holds
    only N and the dangling total (scalars), never rows. Fixed
    ``iterations`` rather than a convergence test keeps the result a
    pure function of the input — the property the oracle needs.

    Output: (node, rank) with ranks in mass units summing to <= N*scale.
    """
    if not 0 < damping_ppm < 1_000_000:
        raise ValueError(f"damping_ppm must be in (0, 1e6): {damping_ppm}")
    e = materialize(
        edges.select("src", "dst").distinct(), checkpoint_dir,
        eager=False, label="pr-edges",
    )
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
        eager=False,
        label="pr-nodes",
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()
    if scale is None:
        scale = derive_scale(n)
    if n * scale * 1_000_000 >= 1 << 63:
        raise ValueError(
            f"scale {scale} overflows int64 at N={n}: need N*scale*1e6 < 2^63"
            " (pass scale=None to derive a safe one)"
        )
    base = (scale * (1_000_000 - damping_ppm)) // 1_000_000
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        r_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        contrib = (
            r_deg.filter(F.col("outdeg").isNotNull())
            .select(
                F.col("node").alias("u"),
                F.expr(
                    f"((rank * {damping_ppm}L) div 1000000L) div outdeg"
                ).alias("c"),
            )
            .join(e, F.col("u") == e["src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        dangling = r_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("d_tot")
        )
        d_share = F.expr(f"((d_tot * {damping_ppm}L) div 1000000L) div {n}L")
        ranks = (
            nodes.crossJoin(F.broadcast(dangling.select(d_share.alias("ds"))))
            .join(contrib, F.col("node") == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.col("ds")
                    + F.coalesce("in_mass", F.lit(0))
                ).alias("rank"),
            )
        )
        ranks = materialize(ranks, checkpoint_dir, eager=False, label="pr-iter")
    return ranks
