"""IVF-PQ operating curve: recall@5 vs scored-candidate count over
(nprobe, shortlist) for the composed residual IVF-PQ + exact-rerank
serving path (the q164/q165 shape).

The round-8 verdict's open question: the path is oracle-correct and
honestly measured at ONE operating point (nprobe=all-lists ADC top-32
rerank -> recall@5 0.60 at 2k vectors), but a user can't pick an
operating point without the curve. This sweeps the two knobs at fixed
training (m=8, k=16 codewords, nlist=16, the q163-q166 budget) and
reports, per (nprobe, shortlist):

  * recall@5 against the exact squared-L2 top-5 (self excluded) —
    the same truth leg as q166;
  * scored_candidates — the number of (query, neighbor) pairs ADC
    scores, the serving-cost proxy (each costs m LUT hits; the full
    corpus would be |Q|x|C|).

Run at two corpus sizes to show how the tradeoff moves with scale:

  python scripts/bench_pq_curve.py /root/testdata/sf0.1 .benchdata/sf1.0

Prints one JSON line per corpus: {"corpus": ..., "n": ...,
"points": [{"nprobe": p, "shortlist": s, "recall5": r,
"scored_candidates": c}, ...]}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

NPROBES = [1, 2, 4, 8, 16]
SHORTLISTS = [5, 8, 16, 32, 64]
N_QUERIES = 10
# PQ_M overrides the subspace count (default 8). With PQ_K=128 and
# PQ_M=16 the code is 112 bits — past the single-BIGINT cap — and
# pq_codes auto-selects the r13 wide array<bigint> layout; the curve
# machinery is layout-agnostic (ADC detects the pack from the dtype).
M = int(__import__("os").environ.get("PQ_M", "8"))


def curve_for(
    spark, sf_dir: str, opq: str | bool = False, stored: bool = False
) -> dict:
    from db_cdc_poc_spark.checkpointing import materialize
    from db_cdc_poc_spark.operators.similarity import norm, paired_cosine
    from db_cdc_poc_spark.operators.vector_index import (
        IvfIndex,
        exact_rerank,
        opq_rotation,
        pq_adc_topk,
        pq_codes,
        pq_train,
        rotate_vectors,
    )
    from db_cdc_poc_spark.sources.testdata import load_table

    import os

    emb = load_table(spark, sf_dir, "embeddings")
    # PQ_K overrides the fine-codebook size (default 16 = the q163-166
    # budget, 32-bit codes). The capacity sweep: recall at 20k vectors
    # needs more bits than at 2k — k=128 packs 7 bits x 8 subspaces =
    # 56-bit codes, still one BIGINT.
    k_env = os.environ.get("PQ_K")
    subspace_var = None
    if opq:
        # OPQ pre-rotation (Ge et al. OPQ-P): learned on the same
        # parameter-bounded cohort as training; orthonormal, so the
        # exact top-5 truth and the rerank leg are unchanged IN the
        # rotated space — recall deltas below are purely PQ cell
        # quality at the same bits.
        # opq == "residual": learn R on RESIDUALS of a preliminary
        # unrotated coarse pass — the distribution the residual-encoded
        # PQ stage actually quantizes (raw-trained R aligns subspaces
        # to structure the coarse quantizer already absorbed).
        cohort = emb.filter(F.col("vec_id") < 2048)
        rc = None
        if opq == "residual":
            c0, _ = pq_train(
                cohort,
                emb.filter((F.col("vec_id") % 16 == 0) & (F.col("vec_id") < 256)),
                emb.filter((F.col("vec_id") % 16 == 1) & (F.col("vec_id") < 256)),
                m=M,
                coarse_iters=2,
                pq_iters=0,
            )
            rc = spark.createDataFrame(
                [(int(r[0]), [float(x) for x in r[1]]) for r in c0.collect()],
                "list_id long, embedding array<double>",
            )
        r = opq_rotation(cohort, m=M, residual_centroids=rc)
        emb = rotate_vectors(emb, r)
    n = emb.count()
    # same training budget as q163-q166 (parameter-bounded cohort/seeds)
    if k_env is None:
        cw_seeds = emb.filter(
            (F.col("vec_id") % 16 == 1) & (F.col("vec_id") < 256)
        )
    else:
        # k odd-id seeds below 2k — still parameter-bounded, disjoint
        # from the coarse seeds (which are even)
        cw_seeds = emb.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 2 * int(k_env))
        )
    coarse, cb = pq_train(
        emb.filter(F.col("vec_id") < 2048),
        emb.filter((F.col("vec_id") % 16 == 0) & (F.col("vec_id") < 256)),
        cw_seeds,
        m=M,
        coarse_iters=2,
        pq_iters=5,
    )
    coarse_df = spark.createDataFrame(
        [(int(r[0]), [float(x) for x in r[1]]) for r in coarse.collect()],
        "list_id long, embedding array<double>",
    )
    cb_df = spark.createDataFrame(
        [(int(r[0]), [float(x) for x in r[1]]) for r in cb.collect()],
        "vec_id long, embedding array<double>",
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES)
    idx = None
    if stored:
        # --stored: the round-12 persisted serving path — codes live on
        # disk partitioned by list_id and each probe is a partition-
        # pruned scan (IvfIndex.probe_adc); recall must match the
        # inline path point-for-point (tests prove pair-for-pair; the
        # curve documents the served operating points)
        import tempfile as _tf

        idx = IvfIndex.build(
            emb,
            coarse_df.select(F.col("list_id").alias("vec_id"), "embedding"),
            path=_tf.mkdtemp(prefix="pqcurve_idx_") + "/i",
        )
        idx.build_pq(spark, cb_df, m=M)
        codes = spark.read.parquet(f"{idx.path}/pq_codes").withColumn(
            "list_id", F.col("list_id").cast("long")
        )
    else:
        codes = materialize(
            pq_codes(emb, cb_df, m=M, coarse_centroids=coarse_df),
            label="curve-codes",
        )

    # diagnostic: per-subspace variance of the FINAL residuals (the
    # distribution the PQ codewords quantize) — the balance OPQ's
    # allocation objective targets; a lopsided split is PQ's worst case
    xs = np.array(
        [r[0] for r in emb.filter(F.col("vec_id") < 2048)
         .select(F.col("embedding").cast("array<double>")).collect()]
    )
    cs = np.array([r[1] for r in coarse_df.orderBy("list_id").collect()])
    xn_ = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-12)
    cn_ = cs / np.maximum(np.linalg.norm(cs, axis=1, keepdims=True), 1e-12)
    res = xs - cs[np.argmax(xn_ @ cn_.T, axis=1)]
    dim = res.shape[1]
    sv = res.var(axis=0).reshape(M, dim // M).sum(axis=1)
    subspace_var = {
        "min": float(sv.min()),
        "max": float(sv.max()),
        "imbalance": float(sv.max() / max(sv.min(), 1e-12)),
    }

    # exact truth: squared-L2 top-5 per query, self excluded (numpy —
    # evidence script, not an engine path; the engine legs below are
    # the real operators)
    vecs = {
        int(r.vec_id): np.array(r.embedding)
        for r in emb.select("vec_id", "embedding").collect()
    }
    ids = sorted(vecs)
    pos = {i: p for p, i in enumerate(ids)}
    mat = np.stack([vecs[i] for i in ids])
    truth: dict[int, set[int]] = {}
    for q in range(N_QUERIES):
        d2 = ((mat - vecs[q][None, :]) ** 2).sum(axis=1)
        order = sorted((i for i in ids if i != q), key=lambda i: (d2[pos[i]], i))
        truth[q] = set(order[:5])

    cent = coarse_df.select(
        "list_id", F.col("embedding").alias("ce"), norm("embedding").alias("cen")
    )
    points = []
    for nprobe in NPROBES:
        wp = Window.partitionBy("query_id").orderBy(
            F.col("cos_c").desc(), F.col("list_id").asc()
        )
        probes = (
            qv.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
                norm("embedding").alias("qn"),
            )
            .crossJoin(F.broadcast(cent))
            .withColumn("cos_c", paired_cosine("qe", "ce", "qn", "cen"))
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") <= nprobe)
            .select("query_id", "list_id")
        )
        cand = probes.join(
            codes.select(F.col("vec_id").alias("neighbor_id"), "list_id"),
            "list_id",
        ).filter(F.col("query_id") != F.col("neighbor_id"))
        n_cand = cand.count()
        adc = materialize(
            idx.probe_adc(spark, qv, k_top=max(SHORTLISTS), nprobe=nprobe)
            if stored
            else pq_adc_topk(
                codes, qv, cb_df, m=M, k_top=max(SHORTLISTS),
                candidates=cand, coarse_centroids=coarse_df,
            ),
            label=f"curve-adc-{nprobe}",
        )
        for s in SHORTLISTS:
            got = exact_rerank(
                adc.filter(F.col("rank") <= s), qv, emb, k_top=5
            ).collect()
            hit = sum(
                1 for r in got if int(r.neighbor_id) in truth[int(r.query_id)]
            )
            points.append(
                {
                    "nprobe": nprobe,
                    "shortlist": s,
                    "recall5": round(hit / (5 * N_QUERIES), 3),
                    "scored_candidates": n_cand,
                }
            )
            print(
                json.dumps({"corpus": sf_dir, **points[-1]}), flush=True
            )
    return {
        "corpus": sf_dir,
        "n": n,
        "subspace_var": subspace_var,
        "points": points,
    }


def main() -> None:
    from db_cdc_poc_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opq: str | bool = False
    if "--opq-residual" in sys.argv[1:]:
        opq = "residual"
    elif "--opq" in sys.argv[1:]:
        opq = "raw"
    stored = "--stored" in sys.argv[1:]
    spark = get_spark()
    out = [
        curve_for(spark, d, opq=opq, stored=stored)
        for d in args or ["/root/testdata/sf0.1"]
    ]
    import os as _os

    for o in out:
        o["opq"] = opq
        o["stored"] = stored
        o["m"] = M
        o["k"] = int(_os.environ.get("PQ_K", "16"))
        print(json.dumps(o), flush=True)


if __name__ == "__main__":
    main()
