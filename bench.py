"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": s, ...}, "sf": 0.1}

Each query is forced to FULL evaluation with a checksum aggregate over
every output column (``count() + sum(xxhash64(struct(*cols)))``):
``count()`` alone lets Catalyst prune unreferenced projection columns,
so map-only queries would measure just the parquet scan, not their
feature expressions. Timings are per-query WARM wall clock: one
untimed pass first (JIT/codegen/broadcast warm-up), then the measured
passes (best of two) — matching BASELINE.md, which names the warm-session re-run as
the comparator ("Spark gold query, warm: 8.4 s"; "Compare against
warm-session numbers"). A first-run column would measure mostly
whole-stage-codegen compilation of each query's novel expression
trees, which a production pipeline pays once, not per trigger.
Per-query formatted plans are persisted next to the bench output
(``bench_plans/``) so rounds can diff plans, not just timings.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from db_cdc_poc_spark import queries as Q  # noqa: E402
from db_cdc_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else float("nan")


def _force_full_eval(df) -> int:
    """Evaluate EVERY output column: count + a checksum that references
    all columns, so Catalyst can't prune the projection work."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-insensitive, overflow-free under ANSI mode
        F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))).alias("ck"),
    ).collect()[0]
    return row["n"]


def _ckpt_dir() -> Path | None:
    d = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    return Path(d) if d else None


def _ckpt_entries(d: Path | None) -> set[str]:
    return {p.name for p in d.iterdir()} if d and d.is_dir() else set()


def _ckpt_gc(d: Path | None, keep: set[str]) -> int:
    """Delete checkpoint-step dirs created since ``keep`` was
    snapshotted. A finished query's durable waists (``materialize``
    write-then-read parquet) are garbage the moment its action
    returns — every bench pass calls the query fn fresh, so nothing
    re-reads them — but at sf30 they accumulate to ~12 GB/run and the
    first sf30 chain died on disk pressure (SCALING.md). Returns bytes
    freed so the run can report peak transient checkpoint footprint."""
    if d is None or not d.is_dir():
        return 0
    freed = 0
    for p in d.iterdir():
        if p.name in keep:
            continue
        freed += sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
        shutil.rmtree(p, ignore_errors=True)
    return freed


def main() -> None:
    spark = get_spark(app_name="db-cdc-poc-spark-bench")
    headline = {n: q for n, q in Q.registry().items() if q.headline}
    # Warm the session/codegen paths once on the smallest table so the
    # first measured query doesn't pay one-time init costs.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    plans_dir = Path(
        os.environ.get(
            "SPARK_GRAFT_PLANS_DIR", Path(__file__).resolve().parent / "bench_plans"
        )
    )
    plans_dir.mkdir(exist_ok=True)
    timings: dict[str, float] = {}
    ckpt = _ckpt_dir()
    pre_existing = _ckpt_entries(ckpt)
    peak_ckpt_bytes = 0
    for name, q in sorted(headline.items()):
        # warm-up pass: codegen/JIT/broadcast compile once, untimed
        # (the streaming entries re-stage and re-drain either way —
        # their measured pass repeats ALL work, not a cached result)
        _force_full_eval(q.fn(spark, SF_DIR))
        # best of three measured passes: long-lived local JVMs take
        # occasional multi-second stalls (context-cleaner / full-GC
        # pauses), and a shared host adds scheduling noise on top —
        # either would randomly inflate exactly one query per run;
        # min-of-N is the standard warm-timing answer
        best = float("inf")
        n = 0
        for _ in range(3):
            t0 = time.time()
            df = q.fn(spark, SF_DIR)
            n = _force_full_eval(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}.txt").write_text(plan)
        except Exception as e:  # pragma: no cover - plan capture best-effort
            print(f"# plan capture failed for {name}: {e}", file=sys.stderr)
        # Release the query's persisted blocks (localCheckpoint RDDs,
        # caches) before the next one: 23 queries' worth of retained
        # blocks otherwise accumulate in the one long-lived JVM and
        # show up as multi-second GC stalls randomly attributed to
        # later queries — a bench-harness artifact, not query cost.
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:  # pragma: no cover - cleanup best-effort
            pass
        # GC this query's durable checkpoint waists (dirs created since
        # the run started, minus pre-existing entries) so a long chain
        # never accumulates finished queries' state on disk
        peak_ckpt_bytes = max(peak_ckpt_bytes, _ckpt_gc(ckpt, pre_existing))
    total = round(sum(timings.values()), 3)
    if ckpt is not None:
        print(
            f"# checkpoint GC: peak transient footprint "
            f"{peak_ckpt_bytes / 1e9:.2f} GB under {ckpt}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
