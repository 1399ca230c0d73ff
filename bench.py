"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": s, ...}, "sf": 0.1}

Each query is executed to completion (count + a cheap collect of the
already-materialized result is avoided — we force full evaluation with
``df.count()`` via a noop write would add IO, so count() is the
measure; results are small aggregates anyway). Timings are per-query
wall clock on a warm session (the JVM/session start is excluded — the
realistic comparator per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
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


def main() -> None:
    spark = get_spark(app_name="db-cdc-poc-spark-bench")
    headline = {n: q for n, q in Q.registry().items() if q.headline}
    # Warm the session/codegen paths once on the smallest table so the
    # first measured query doesn't pay one-time init costs.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    timings: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        t0 = time.time()
        df = q.fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
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
