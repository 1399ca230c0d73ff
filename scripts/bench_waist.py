"""Waist-storage experiment: q66/q150 wall time under three storage modes.

Round-8's sf10 run showed q66 (winnowed containment) and q150 (DSIR)
going superlinear (5.8x/5.4x wall for 3.33x data) while their plans and
row counts stayed linear. The hypothesis (SCALING.md): the
localCheckpoint waist outgrows single-box storage memory and thrashes
against execution memory. This script measures the SAME two queries
under the three `checkpointing.materialize` modes so the claim becomes
a number:

  baseline  — SPARK_GRAFT_WAIST_STORAGE=memory: the round-8 behavior
              (memory-and-disk deserialized localCheckpoint), forced,
              because the MEASURED outcome of this experiment made
              DISK_ONLY the code default for the corpus-sized waists
  disk      — SPARK_GRAFT_WAIST_STORAGE=disk (DISK_ONLY local blocks;
              the new default for these two queries — kept as an
              explicit mode so the run is self-describing)
  durable   — SPARK_GRAFT_CHECKPOINT_DIR=<tmp> (write/read parquet)

Usage:
  SPARK_GRAFT_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  python scripts/bench_waist.py /root/repo/.benchdata/sf10 [mode ...]

Prints one JSON line per (query, mode) and a final summary JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    modes = sys.argv[2:] or ["baseline", "disk", "durable"]
    queries = os.environ.get("WAIST_QUERIES", "q66_winnowed_containment,q150_dsir_weights").split(",")
    repeats = int(os.environ.get("WAIST_REPEATS", "1"))

    from db_cdc_poc_spark.session import get_spark
    from db_cdc_poc_spark.queries import REGISTRY

    spark = get_spark()
    results: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="waist-ckpt-")
    try:
        for mode in modes:
            os.environ.pop("SPARK_GRAFT_WAIST_STORAGE", None)
            os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
            if mode == "baseline":
                os.environ["SPARK_GRAFT_WAIST_STORAGE"] = "memory"
            elif mode == "disk":
                os.environ["SPARK_GRAFT_WAIST_STORAGE"] = "disk"
            elif mode == "durable":
                os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = tmp
            for name in queries:
                fn = REGISTRY[name].fn
                best = float("inf")
                rows = -1
                for _ in range(repeats):
                    spark.catalog.clearCache()
                    t0 = time.monotonic()
                    rows = fn(spark, sf_dir).count()
                    best = min(best, time.monotonic() - t0)
                results.setdefault(name, {})[mode] = round(best, 1)
                print(json.dumps({"query": name, "mode": mode, "sec": round(best, 1), "rows": rows}), flush=True)
                # durable mode accumulates parquet waists; clear between queries
                if mode == "durable":
                    for d in os.listdir(tmp):
                        shutil.rmtree(os.path.join(tmp, d), ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        os.environ.pop("SPARK_GRAFT_WAIST_STORAGE", None)
        os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    print(json.dumps({"sf_dir": sf_dir, "results": results}), flush=True)


if __name__ == "__main__":
    main()
