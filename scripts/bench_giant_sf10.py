"""Giant documents COMPOSED with scale (VERDICT r12 ask #6): the
pathological-document fixture was only ever measured at sf1 (+5 giants
at 20,000x median — max packed row 10.56 MB); this re-runs the dedup
family with the same 5 giants planted in the sf10 corpus (100x the
unit corpus, ~500k docs), where the packed-verify rows compete with
100x more ordinary shuffle traffic for executor memory.

Measures, mirroring `bench_skew.giant_doc_benches`:

* giant/uniform wall ratios for the six dedup-family queries at sf10
  (the sf1 finding to reproduce: ratios cluster around the corpus
  volume ratio — linear in the extra volume, not quadratic in the
  giant);
* the max packed row (distinct shingles x 8 B) and winnowed row on
  the giant corpus — the 16 MB `max_pack_shingles` bound must still
  hold with margin;
* the routing valve IDENTITY at a cap that actually routes the
  giants (1e6 < the giants' ~1.3M distinct shingles < the 2e6
  default): containment pairs with giants routed through the
  row-form verify must equal the unrouted packed result exactly.
  (The sf1 200k forcing experiment already priced the valve — 9.7x
  when used — so this run proves correctness-at-scale, not cost.)

Writes BENCH_skew_sf10.json.

Usage: python scripts/bench_giant_sf10.py
Env:   SPARK_GRAFT_SF10_DIR        (default .benchdata/sf10)
       SPARK_GRAFT_SF10_GIANT_DIR  (default .benchdata/sf10-giant)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from db_cdc_poc_spark.session import get_spark  # noqa: E402

UNIFORM = os.environ.get("SPARK_GRAFT_SF10_DIR", ".benchdata/sf10")
GIANT = os.environ.get("SPARK_GRAFT_SF10_GIANT_DIR", ".benchdata/sf10-giant")
NAMES = [
    "q20_ngram_jaccard",
    "q21_minhash_lsh",
    "q40_dedup_fuzzy",
    "q58_containment",
    "q66_winnowed_containment",
    "q155_remove_dup_spans",
]


def main() -> None:
    from db_cdc_poc_spark.operators.dedup import (
        containment_pairs,
        hashed_shingle_rows,
        winnowed_fingerprints,
    )
    from db_cdc_poc_spark.queries import REGISTRY

    spark = get_spark(app_name="bench-giant-sf10")
    results: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in NAMES:
        fn = REGISTRY[name].fn
        walls = {}
        for label, sdir in (("uniform", UNIFORM), ("giant", GIANT)):
            t0 = time.time()
            n = fn(spark, sdir).count()
            walls[label] = round(time.time() - t0, 2)
            results[f"{name}_{label}"] = walls[label]
            print(f"[{name}] {label}: {walls[label]:.2f}s ({n} rows)", flush=True)
        ratios[name] = round(walls["giant"] / max(walls["uniform"], 0.01), 2)
        print(f"[{name}] giant/uniform ratio: {ratios[name]}x", flush=True)

    docs = spark.read.parquet(f"{GIANT}/documents.parquet")
    sh = hashed_shingle_rows(docs, "doc_id", "text", 3)
    mx = int(sh.groupBy("id").count().agg(F.max("count")).first()[0])
    fp = winnowed_fingerprints(docs, "doc_id", "text", 3, 4)
    mxw = int(fp.groupBy("id").count().agg(F.max("count")).first()[0])
    info = {
        "max_distinct_shingles": mx,
        "max_packed_row_bytes": 8 * mx,
        "max_winnowed_fingerprints": mxw,
        "max_winnowed_row_bytes": 8 * mxw,
        "ratios": ratios,
    }
    print(f"packed-row bound (sf10 giants): {info}", flush=True)

    def pairs(cap):
        return {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                docs, n=3, threshold=0.8, mode="prefix", max_pack_shingles=cap
            ).collect()
        }

    t0 = time.time()
    unrouted = pairs(None)
    results["giant_containment_unrouted"] = round(time.time() - t0, 2)
    t0 = time.time()
    routed = pairs(1_000_000)  # giants (~1.3M shingles) route row-form
    results["giant_containment_routed_1m"] = round(time.time() - t0, 2)
    assert routed == unrouted, "cap routing changed the result set at sf10"
    info["containment_pairs"] = len(routed)
    print(
        f"sf10 giant containment: unrouted "
        f"{results['giant_containment_unrouted']}s vs routed(1e6) "
        f"{results['giant_containment_routed_1m']}s, {len(routed)} pairs "
        "(identical sets)",
        flush=True,
    )

    line = {
        "metric": "giant_docs_sf10",
        "value": round(sum(results.values()), 2),
        "unit": "sec",
        "queries": results,
        "sf": 10,
        "giant_docs_sf10": info,
    }
    print(json.dumps(line))
    Path("BENCH_skew_sf10.json").write_text(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
