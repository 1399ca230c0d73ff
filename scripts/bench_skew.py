"""Skewed-data scale bench (VERDICT r5 next-round #3).

`tests/test_dedup_skew.py` proves the salt/cap mechanics on synthetic
unit corpora; `make_scaled_sf.py` preserves uniform fan-out, so the
committed sf1.0/sf3.0 runs never exercised them. This script benches
the mitigation paths against their unmitigated plans ON REALISTICALLY
SKEWED DATA at sf1.0 scale (`make_scaled_sf.py --zipf`: 3 user keys
holding 30% of 1M events — ~1300x the typical key — and 1000
boilerplate documents that collide in every LSH band).

Measured (each wall-clock of a full count()/collect() action, warm —
the first run of each variant is discarded as JVM/codegen warm-up for
the sub-minute cases):

1. `skew_report` on events.user_id — the pre-flight diagnostic: shows
   the skew the mitigations respond to (top-3 share ppm).
2. fact x dim equi-join (q146 shape: events x per-user latest event
   type) as a SHUFFLE join (broadcast disabled — at 100 TB the dim
   does not broadcast; on local[32] the 15k-row dim always would,
   which would hide the skew entirely), three ways:
     a. plain SortMergeJoin, AQE skew-join OFF — the naive cluster
        plan; the 3 hot keys land on 3 reducers;
     b. plain SortMergeJoin, AQE skew-join ON — Spark's own runtime
        mitigation (splits oversized partitions, replicates the
        matching build partitions);
     c. auto_salted_join (hot keys measured then salted 32 ways,
        cold keys join plain) under the same no-broadcast confs.
3. events x customer aggregate join (q51 shape): plain vs salted_join
   (everything salted), same three confs.
4. MinHash-LSH pairs on the boilerplate corpus: uncapped (every band
   bucket self-joined — the 1000-doc hot bucket pays d^2 x 16 bands
   ~ 8M candidates) vs max_bucket_size=50 (hot buckets dropped before
   the self-join).

Writes BENCH_skew.json (one JSON line, same shape as bench.py) and
prints a markdown summary for SCALING.md.

Round-6 finding that reshaped this bench: at sf1.0-zipf the hot keys
are ~100k rows each — a single reducer sorts that in well under a
second on local[32], so the join mitigations measure as pure overhead
(plain 1.0s / AQE 0.9s / salted 1.5s) and the honest conclusion is
"at this skew, don't salt; AQE suffices". The straggler story only
appears when one key is big enough to dominate a reducer, so the join
benches also run on a second dataset (``make_scaled_sf.py --k 300
--zipf --hot-keys 1 --tables events,customer``: 30M events, 30% — 9M
rows — on ONE user) where plain-aqe_off pays a 9M-row single-task
sort+join. Even there the single-JVM shuffle is so much cheaper than
a cluster's network+disk shuffle that wall-clock deltas stay modest,
so each run ALSO reports the per-reducer row-count imbalance under
plain vs salted hash keying (murmur3+pmod, Spark's actual routing) —
the number that is invariant to cluster size and IS the 100 TB
argument.

Usage: SPARK_GRAFT_SKEW_DIR=.benchdata/sf1.0-zipf \
       SPARK_GRAFT_SKEW_HOT_DIR=.benchdata/sf30-zipf-hot1 \
       python scripts/bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from db_cdc_poc_spark.operators.cdc import latest_by_key  # noqa: E402
from db_cdc_poc_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from db_cdc_poc_spark.operators.joins import auto_salted_join, salted_join  # noqa: E402
from db_cdc_poc_spark.operators.stats import key_skew_report  # noqa: E402
from db_cdc_poc_spark.session import get_spark  # noqa: E402

SKEW_DIR = os.environ.get("SPARK_GRAFT_SKEW_DIR", ".benchdata/sf1.0-zipf")
HOT_DIR = os.environ.get("SPARK_GRAFT_SKEW_HOT_DIR", ".benchdata/sf30-zipf-hot1")
GIANT_DIR = os.environ.get("SPARK_GRAFT_GIANT_DIR", ".benchdata/sf1.0-giant")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _timed(fn, warm: bool = True) -> tuple[float, int]:
    if warm:
        fn()
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def reducer_load(df, key_cols, parts: int = 32) -> tuple[int, float]:
    """(max, median) rows per shuffle reducer if ``df`` were hash-
    partitioned on ``key_cols`` into ``parts`` partitions (murmur3 +
    pmod — Spark's HashPartitioner routing). THIS is the scale-
    transferable skew evidence: local[32]'s in-memory shuffle hides
    straggler wall-clock that a real cluster's network+disk shuffle
    pays in full, but the per-reducer row imbalance is identical at
    any cluster size."""
    row = (
        df.groupBy(F.pmod(F.hash(*key_cols), F.lit(parts)).alias("rid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.expr("percentile(n, 0.5)").alias("med"),
        )
        .first()
    )
    return int(row.mx), float(row.med)


def join_benches(spark, sdir: str, prefix: str, results: dict) -> dict:
    """Run the skew diagnostic + the two join benches (plain aqe_off /
    plain aqe_on / salted aqe_off) against one dataset dir; results are
    keyed ``{prefix}_...``. Returns the skew-report row as a dict."""
    ev = spark.read.parquet(f"{sdir}/events.parquet")
    cust = spark.read.parquet(f"{sdir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    # the diagnostic: prove the data is skewed
    rep = key_skew_report(ev, ["user_id"], top_k=3).collect()[0]
    print(f"[{prefix}] skew report: {rep.asDict()}")

    # reducer-load imbalance: plain shuffle keying vs salted keying.
    # The salted keying mirrors salted/auto_salted's hot branch: the
    # key plus a 32-way salt derived from the row id.
    mx_p, med_p = reducer_load(ev, ["user_id"])
    salted_key = ev.withColumn(
        "__salt", F.pmod(F.hash("event_id"), F.lit(32))
    )
    mx_s, med_s = reducer_load(salted_key, ["user_id", "__salt"])
    imbalance = {
        "plain_max_reducer_rows": mx_p,
        "plain_median_reducer_rows": med_p,
        "plain_imbalance_x": round(mx_p / max(med_p, 1.0), 1),
        "salted_max_reducer_rows": mx_s,
        "salted_imbalance_x": round(mx_s / max(med_s, 1.0), 1),
    }
    print(f"[{prefix}] reducer load: {imbalance}")

    dim = latest_by_key(ev, "user_id", "ts", "event_id").select(
        "user_id", F.col("event_type").alias("latest_type")
    )

    def no_broadcast():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )

    def restore():
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    def aqe_skew(on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    fact = ev.select("event_id", "user_id", "event_type")

    no_broadcast()
    try:
        # fact x dim (q146 shape)
        for label, on in (("aqe_off", False), ("aqe_on", True)):
            aqe_skew(on)
            dt, n = _timed(lambda: fact.join(dim, "user_id").count())
            results[f"{prefix}_dim_join_plain_{label}"] = round(dt, 2)
            print(f"[{prefix}] dim_join plain {label}: {dt:.2f}s ({n} rows)")
        aqe_skew(False)  # salting must not lean on AQE to look good
        dt, n = _timed(
            lambda: auto_salted_join(
                fact, dim, "user_id", salt=32, hot_threshold=10_000
            ).count()
        )
        results[f"{prefix}_dim_join_auto_salted"] = round(dt, 2)
        print(f"[{prefix}] dim_join auto_salted (aqe_off): {dt:.2f}s ({n} rows)")

        # events x customer aggregate (q51 shape)
        def agg_of(joined):
            return lambda: joined.groupBy("event_type").agg(
                F.count("*").alias("n")
            ).count()

        for label, on in (("aqe_off", False), ("aqe_on", True)):
            aqe_skew(on)
            dt, n = _timed(agg_of(ev.join(cust, "user_id")))
            results[f"{prefix}_cust_join_plain_{label}"] = round(dt, 2)
            print(f"[{prefix}] cust_join plain {label}: {dt:.2f}s")
        aqe_skew(False)
        if ev.count() <= 2_000_000:
            # full salting replicates the WHOLE dim salt× — the wrong
            # tool at a multi-million-row dim (measured 3x slower than
            # plain at zipf3's 1.5M-row customer side); only benched at
            # the small scale to document exactly that
            dt, n = _timed(agg_of(salted_join(ev, cust, "user_id", salt=32)))
            results[f"{prefix}_cust_join_salted"] = round(dt, 2)
            print(f"[{prefix}] cust_join salted (aqe_off): {dt:.2f}s")
        dt, n = _timed(
            agg_of(
                auto_salted_join(
                    ev, cust, "user_id", salt=32, hot_threshold=10_000
                )
            )
        )
        results[f"{prefix}_cust_join_auto_salted"] = round(dt, 2)
        print(f"[{prefix}] cust_join auto_salted (aqe_off): {dt:.2f}s")
    finally:
        restore()
        aqe_skew(True)
    return {
        "hot_user_rows": int(rep.max_cnt),
        "p50_rows": float(rep.p50_cnt),
        "top3_share_ppm": int(rep.top3_share_ppm),
        "reducer_load": imbalance,
    }


def registry_skew_benches(spark, results: dict) -> dict:
    """Round-6..8 operators under skew (VERDICT r9 ask #6): each
    registry query runs against the UNIFORM sf1.0 tables and the
    sf1.0-zipf tables (same row counts; 3 hot user keys, 1000-doc
    boilerplate clique sharing near-identical text, hot-domain URLs).
    The gate is skewed wall <= 2x uniform at the same SF — a hot key
    that breaks an operator's partitioning shows up as a blown ratio,
    not an absolute number (absolute walls on local[32] under-price
    stragglers; the ratio at equal volume does not)."""
    from db_cdc_poc_spark.queries import REGISTRY

    uniform = os.environ.get("SPARK_GRAFT_UNIFORM_DIR", ".benchdata/sf1.0")
    names = [
        "q147_ivf_drift",
        "q150_dsir_weights",
        "q155_remove_dup_spans",
        "q158_url_dedup",
    ]
    ratios = {}
    for name in names:
        fn = REGISTRY[name].fn
        walls = {}
        for label, sdir in (("uniform", uniform), ("zipf", SKEW_DIR)):
            dt, n = _timed(lambda: fn(spark, sdir).count())
            walls[label] = round(dt, 2)
            results[f"{name}_{label}"] = walls[label]
            print(f"[{name}] {label}: {dt:.2f}s ({n} rows)")
        ratios[name] = round(walls["zipf"] / max(walls["uniform"], 0.01), 2)
        print(f"[{name}] zipf/uniform ratio: {ratios[name]}x")
    return ratios


def giant_doc_benches(spark, results: dict) -> dict:
    """Pathological-document re-anchor (VERDICT r11 ask #1): the dedup
    family on a corpus where 5 docs are inflated to ~20,000x the median
    word length (~1.08M DISTINCT-word shingles each, plus verbatim
    neighbor pastes so giants enter the candidate set) vs the uniform
    corpus at the same row count (`make_scaled_sf.py --giant-docs`).

    Also measures the packed-verify row bound the round-11 verdict
    flagged: the exact prefix-filter verify packs each doc's distinct
    shingles into ONE array row, so the giant corpus's max row is
    max_distinct_shingles x 8 bytes. The `max_pack_shingles` cap routes
    giant-touching candidate pairs through the row-form verify instead
    — results must be IDENTICAL (asserted here), only the physical row
    bound changes. Containment is the probing measure because a doc
    pasted inside a giant is a real candidate (jaccard's size-ratio
    prune drops giant-vs-small pairs before any verify)."""
    from db_cdc_poc_spark.operators.dedup import (
        containment_pairs,
        hashed_shingle_rows,
        winnowed_fingerprints,
    )
    from db_cdc_poc_spark.queries import REGISTRY

    uniform = os.environ.get("SPARK_GRAFT_UNIFORM_DIR", ".benchdata/sf1.0")
    names = [
        "q20_ngram_jaccard",
        "q21_minhash_lsh",
        "q40_dedup_fuzzy",
        "q58_containment",
        "q66_winnowed_containment",
        "q155_remove_dup_spans",
    ]
    ratios = {}
    for name in names:
        fn = REGISTRY[name].fn
        walls = {}
        for label, sdir in (("uniform", uniform), ("giant", GIANT_DIR)):
            dt, n = _timed(lambda: fn(spark, sdir).count())
            walls[label] = round(dt, 2)
            results[f"{name}_{label}"] = walls[label]
            print(f"[{name}] {label}: {dt:.2f}s ({n} rows)")
        ratios[name] = round(walls["giant"] / max(walls["uniform"], 0.01), 2)
        print(f"[{name}] giant/uniform ratio: {ratios[name]}x")

    docs = spark.read.parquet(f"{GIANT_DIR}/documents.parquet")
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
    print(f"packed-row bound: {info}")

    def pairs(cap):
        return {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                docs, n=3, threshold=0.8, mode="prefix", max_pack_shingles=cap
            ).collect()
        }

    t0 = time.time()
    unrouted = pairs(None)  # pure array verify: giant rows ~8.6 MB
    results["giant_containment_unrouted"] = round(time.time() - t0, 2)
    t0 = time.time()
    routed = pairs(200_000)  # giants verified row-form: rows <= 1.6 MB
    results["giant_containment_routed_200k"] = round(time.time() - t0, 2)
    assert routed == unrouted, "cap routing changed the result set"
    info["containment_pairs"] = len(routed)
    print(
        f"giant containment: unrouted {results['giant_containment_unrouted']}s"
        f" vs routed(200k) {results['giant_containment_routed_200k']}s, "
        f"{len(routed)} pairs (identical sets)"
    )
    return info


def main() -> None:
    spark = get_spark(app_name="bench-skew", cpus=CPUS)
    docs = spark.read.parquet(f"{SKEW_DIR}/documents.parquet")
    results: dict[str, float] = {}

    # round-6..8 operators under skew, before the join benches (which
    # flip broadcast/AQE confs around their own timings)
    op_ratios = registry_skew_benches(spark, results)

    # round-12: the dedup family under pathological documents + the
    # packed-verify row bound (VERDICT r11 ask #1)
    giant_docs = (
        giant_doc_benches(spark, results) if Path(GIANT_DIR).exists() else None
    )

    # moderate skew: sf1.0, 30% of 1M events over 3 hot keys (~100k each)
    skew_zipf3 = join_benches(spark, SKEW_DIR, "zipf3", results)
    # giant-key skew: 10M events, 30% on ONE key (~3M rows) — the
    # straggler case where a single reducer holds 3M of 10M rows
    giant = None
    if Path(HOT_DIR).exists():
        giant = join_benches(spark, HOT_DIR, "giant1", results)

    # 4. LSH band-bucket cap (broadcast allowed — the candidate join is
    # a self-join on band hashes, not a fact-dim shape)
    t0 = time.time()
    n_uncapped = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.9
    ).count()
    results["lsh_uncapped"] = round(time.time() - t0, 2)
    print(f"lsh uncapped: {results['lsh_uncapped']}s ({n_uncapped} pairs)")
    dt, n_capped = _timed(
        lambda: minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.9, max_bucket_size=50
        ).count()
    )
    results["lsh_capped_50"] = round(dt, 2)
    print(f"lsh capped(50): {dt:.2f}s ({n_capped} pairs)")
    print(
        f"lsh pair counts: uncapped={n_uncapped} capped={n_capped} "
        f"(capped drops the boilerplate clique by design; recall tradeoff "
        f"is measured by q132's recall report, not here)"
    )

    line = {
        "metric": "skew_bench_sf1_zipf",
        "value": round(sum(results.values()), 2),
        "unit": "sec",
        "queries": results,
        "sf": 1.0,
        "skew": {
            "zipf3": skew_zipf3,
            **({"giant1": giant} if giant else {}),
            **({"giant_docs": giant_docs} if giant_docs else {}),
        },
    }
    print(json.dumps(line))
    Path("BENCH_skew.json").write_text(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
