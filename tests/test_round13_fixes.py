"""Round-13 fixes (VERDICT r12 asks + ADVICE r12 items).

1. containment prefix join carries an INDEX-SIDE positional bound —
   exactness pinned on an adversarial hot-boilerplate corpus with
   asymmetric (small-doc-inside-giant) containment.
2. `_already_repartitioned` is structural: walks analyzed-plan nodes
   instead of substring-matching the plan string, and scopes the
   answer to the frame's own distribution lineage.
3. `_parse_bytes` accepts Spark's full t/tb/p/pb suffix set and falls
   back to the default instead of raising on junk.
4. bench.py garbage-collects finished queries' durable checkpoint
   waists (the sf30 disk-pressure fix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.dedup import containment_pairs
from db_cdc_poc_spark.partitioning import (
    _already_repartitioned,
    _parse_bytes,
    spread_scan,
)


# -- 1: index-side positional bound stays EXACT ------------------------------


def _brute_containment(rows, n, threshold):
    def shingles(text):
        toks = [t for t in text.split() if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in rows}
    out = set()
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            common = len(a & b)
            if common and common / min(len(a), len(b)) >= threshold:
                out.add((ids[i], ids[j]))
    return out


def test_containment_index_bound_exact_on_hot_boilerplate(spark):
    """Adversarial shape for the index-side bound: a corpus-hot
    boilerplate run shared by EVERY doc (the quadratic posting list the
    bound exists to prune) plus asymmetric containment — a small doc
    pasted verbatim inside a much larger one (Jaccard tiny, containment
    1.0). The prefix path must still equal brute force pair-for-pair."""
    hot = "terms of service apply to all content here"
    small = "unique payload alpha beta gamma delta epsilon zeta eta theta"
    texts = []
    # 40 docs sharing the hot run, each with distinct filler
    for i in range(40):
        filler = " ".join(f"w{i}x{j}" for j in range(30))
        texts.append(f"{hot} {filler}")
    # the asymmetric pair: small doc + giant doc containing it verbatim
    giant_filler = " ".join(f"g{j}" for j in range(400))
    texts.append(small)
    texts.append(f"{giant_filler} {small} {hot}")
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for threshold in (0.3, 0.8, 1.0):
        got = {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                df, n=3, threshold=threshold, mode="prefix"
            ).collect()
        }
        assert got == _brute_containment(rows, 3, threshold), threshold
    # the asymmetric pair itself survives at threshold 1.0
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(df, n=3, threshold=1.0, mode="prefix").collect()
    }
    assert (40, 41) in got


# -- 2: structural _already_repartitioned ------------------------------------


def test_already_repartitioned_ignores_lookalike_column_names(spark, tmp_path):
    """ADVICE r12: a column literally named `rebalance_flag` (or any
    name embedding 'Repartition'/'Rebalance') appears in the analyzed
    plan STRING; the structural walk must not be fooled into skipping
    a needed spread."""
    src = str(tmp_path / "lookalike")
    spark.range(5_000).selectExpr(
        "id", "id % 2 = 0 AS rebalance_flag", "id AS RepartitionCol"
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    assert not _already_repartitioned(df)
    # per_task_bytes=1 forces a wide size-scaled target so the test
    # exercises the structural detection, not the r14 size policy
    out = spread_scan(df, per_task_bytes=1)
    assert out is not df  # the spread fires despite the lookalike names
    assert out.count() == 5_000


def test_already_repartitioned_scoped_to_own_lineage(spark, tmp_path):
    """VERDICT r12 #2: a repartition buried in a JOINED branch does not
    govern the joined frame's distribution — the join sets its own —
    so it must not suppress a spread of the (narrow) joined frame."""
    fact_src = str(tmp_path / "fact")
    spark.range(5_000).selectExpr("id", "id % 50 AS k").coalesce(1).write.parquet(
        fact_src
    )
    fact = spark.read.parquet(fact_src)
    dim = (
        spark.range(50)
        .selectExpr("id AS k", "id * 10 AS dim_v")
        .repartition(8, "k")  # the unrelated-branch repartition
    )
    joined = fact.join(F.broadcast(dim), "k")
    assert not _already_repartitioned(joined)
    # per_task_bytes=1: wide size-scaled target, so the assertion tests
    # lineage scoping rather than the r14 size policy
    out = spread_scan(joined, per_task_bytes=1)
    assert out is not joined  # narrow fact scan still gets the spread
    assert out.count() == 5_000


def test_already_repartitioned_sees_through_projections(spark, tmp_path):
    """The positive case still holds through Project/Filter wrappers:
    a keyed upstream repartition governs the frame and must be left
    alone (the q26 stomp guard)."""
    src = str(tmp_path / "keyed")
    spark.range(5_000).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(src)
    keyed = (
        spark.read.parquet(src)
        .repartition(8, "id")
        .filter("v >= 0")
        .select("id", "v")
    )
    assert _already_repartitioned(keyed)
    assert spread_scan(keyed) is keyed


# -- 3: _parse_bytes full suffix set + fallback -------------------------------


def test_parse_bytes_suffixes_and_fallback():
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("1t") == 1 << 40
    assert _parse_bytes("2tb") == 2 << 40
    assert _parse_bytes("1p") == 1 << 50
    assert _parse_bytes("1pb") == 1 << 50
    # junk falls back to the default instead of raising (ADVICE r12)
    assert _parse_bytes("not-a-size") == 128 << 20
    assert _parse_bytes("not-a-size", default=7) == 7


def test_spread_scan_survives_t_suffix_conf(spark, tmp_path):
    """A session legally configured with maxPartitionBytes='1t' must
    not crash the width estimate (it parsed as int('1t') before)."""
    src = str(tmp_path / "tconf")
    spark.range(1_000).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1t")
    try:
        out = spread_scan(df)
        assert out.count() == 1_000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# -- 4: bench.py checkpoint GC ------------------------------------------------


# -- 5: lease the remaining BucketedStateTable writers ------------------------


def test_double_fired_cdc_writer_refused_and_fenced(spark, tmp_path):
    """VERDICT r12 ask #5, mirroring test_dedup_index_lease.py: the
    streaming CDC apply target's state table enforces its single-writer
    contract — a second concurrent appender is refused while the lease
    is held, and a displaced writer aborts BEFORE committing."""
    import pytest

    from db_cdc_poc_spark.streaming.cdc import CdcTarget
    from db_cdc_poc_spark.streaming.lease import (
        ConcurrentWriterError,
        WriterFencedError,
    )

    path = str(tmp_path / "cdc_state")
    a = CdcTarget(path, keys="k", sequence_by="seq")
    b = CdcTarget(path, keys="k", sequence_by="seq")

    def batch(rows):
        return spark.createDataFrame(rows, "k long, seq long, v string")

    a.state.lease.acquire()  # long-lived ingest loop holds the lease
    a.upsert_batch(batch([(1, 1, "a1")]))
    with pytest.raises(ConcurrentWriterError):
        b.upsert_batch(batch([(2, 1, "b1")]))  # double-fired writer
    # operator override fences the displaced writer before it commits
    b.state.lease.acquire(force=True)
    with pytest.raises(WriterFencedError):
        a.upsert_batch(batch([(3, 1, "a2")]))
    b.upsert_batch(batch([(2, 1, "b1")]))
    b.state.lease.release()
    got = {r.k for r in a.current(spark).collect()}
    assert got == {1, 2}  # a's fenced row 3 never landed


def test_incremental_gold_writer_leased(spark, tmp_path):
    import pytest

    from db_cdc_poc_spark.streaming.gold import IncrementalGold
    from db_cdc_poc_spark.streaming.lease import ConcurrentWriterError

    snap = spark.createDataFrame(
        [("s1", "i1", 5, "2024-01-01 00:00:00")],
        "store_id string, item_id string, quantity int, date_time_ts string",
    ).withColumn("date_time_ts", F.to_timestamp("date_time_ts"))
    gold = IncrementalGold(str(tmp_path / "gold"), snap)
    other = gold.table.lease.__class__(gold.table.lease.path)
    other.acquire()
    changes = spark.createDataFrame(
        [("s1", "i1", 3, "2024-01-02 00:00:00")],
        "store_id string, item_id string, quantity int, date_time string",
    ).withColumn("date_time", F.to_timestamp("date_time"))
    with pytest.raises(ConcurrentWriterError):
        gold.apply_changes_batch(changes)
    other.release()
    gold.apply_changes_batch(changes)  # proceeds after release
    [row] = gold.current(spark).collect()
    assert row.current_inventory == 8


def test_sequential_state_table_writers_unaffected(spark, tmp_path):
    """Per-mutation transient acquire/release: sequential instances and
    re-fires never block (the soak pattern)."""
    from db_cdc_poc_spark.streaming.state import BucketedStateTable

    t1 = BucketedStateTable(str(tmp_path / "st"), keys=["k"], num_buckets=4)
    t1.merge_batch(
        spark.createDataFrame([(1, "a")], "k long, v string"), lambda s, b: b
    )
    t2 = BucketedStateTable(str(tmp_path / "st"), keys=["k"], num_buckets=4)
    t2.append_batch(spark.createDataFrame([(2, "b")], "k long, v string"))
    assert t2.snapshot(spark) >= 1
    assert t2.state_for(spark).count() == 2


# -- ADVICE: lease corrupt-file refusal + atomic reclaim ----------------------


def test_corrupt_lease_file_refused_loudly(tmp_path):
    import pytest

    from db_cdc_poc_spark.streaming.lease import LeaseCorruptError, WriterLease

    lease_path = tmp_path / "lease.json"
    a = WriterLease(lease_path)
    a.acquire()
    a.release()
    lease_path.write_text("{not json")
    b = WriterLease(lease_path)
    with pytest.raises(LeaseCorruptError):
        b.acquire()
    with pytest.raises(LeaseCorruptError):
        b.read_state()


def test_expired_lease_reclaim_is_atomic(tmp_path):
    """ADVICE r12: two writers that concurrently see the same expired
    lease must not BOTH win token N+1 — the flock mutex serializes the
    read-modify-write, so exactly one reclaims and the other sees the
    fresh live holder."""
    import threading

    from db_cdc_poc_spark.streaming.lease import (
        ConcurrentWriterError,
        WriterLease,
    )

    lease_path = tmp_path / "lease.json"
    seed = WriterLease(lease_path, ttl=1e9)
    t0 = seed.acquire()
    # hand-expire on a foreign host (pid probing impossible there)
    seed._write({**seed.read_state(), "host": "other", "pid": 1,
                 "acquired_at": 0.0, "ttl": 1.0})

    results: list[tuple[str, object]] = []
    barrier = threading.Barrier(2)

    def contender(name):
        lease = WriterLease(lease_path, ttl=1e9)
        barrier.wait()
        try:
            results.append((name, lease.acquire()))
        except ConcurrentWriterError:
            results.append((name, "refused"))

    threads = [threading.Thread(target=contender, args=(n,)) for n in "xy"]
    [t.start() for t in threads]
    [t.join() for t in threads]
    outcomes = [v for _, v in results]
    tokens = [v for v in outcomes if isinstance(v, int)]
    assert tokens == [t0 + 1]  # exactly ONE winner, one token advance
    assert outcomes.count("refused") == 1


# -- 4 (cont): bench.py checkpoint GC -----------------------------------------


def test_bench_ckpt_gc_removes_only_new_entries(tmp_path):
    import bench

    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "pre-existing").mkdir()
    (d / "pre-existing" / "keep.txt").write_text("x")
    keep = bench._ckpt_entries(d)
    (d / "step-abc-000001").mkdir()
    (d / "step-abc-000001" / "part-0.parquet").write_bytes(b"y" * 1000)
    freed = bench._ckpt_gc(d, keep)
    assert freed == 1000
    assert (d / "pre-existing" / "keep.txt").exists()
    assert not (d / "step-abc-000001").exists()
    # no dir configured -> no-op
    assert bench._ckpt_gc(None, set()) == 0
