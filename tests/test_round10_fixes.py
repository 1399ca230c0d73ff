"""Round-10 fixes.

1. `temperature_mix` water-filling redistribution: the round-9 judge's
   hypothesis run falsified the naive per-stratum clamp
   ``min(1, target·p_s/n_s)`` — when a small stratum clamps at 1.0 its
   unspent share of the target evaporated, so the operator UNDER-FILLED
   (dropping rows even at ``target ≥ corpus``). The fix allocates the
   target with the `token_budget_fill` water-filling closed form. These
   tests pin:
   - the exact 5-row falsifying example (strata a=4 / b=1, target=5),
     explicitly, without hypothesis;
   - ``target ≥ corpus`` keeps everything on a larger skewed corpus;
   - the redistribution case (100/1 rows, target 50): the kept set
     equals a pure-Python replay of water-filling + md5 draw, and the
     clamped stratum's surplus actually lands on the big stratum
     (expected-kept ≈ target, which the old clamp missed by ~7%).
"""

from __future__ import annotations

import hashlib
import math

from db_cdc_poc_spark.operators.sampling import temperature_mix

_MASK63 = (1 << 63) - 1
_BUCKETS = 1_000_000


def _bucket(doc_id: int, salt: str = "mix") -> int:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:16]
    return (int(h, 16) & _MASK63) % _BUCKETS


def _water_fill(counts: dict[str, int], target: int) -> dict[str, int]:
    """Pure-Python replay of token_budget_fill over row counts."""
    rows = [
        (n / w, s, n, w)
        for s, n in counts.items()
        for w in [math.floor(math.sqrt(n) * 1_000_000.0)]
    ]
    rows.sort(key=lambda t: (t[0], t[1]))
    tot_w = sum(w for _, _, _, w in rows)
    cum_n = cum_w = 0
    capped: dict[str, bool] = {}
    for _, s, n, w in rows:
        capped[s] = n * (tot_w - cum_w) <= (target - cum_n) * w
        cum_n += n
        cum_w += w
    num = target - sum(counts[s] for s in capped if capped[s])
    den = tot_w - sum(
        math.floor(math.sqrt(counts[s]) * 1_000_000.0)
        for s in capped
        if capped[s]
    )
    alloc = {}
    for _, s, n, w in rows:
        alloc[s] = n if capped[s] else max(0, min(n, (num * w) // den))
    return alloc


def _model_kept(rows: list[tuple[int, str]], target: int) -> set[int]:
    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    alloc = _water_fill(counts, target)
    thr = {s: (alloc[s] * _BUCKETS) // counts[s] for s in counts}
    return {i for i, s in rows if _bucket(i) < thr[s]}


def test_temperature_mix_judge_counterexample(spark):
    # the exact round-9 falsifying example: a=4 rows, b=1 row, target=5.
    # target == corpus size, so NOTHING may drop; the old clamp kept
    # stratum a with p≈0.83 and dropped row 0.
    rows = [(0, "a"), (1, "a"), (2, "a"), (3, "a"), (4, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {r.doc_id for r in temperature_mix(df, "doc_id", "source", 5).collect()}
    assert kept == {0, 1, 2, 3, 4}


def test_temperature_mix_target_at_corpus_keeps_all(spark):
    # larger, skewed: 60 + 3 + 1 rows across three strata
    rows = (
        [(i, "big") for i in range(60)]
        + [(100 + i, "mid") for i in range(3)]
        + [(200, "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for target in (64, 65, 100):
        kept = {
            r.doc_id
            for r in temperature_mix(df, "doc_id", "source", target).collect()
        }
        assert kept == {i for i, _ in rows}, f"target={target} dropped rows"


def test_temperature_mix_redistributes_clamped_surplus(spark):
    # 100-row stratum + 1-row stratum, target 50. Old clamp: the tiny
    # stratum clamps (its share of target was ~4.5 rows for 1 row) and
    # the surplus evaporated — expected kept 100·0.4545 + 1 ≈ 46.5.
    # Water-filling re-spreads it: alloc = {a: 49, b: 1}.
    rows = [(i, "a") for i in range(100)] + [(1000, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {r.doc_id for r in temperature_mix(df, "doc_id", "source", 50).collect()}

    assert _water_fill({"a": 100, "b": 1}, 50) == {"a": 49, "b": 1}
    assert kept == _model_kept(rows, 50)
    assert 1000 in kept  # clamped stratum keeps everything
    # threshold moved from the old 454545 (45.45%) to 490000 (49%)
    old_thr = math.floor(
        min(1.0, 50 * (10_000_000 / 11_000_000) / 100) * _BUCKETS
    )
    assert old_thr == 454545
    n_big_kept = len(kept) - 1
    assert n_big_kept == sum(1 for i in range(100) if _bucket(i) < 490_000)
    assert n_big_kept >= sum(1 for i in range(100) if _bucket(i) < old_thr)


def test_temperature_mix_subset_and_deterministic(spark):
    rows = [(i, "a" if i % 7 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    k1 = {r.doc_id for r in temperature_mix(df, "doc_id", "source", 10).collect()}
    k2 = {r.doc_id for r in temperature_mix(df, "doc_id", "source", 10).collect()}
    assert k1 == k2  # deterministic draw
    assert k1 <= {i for i, _ in rows}
    assert k1 == _model_kept(rows, 10)
