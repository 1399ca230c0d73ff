"""Physical-plan audit over ALL registered queries, not just the
bench headline set.

For every ``queries()`` entry, builds the DataFrame at
``$SPARK_GRAFT_SF_DIR`` (default sf0.01 — plan SHAPE, not size, is
what is audited; size-driven flips are the one caveat, noted below)
and inspects the formatted physical plan for scale-killers:

- FAIL  CartesianProduct / BroadcastNestedLoopJoin — unless the query
        is on the documented allowlist (exact small-side baselines
        whose scale siblings exist, per VERDICT r4's plan audit).
- INFO  SinglePartition exchanges — a global sort / scalar aggregate /
        driver-bound spine is sometimes the correct plan (final top-k,
        one-row aggregates); the count is reported so growth is
        visible round-over-round.
- reported per query: exchange count, join strategies, Python
  boundary crossings (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Streaming queries whose plan can only be inspected after a run are
executed via their ``queries()`` callable like any other entry (they
all return batch DataFrames from availableNow drains).

Usage: python scripts/audit_all_plans.py [out_path]
Exit code 1 on any FAIL.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from db_cdc_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Nested-loop joins that are the documented, intentionally-exact plan
# (VERDICT r4 adjudicated both): q24's self-match-exclusion over 10
# broadcast query vectors; q97's 1-row calendar-spine cross join.
# q23/q39 are the O(n^2) exact *baselines* whose scale siblings are
# q25/q34/q41/q43 — their nested-loop is the definition of the op.
NLJ_ALLOWED = {
    "q23_embedding_neardup",
    "q24_cosine_topk",
    "q39_neardup_np",
    "q94_hard_negatives",
    "q97_gapfill_locf",
}


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else None
    spark = get_spark(app_name="audit-all-plans")
    lines: list[str] = []
    bad = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            lines.append(f"FAIL {name}: plan build error: {e}")
            bad += 1
            continue
        n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_single = plan.count("Exchange SinglePartition")
        joins = {
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cart": plan.count("CartesianProduct"),
        }
        py = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInArrow")
        )
        bad_join = joins["cart"] + joins["bnlj"]
        status = "OK"
        if bad_join and name not in NLJ_ALLOWED:
            status = "FAIL"
            bad += 1
        elif bad_join:
            status = "ALLOWED-NLJ"
        info = (
            f"exchanges={n_ex} single_partition={n_single} "
            f"bhj={joins['bhj']} smj={joins['smj']} shj={joins['shj']} "
            f"bnlj={joins['bnlj']} cart={joins['cart']} py_stages={py}"
        )
        lines.append(f"{status} {name}: {info}")
    lines.append("")
    lines.append(f"{'FAIL' if bad else 'PASS'}: {bad} failures over {len(entrymod.queries())} queries")
    text = "\n".join(lines)
    print(text)
    if out_path:
        out_path.write_text(text + "\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
