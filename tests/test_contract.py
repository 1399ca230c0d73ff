"""Driver-contract sanity: entry() runs, registry structure is
consistent, and aliases exist for every oracle. (Full value-level
oracle comparison runs via scripts/check_oracle.py — the driver's own
gate; these tests guard the contract's shape so a refactor can't
silently unwire it again.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from db_cdc_poc_spark import queries as Q

from .conftest import SF_DIR


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # the vast majority must be oracle-checked; rows-only is reserved
    # for genuinely SQL-inexpressible paths (xxhash64-based LSH
    # internals, float64-matmul variants)
    assert len(oracles) >= len(qs) - 6


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_query_builds_a_plan(spark):
    # building the DataFrame (no execution) catches analysis errors
    # cheaply for every registry entry, streaming ones excluded
    for name, q in Q.registry().items():
        if name.startswith("q3"):  # streaming entries execute on build
            continue
        df = q.fn(spark, SF_DIR)
        assert df.columns, name


def test_headline_queries_marked():
    heads = [n for n, q in Q.registry().items() if q.headline]
    assert len(heads) >= 5


def test_oracle_audit_artifact_matches_registry():
    """The committed ORACLE_LOCAL_r*.txt full-audit artifact must cover
    EXACTLY the current registry — one PASS line per registered query
    (VERDICT r5: the artifact lagged the registry by one query when a
    query landed after the audit ran; this pins them together so the
    evidence can't go stale silently). Regenerate with
    `python scripts/check_oracle.py > ORACLE_LOCAL_r<N>.txt` after ANY
    registry change."""
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    artifacts = sorted(
        repo.glob("ORACLE_LOCAL_r*.txt"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    assert artifacts, "no committed oracle audit artifact"
    latest = artifacts[-1]
    text = latest.read_text()
    passed = set(re.findall(r"^PASS (\S+):", text, re.M))
    rows_only = set(re.findall(r"^ok\?  (\S+):", text, re.M))
    assert "ALL GREEN" in text, f"{latest.name} is not green"
    covered = passed | rows_only
    registered = set(Q.registry())
    assert covered == registered, (
        f"{latest.name} out of sync with registry: "
        f"missing={sorted(registered - covered)} "
        f"stale={sorted(covered - registered)}"
    )


def test_check_oracle_rejects_unknown_names():
    """check_oracle.py must fail fast (exit 1, nothing run) when a
    requested query name is not in the registry — VERDICT r6 showed a
    typoed name produced a vacuous 'ALL GREEN' with exit 0."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "check_oracle.py"),
         "q999_nonexistent"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    # stable substrings, not the incidental repr of a Python list
    assert "unknown" in proc.stdout and "q999_nonexistent" in proc.stdout
    assert "ALL GREEN" not in proc.stdout
