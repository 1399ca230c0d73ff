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
