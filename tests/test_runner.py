"""Trigger-aware pipeline runner (T5/R1)."""

from __future__ import annotations

import tempfile

import pytest

from db_cdc_poc_spark.plans.registry import TableRegistry
from db_cdc_poc_spark.plans.runner import PipelineRunner, parse_trigger


def test_parse_trigger():
    assert parse_trigger(None) == 0.0
    assert parse_trigger("continuous") == 0.0
    assert parse_trigger("5 minute") == 300.0
    assert parse_trigger("24 hours") == 86400.0
    with pytest.raises(ValueError):
        parse_trigger("whenever")


def test_runner_respects_trigger_cadence(spark):
    reg = TableRegistry(spark)
    builds = {"dim": 0, "gold": 0}

    @reg.table(trigger="24 hours")
    def dim():
        builds["dim"] += 1
        return spark.range(3)

    @reg.table(trigger="5 minute")
    def gold():
        builds["gold"] += 1
        return reg.read("dim").selectExpr("sum(id) AS s")

    fake_now = [0.0]
    runner = PipelineRunner(
        reg, tempfile.mkdtemp(prefix="runner_"), clock=lambda: fake_now[0]
    )

    assert set(runner.run_cycle()) == {"dim", "gold"}  # first tick: all due
    fake_now[0] = 400.0  # 6.7 min: gold due, dim not
    refreshed = runner.run_cycle()
    assert "gold" in refreshed and "dim" not in refreshed
    fake_now[0] = 500.0  # nothing due
    assert runner.run_cycle() == []
    fake_now[0] = 90000.0  # past 24h: both due
    assert set(runner.run_cycle()) == {"dim", "gold"}


def test_runner_materializes_dependency_order(spark):
    reg = TableRegistry(spark)

    @reg.table(trigger="continuous")
    def base():
        return spark.range(4)

    @reg.table(trigger="continuous")
    def derived():
        return reg.read("base").selectExpr("id * 10 AS x")

    root = tempfile.mkdtemp(prefix="runner_mat_")
    runner = PipelineRunner(reg, root, clock=lambda: 0.0)
    refreshed = runner.run_cycle()
    assert refreshed.index("base") < refreshed.index("derived")
    assert {r.x for r in spark.read.parquet(f"{root}/derived").collect()} == {
        0, 10, 20, 30,
    }
