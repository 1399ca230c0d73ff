"""Mini-DLT registry: declaration, LIVE-style resolution, topological
order, cycle detection, materialization."""

from __future__ import annotations

import tempfile

import pytest

from db_cdc_poc_spark.plans.registry import TableRegistry


def test_dependency_resolution_and_topo_order(spark):
    reg = TableRegistry(spark)

    @reg.table(tier="bronze")
    def base():
        return spark.range(10)

    @reg.table(tier="silver")
    def doubled():
        return reg.read("base").selectExpr("id * 2 AS id")

    @reg.table(tier="gold")
    def total():
        return reg.read("doubled").selectExpr("sum(id) AS s")

    [r] = reg.build("total").collect()
    assert r.s == 90
    order = reg.topological_order()
    assert order.index("base") < order.index("doubled") < order.index("total")
    assert reg.definition("doubled").deps == {"base"}


def test_duplicate_registration_rejected(spark):
    reg = TableRegistry(spark)

    @reg.table(name="t")
    def a():
        return spark.range(1)

    with pytest.raises(ValueError, match="already registered"):
        @reg.table(name="t")
        def b():
            return spark.range(1)


def test_cycle_detection(spark):
    reg = TableRegistry(spark)

    @reg.table()
    def x():
        return reg.read("y")

    @reg.table()
    def y():
        return reg.read("x")

    with pytest.raises(ValueError, match="cycle"):
        reg.build("x")


def test_unknown_table(spark):
    reg = TableRegistry(spark)
    with pytest.raises(KeyError, match="unknown table"):
        reg.build("nope")


def test_materialize_writes_parquet(spark):
    reg = TableRegistry(spark)

    @reg.table()
    def nums():
        return spark.range(5)

    @reg.table()
    def squares():
        return reg.read("nums").selectExpr("id", "id * id AS sq")

    root = tempfile.mkdtemp(prefix="reg_mat_")
    reg.materialize(root)
    back = spark.read.parquet(f"{root}/squares")
    assert {(r.id, r.sq) for r in back.collect()} == {(i, i * i) for i in range(5)}
