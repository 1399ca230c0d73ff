"""Driver exchange surface (S9/S10/S11) with size guards."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from db_cdc_poc_spark.sources.exchange import (
    DriverExchangeTooLarge,
    collect_rows,
    to_json_strings,
    to_pandas,
)


def test_collect_rows(spark):
    rows = collect_rows(spark.range(10))
    assert len(rows) == 10


def test_collect_rows_guard(spark):
    with pytest.raises(DriverExchangeTooLarge):
        collect_rows(spark.range(1000), max_rows=10)


def test_to_pandas(spark):
    pdf = to_pandas(spark.range(5).selectExpr("id", "id * 2 AS dbl"))
    assert isinstance(pdf, pd.DataFrame)
    assert list(pdf["dbl"]) == [0, 2, 4, 6, 8]


def test_to_json_strings_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", [1, 2])], "id long, s string, arr array<int>"
    )
    [doc] = to_json_strings(df)
    assert json.loads(doc) == {"id": 1, "s": "a", "arr": [1, 2]}
