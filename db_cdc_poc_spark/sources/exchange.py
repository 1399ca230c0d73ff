"""Driver exchange surface (S9/S10/S11): the three ways the reference
pulls results to the driver, wrapped with the engine's guard rails.

Reference call sites: ``collect()`` (02_Data_Generation.py:73,118),
``toPandas()`` (02:233), ``toJSON().collect()`` (02:72). All three are
driver-memory hazards at 100 TB, so every wrapper takes a row cap and
refuses unbounded pulls by default — an engine-level guard the
reference lacks. Arrow transfer is enabled session-wide
(session.RUNTIME_CONFS) so ``toPandas`` takes the columnar path.
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types

#: schemas whose Arrow LocalRelation conversion already failed once —
#: warn once per schema, not once per call.
_ARROW_FALLBACK_WARNED: set[str] = set()


class DriverExchangeTooLarge(RuntimeError):
    pass


def _guard(df: DataFrame, max_rows: int | None) -> None:
    if max_rows is None:
        return
    # limit+count is cheap: stops scanning at max_rows+1
    if df.limit(max_rows + 1).count() > max_rows:
        raise DriverExchangeTooLarge(
            f"result exceeds max_rows={max_rows}; aggregate or raise the cap"
        )


def collect_rows(df: DataFrame, max_rows: int | None = 100_000) -> list[Row]:
    """S9: ``collect()`` with a size guard."""
    _guard(df, max_rows)
    return df.collect()


def to_pandas(df: DataFrame, max_rows: int | None = 1_000_000) -> pd.DataFrame:
    """S10: Arrow-path ``toPandas()`` with a size guard."""
    _guard(df, max_rows)
    return df.toPandas()


def local_df(spark, rows, schema) -> DataFrame:
    """Driver→executor exchange: build a LOCAL RELATION from
    driver-resident rows (the inverse of :func:`to_pandas`).

    ``spark.createDataFrame(list_of_rows, schema)`` parallelizes a
    PICKLED Python RDD: the logical plan is an opaque ``LogicalRDD``
    (unknown size → never auto-broadcast, so joins against it go
    sort-merge), and EVERY scan of it — once per task, once per
    downstream re-reference — round-trips through Python workers
    (``applySchemaToPythonRDD`` in the plan). Measured on a 5k-row
    frame joined to a 200k-row table: 1.30 s/join pickled vs 0.33 s
    arrow (guide §4: eliminate the Python boundary).

    Routing the same rows through a pandas frame takes the Arrow path
    and yields a ``LocalRelation``: JVM-resident, no Python workers at
    scan time, size known to Catalyst (auto-broadcast applies). Rows
    must be driver-bounded by construction at the call site — this
    helper is for parameter-sized relations (centroids, codebooks,
    cluster maps, blocklists), not data.

    Falls back to the classic path if the Arrow conversion refuses the
    types (the fallback keeps the old semantics; pandas NaN/None
    coercion differences are why callers should pass None-free rows) —
    and WARNS once per schema when it does, because the fallback quietly
    reinstates the pickled-RDD plan and its measured 4x join cost
    (ADVICE r13: a silent perf cliff is a debugging trap).
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if rows and isinstance(rows[0], dict):
        # dict rows under integer column labels make an all-NaN frame;
        # with a nullable schema that would silently become NULL rows
        raise TypeError(
            "local_df takes sequence rows (tuple/list/Row), not dicts; "
            "pass tuples in schema field order"
        )
    try:
        # parse the DDL properly: str(schema).split(',') miscounts
        # nested commas (map<k,v>, struct<a,b>) (ADVICE r13)
        ncols = (
            len(schema.fields)
            if hasattr(schema, "fields")
            else len(types.StructType.fromDDL(schema).fields)
        )
        pdf = pd.DataFrame(rows, columns=list(range(ncols)), dtype=object)
        return spark.createDataFrame(pdf, schema)
    except Exception as e:
        key = str(schema)
        if key not in _ARROW_FALLBACK_WARNED:
            _ARROW_FALLBACK_WARNED.add(key)
            warnings.warn(
                f"local_df: Arrow LocalRelation path failed for schema "
                f"{key!r} ({type(e).__name__}: {e}); falling back to the "
                "pickled-RDD plan (opaque size, no auto-broadcast)",
                RuntimeWarning,
                stacklevel=2,
            )
        return spark.createDataFrame(rows, schema)


def to_json_strings(df: DataFrame, max_rows: int | None = 100_000) -> list[str]:
    """S11: one JSON document per row, like ``toJSON().collect()``.

    Columnar form: ``to_json(struct(*))`` stays a JVM expression, so
    serialization happens on executors, not the driver.
    """
    _guard(df, max_rows)
    out = df.select(F.to_json(F.struct(*df.columns)).alias("js"))
    return [r.js for r in out.collect()]
