"""Mini-DLT table registry — the engine's replacement for the
Databricks-proprietary orchestration surface (SURVEY.md §2.11;
reference: @dlt.table decorators at 03_Data_Ingestion.py:59-64,...,
LIVE.x references at 04_Current_Inventory.sql:18,25-27).

A registry entry is (name -> builder function, tier, trigger hint).
Builders declare dependencies by calling ``registry.read('other')``,
mirroring ``dlt.read``/``LIVE.other``; resolution is lazy, memoized,
and cycle-checked, so ``build()`` walks the DAG in topological order
implicitly. Everything stays a DataFrame (one logical plan end-to-end
— Catalyst sees THROUGH table boundaries and can push filters across
them) until ``materialize()`` writes parquet.

Trigger hints (`'24 hours'`, `'5 minute'`, 'continuous') are carried
as metadata: this engine runs batch/availableNow builds; a scheduler
driving per-table refresh uses the hints. That matches the reference,
where triggers are DLT pipeline config, not dataflow semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableDef:
    name: str
    builder: Callable[[], DataFrame]
    tier: str | None = None  # bronze | silver | gold
    comment: str | None = None
    trigger: str | None = None  # e.g. '24 hours', '5 minute', 'continuous'
    deps: set[str] = field(default_factory=set)
    expectations: list["Expectation"] = field(default_factory=list)


@dataclass(frozen=True)
class Expectation:
    """A DLT-style data-quality constraint on a table (the reference's
    DLT surface exposes @dlt.expect / expect_or_drop / expect_or_fail;
    the reference itself never uses them, but a migrating user will).

    ``action``: 'warn' keeps violating rows (metrics only), 'drop'
    filters them out, 'fail' raises if any row violates.
    """

    name: str
    condition: str  # SQL boolean expression over the table's columns
    action: str = "warn"  # warn | drop | fail


class ExpectationError(RuntimeError):
    """Raised when an expect_or_fail constraint is violated."""


class TableRegistry:
    """Declare tables with ``@registry.table(...)``; resolve with
    ``registry.read(name)`` inside builders; ``build(name)`` returns the
    DataFrame, building upstream tables as needed."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._defs: dict[str, TableDef] = {}
        self._built: dict[str, DataFrame] = {}
        self._building: list[str] = []  # stack, for cycle detection + dep edges
        self._observations: dict[str, object] = {}  # table -> Observation

    # -- declaration ------------------------------------------------------

    def table(
        self,
        name: str | None = None,
        tier: str | None = None,
        comment: str | None = None,
        trigger: str | None = None,
        expect: list[Expectation] | None = None,
    ):
        """Decorator registering ``fn`` as the builder of dataset
        ``name`` (default: the function name) — the engine's
        ``@dlt.table``. ``expect`` attaches data-quality constraints
        (the engine's @dlt.expect*), enforced at build time; per-build
        violation counts land in ``quality_report``."""

        def deco(fn: Callable[[], DataFrame]):
            tname = name or fn.__name__
            if tname in self._defs:
                raise ValueError(f"table {tname!r} already registered")
            self._defs[tname] = TableDef(
                name=tname,
                builder=fn,
                tier=tier,
                comment=comment,
                trigger=trigger,
                expectations=list(expect or []),
            )
            return fn

        return deco

    # -- resolution -------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        """Resolve a dependency from inside a builder (``LIVE.name``)."""
        if self._building:
            self._defs[self._building[-1]].deps.add(name)
        return self.build(name)

    def build(self, name: str) -> DataFrame:
        if name in self._built:
            return self._built[name]
        if name not in self._defs:
            raise KeyError(f"unknown table {name!r}; registered: {sorted(self._defs)}")
        if name in self._building:
            cycle = " -> ".join([*self._building, name])
            raise ValueError(f"dependency cycle: {cycle}")
        self._building.append(name)
        try:
            df = self._defs[name].builder()
        finally:
            self._building.pop()
        df = self._apply_expectations(name, df)
        self._built[name] = df
        return df

    def _apply_expectations(self, name: str, df: DataFrame) -> DataFrame:
        """Enforce the table's expectations (the engine's @dlt.expect*).

        Violation counts are attached with ``df.observe`` — they are
        computed DURING the consumer's own action, never as an extra
        pass over the data (the only scale-honest way to meter a
        100 TB flow). 'drop' filters after the metric point, so the
        report still counts what was dropped. 'fail' is the exception:
        it must decide NOW, so it pays one eager existence check
        (filter + limit(1)) at build time, exactly like DLT's
        expect_or_fail aborting the update. A constraint evaluating to
        NULL counts as a violation, matching DLT.
        """
        exps = self._defs[name].expectations
        if not exps:
            return df
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        def ok(e: Expectation):
            return F.coalesce(F.expr(e.condition).cast("boolean"), F.lit(False))

        for e in exps:
            if e.action not in ("warn", "drop", "fail"):
                raise ValueError(f"unknown expectation action {e.action!r}")
            if e.action == "fail":
                # decided eagerly on the RAW frame — before observe is
                # attached, so this limit(1) probe can't populate the
                # metrics with a partial scan
                if df.filter(~ok(e)).limit(1).count() > 0:
                    raise ExpectationError(
                        f"table {name!r}: expectation {e.name!r} violated "
                        f"({e.condition})"
                    )
        obs = Observation(f"expectations_{name}")
        df = df.observe(
            obs,
            *[
                F.sum(F.when(~ok(e), 1).otherwise(0)).cast("long").alias(e.name)
                for e in exps
            ],
        )
        self._observations[name] = obs
        for e in exps:
            if e.action == "drop":
                df = df.filter(ok(e))
        return df

    def quality_report(self, name: str) -> dict[str, int]:
        """Per-expectation violation counts for a built table. Runs one
        action if none has touched the table yet (Observation metrics
        populate as a side effect of whatever action runs first)."""
        if name not in self._observations:
            return {}
        df = self.build(name)
        obs = self._observations[name]
        df.count()  # ensure at least one action flowed past the observe
        return dict(obs.get)

    def build_all(self) -> dict[str, DataFrame]:
        return {name: self.build(name) for name in self._defs}

    # -- introspection ----------------------------------------------------

    def topological_order(self) -> list[str]:
        """Dependency-first ordering (builds everything to learn edges).

        Building is how edges are DISCOVERED (deps are recorded by
        ``read()`` calls inside builders), so this is only safe where a
        build is safe. The pipeline runner must NOT use it: builders
        can carry side effects (a streaming dedup index append, a CDC
        upsert), and running them once in ``due()`` and again in
        ``materialize()`` double-applies the trigger — the sf1 composed
        soak caught exactly that (trigger 0's batch probed against its
        own just-appended index rows flags BOTH endpoints of every
        near-dup pair). Order-only callers use :meth:`known_order`.
        """
        self.build_all()
        return self.known_order()

    def known_order(self) -> list[str]:
        """Dependency-first ordering over the edges known so far —
        never executes a builder. Before any build, edges are unknown
        and this degrades to registration order; execution order stays
        correct regardless because ``build()`` resolves dependencies
        recursively via ``read()``."""
        seen: list[str] = []
        # in-progress guard: read() records a dep edge BEFORE build()
        # raises on a cycle, so after one failed cyclic build the deps
        # sets contain both back-edges — without this, every later
        # known_order() (due(), materialize()) would recurse forever
        # instead of repeating the clear cycle error.
        in_progress: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n in in_progress:
                raise ValueError(f"dependency cycle: {n}")
            in_progress.add(n)
            for d in sorted(self._defs[n].deps):
                visit(d)
            in_progress.discard(n)
            seen.append(n)

        for n in self._defs:
            visit(n)
        return seen

    def definition(self, name: str) -> TableDef:
        return self._defs[name]

    def create_views(self, tables: list[str] | None = None) -> None:
        """Register built tables as temp views so ``spark.sql`` can
        reference them by name — the engine's ``LIVE.x`` resolution for
        SQL-defined datasets (reference: 04_Current_Inventory.sql:18,
        25-27)."""
        for name in tables if tables is not None else list(self._defs):
            self.build(name).createOrReplaceTempView(name)

    # -- materialization --------------------------------------------------

    def materialize(
        self,
        root: str,
        tables: list[str] | None = None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> None:
        """Write tables as parquet under ``root/<name>`` in dependency
        order (the engine's managed-table sink, S7).

        ``partition_by`` maps table name -> partition columns (hive-style
        directory layout). Partitioning gold/silver by a hot predicate
        column (SURVEY §4 flags ``store_id``) turns those predicates into
        PartitionFilters at scan time: Spark prunes whole directories
        before reading a byte — on a 100 TB table, a one-store query
        reads one store's files. Pick low-cardinality columns (store,
        date); high-cardinality partitioning produces a small-files
        explosion.
        """
        # known_order, not topological_order: materialize must execute
        # each wanted builder exactly ONCE (side-effectful builders —
        # index appends, upserts — are legal under the runner contract).
        # build() recursion already guarantees dependency-first
        # EXECUTION; this order only affects write sequence.
        order = self.known_order()
        wanted = set(tables) if tables is not None else set(order)
        for name in order:
            if name in wanted:
                writer = self.build(name).write.mode("overwrite")
                cols = (partition_by or {}).get(name)
                if cols:
                    writer = writer.partitionBy(*cols)
                writer.parquet(f"{root}/{name}")
