"""Z-order (Morton curve) write layout for multi-dimensional data
skipping.

A table range-partitioned and sorted by ONE column gets tight parquet
min/max stats on that column only; filters on a second column still
scan everything. Interleaving the bits of N columns into one Morton
key and laying files out along that curve keeps EVERY interleaved
column's per-file range tight, so footer-stats pruning (Spark's
parquet row-group skipping, or any other engine reading the files)
works for filters on any of them — the standard lakehouse OPTIMIZE
ZORDER BY technique, built here from plain Spark primitives:

    repartitionByRange(z) -> sortWithinPartitions(z) -> write parquet

All arithmetic is integer-only Column expressions (shiftleft /
shiftright / bitwiseAND), so the key is engine-replayable: DuckDB
computes the identical value with the same operators, and the oracle
value-checks it.

Scale notes: repartitionByRange samples the z key to find balanced
file boundaries — one pass, one shuffle, the same cost as any global
sort-write. min/max normalization bounds come from the caller (table
stats / known domain); recomputing them inline would add a full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column from [lo, hi] onto [0, 2^bits) with exact
    integer arithmetic (floor division — identical in Spark and
    DuckDB). Values outside [lo, hi] clamp to the range ends."""
    span = max(hi - lo, 1)
    clamped = F.greatest(F.least(col.cast("long"), F.lit(hi)), F.lit(lo))
    return ((clamped - F.lit(lo)) * F.lit((1 << bits) - 1)) / F.lit(span)


def zorder_key(
    cols: dict[str, tuple[int, int]], bits: int = 16, out: str = "z"
) -> list[Column]:
    """Projection list computing the Morton key from integer columns.

    ``cols`` maps column name -> (min, max) normalization bounds (from
    table stats or the known domain). Returns [norm_0, ..., z] — use
    via the two-step select in ``with_zorder_key`` so each normalized
    column is evaluated once, not once per bit.
    """
    names = list(cols)
    norms = [
        (F.floor(_normalize(F.col(c), lo, hi, bits))).cast("long").alias(f"__n_{c}")
        for c, (lo, hi) in cols.items()
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(names):
            bit = F.shiftright(F.col(f"__n_{c}"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(names) + i))
    return norms + [z.alias(out)]


def with_zorder_key(
    df: DataFrame, cols: dict[str, tuple[int, int]], bits: int = 16, out: str = "z"
) -> DataFrame:
    """Add the Morton key column ``out`` (normalized helpers dropped).

    Two-step select: the normalized values materialize once, then the
    bit-interleave (bits x n_cols shift/and/or terms — all whole-stage
    codegen) consumes them; a single-select form would re-evaluate each
    normalization once per bit term.
    """
    exprs = zorder_key(cols, bits=bits, out=out)
    helper_names = [f"__n_{c}" for c in cols]
    return df.select("*", *exprs[:-1]).select(
        *df.columns, exprs[-1]
    ).drop(*helper_names)


def compact_parquet(
    spark,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    sort_within_by: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_bytes_per_file``
    files — the small-files compaction every streaming/incremental
    writer eventually needs (thousands of KB-sized micro-batch outputs
    turn scans into a file-listing + task-scheduling bottleneck long
    before I/O matters).

    File count = ceil(current total bytes / target); the rewrite is one
    scan + one round-robin repartition (or range partition when
    ``sort_within_by`` is given, preserving clustering for min/max
    skipping). The swap is write-to-staging + directory rename — same
    commit shape as `streaming/state.py`. Returns the new file count.

    At scale, run per PARTITION directory (store_id=..., date=...) so
    each compaction is independent and incremental; compacting an
    actively-written directory needs the table format's transaction
    log (Delta/Iceberg OPTIMIZE) — this is the parquet-directory form.
    """
    import shutil
    import tempfile
    from pathlib import Path

    src = Path(path)
    total = sum(f.stat().st_size for f in src.glob("*.parquet"))
    n_files = max(1, -(-total // target_bytes_per_file))
    df = spark.read.parquet(str(src))
    if sort_within_by is not None:
        df = df.repartitionByRange(n_files, F.col(sort_within_by)).sortWithinPartitions(
            sort_within_by
        )
    else:
        df = df.repartition(n_files)
    # stage beside the target so the commit rename stays on one
    # filesystem (same commit shape as streaming/state.py)
    staging = Path(tempfile.mkdtemp(prefix=".compact_", dir=src.parent)) / "out"
    df.write.mode("overwrite").parquet(str(staging))
    backup = src.with_name(src.name + ".pre_compact")
    src.rename(backup)
    staging.rename(src)
    shutil.rmtree(backup, ignore_errors=True)
    return len(list(src.glob("*.parquet")))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: dict[str, tuple[int, int]],
    num_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files laid out along the
    Morton curve of ``cols``: range-partition by the z key (sampled
    balanced boundaries), sort within each file, drop the key.

    Every listed column then has tight min/max footer stats per file,
    so predicate pushdown skips most files for selective filters on ANY
    of the z-ordered dimensions — see the coverage test, which reads
    the footers back and measures per-file range coverage.
    """
    keyed = with_zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
