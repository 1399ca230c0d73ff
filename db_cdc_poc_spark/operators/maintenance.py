"""Table-maintenance planning as metadata-only DataFrame queries.

:func:`db_cdc_poc_spark.operators.layout.compact_parquet` is the
*physical* rewrite; at 100 TB the rewrite is never the hard part —
deciding WHAT to rewrite is. A lakehouse table holds millions of file
entries (Delta/Iceberg manifests, or a parquet listing), and both
compaction and scan planning start as queries over that file-stats
metadata, which is itself a DataFrame-sized problem:

* :func:`compaction_plan` — assign small files to ~target-byte
  compaction groups, independently per table partition. The
  assignment is the streaming first-fit rule ``group = floor(
  (running_bytes - bytes) / target)`` under a per-partition window
  ordered by file id: deterministic, one shuffle (by partition key),
  and every group lands within [target, target + max_file) bytes.
  Files already >= target are excluded up front — rewriting them
  wastes I/O (the reason OPTIMIZE skips right-sized files).

* :func:`file_skipping_stats` / :func:`prune_files` — the data-
  skipping index: per-file min/max/null-count for chosen columns
  (what parquet footers and Delta `stats` carry), and the planner
  query that intersects a predicate range against those bounds. A
  file survives pruning iff ``min <= hi AND max >= lo`` — the same
  interval test Spark's parquet row-group skipping and every
  manifest-based planner run; expressing it as a DataFrame query
  makes the *selectivity of the layout itself* measurable (see
  operators/layout.py: z-ordering exists precisely to shrink these
  per-file ranges).

Both are pure Column-expression plans (no UDFs), so a SQL oracle
replays them verbatim.

Reference scope note: the reference (btison/db-cdc-poc,
notebooks/pipeline.json continuous mode) leans on Databricks-managed
OPTIMIZE for this; a standalone Spark engine has to plan maintenance
itself, which is why these are first-class here.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    *,
    target_bytes: int,
    partition_cols: Sequence[str] = (),
    file_col: str = "file_name",
    size_col: str = "bytes",
    min_group_files: int = 2,
) -> DataFrame:
    """Assign sub-``target_bytes`` files to compaction groups.

    Within each table partition, files are ordered by ``file_col``
    (any deterministic order works — size-ordering would need a
    second sort and buys little once groups are ~target-sized) and
    packed first-fit by running size: a file opens a new group when
    the bytes before it have filled ``target_bytes`` since the last
    boundary. Groups with fewer than ``min_group_files`` members are
    dropped — compacting one small file into one file is a no-op
    rewrite.

    Returns one row per file to rewrite:
    ``partition_cols..., file_col, size_col, group_id`` where
    ``group_id`` is dense within its partition. Aggregate it for the
    job manifest (one compaction task per (partition, group_id)).

    Scale shape: one hash exchange on ``partition_cols`` + a
    per-partition window — no global sort, no driver collect; a
    billion-entry manifest plans in one pass. With no
    ``partition_cols`` the window is global (single reducer): fine
    for one unpartitioned directory, wrong for a whole lake — pass
    the partition columns.
    """
    parts = [F.col(c) for c in partition_cols]
    small = files.filter(F.col(size_col) < F.lit(target_bytes))
    w = (
        Window.partitionBy(*parts)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(size_col).over(w)
    with_group = small.select(
        *partition_cols,
        file_col,
        size_col,
        F.floor((cum - F.col(size_col)) / F.lit(target_bytes)).alias(
            "group_id"
        ),
    )
    counts = with_group.groupBy(*partition_cols, "group_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        with_group.join(counts, [*partition_cols, "group_id"])
        .filter(F.col("__n") >= F.lit(min_group_files))
        .drop("__n")
    )


def file_skipping_stats(
    df: DataFrame,
    *,
    file_col: str,
    stat_cols: Sequence[str],
    size_col: str | None = None,
) -> DataFrame:
    """Per-file column statistics — the data-skipping index.

    One ``groupBy(file_col)`` over the table (map-side partial
    combine, shuffle carries one row per (file, partial)) emits, per
    file: row count, optional total bytes, and per column in
    ``stat_cols`` its ``<c>_min`` / ``<c>_max`` / ``<c>_nulls``.
    This is exactly what parquet footers already store; building it
    as a table makes it joinable, diffable between snapshots, and
    queryable by the planner without touching data files.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_bytes"))
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return df.groupBy(file_col).agg(*aggs)


def interval_survives(col: str, lo, hi):
    """The skipping test as a Column: file range [col_min, col_max]
    intersects [lo, hi] (all-NULL files — col_min IS NULL — cannot
    match a range predicate and are skipped)."""
    return (
        F.col(f"{col}_min").isNotNull()
        & (F.col(f"{col}_min") <= F.lit(hi))
        & (F.col(f"{col}_max") >= F.lit(lo))
    )


def prune_files(
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Files whose ``[col_min, col_max]`` range intersects
    ``[lo, hi]`` — the candidate set a range predicate must scan.

    The complement (files skipped) never leaves the metadata layer:
    that is the entire value of min/max stats. All-NULL files
    (``col_min`` IS NULL) are kept only when they could still match —
    they can't for a range predicate, so they're pruned. Selectivity
    = surviving files / total files; measured over a z-ordered vs
    linear layout it quantifies how much the layout buys (q59's
    companion question).
    """
    return stats.filter(interval_survives(col, lo, hi))


def execute_compaction(
    spark,
    path: str,
    plan: DataFrame,
    *,
    file_col: str = "file_name",
    size_col: str = "bytes",
) -> dict:
    """Execute a :func:`compaction_plan` against a parquet directory —
    the loop-closer (plan -> compact -> re-measure with
    :func:`file_skipping_stats`): each planned group's files are read
    together, rewritten as ONE file, atomically swapped in, and the
    originals removed. Files the plan left alone are untouched.

    Group independence is the point: each (partition, group_id) is its
    own read->write->swap, so a 100 TB lake compacts incrementally —
    any prefix of groups executed leaves a fully consistent table, and
    groups parallelize across a job queue. Because the plan packs
    files in name order and range-written part files are named in
    range order, rewritten files inherit their group's clustering:
    min/max pruning keeps working on the compacted table (asserted in
    tests and measured in SCALING.md).

    The plan manifest is collected to the driver — the standard
    orchestration artifact (one task per group); its size is the
    number of files REWRITTEN this round, bounded by the maintenance
    batch, not the table.

    Returns ``{"groups": n, "files_removed": n, "files_written": n}``.
    """
    import shutil
    import tempfile
    import uuid
    from collections import defaultdict
    from pathlib import Path

    # this executor works on ONE directory: a plan built with
    # partition_cols has group_id dense only WITHIN each partition, so
    # executing it here would merge files across partitions — filter
    # the plan to one partition directory (and drop its partition
    # columns) per call, the same per-directory contract as
    # layout.compact_parquet
    extra = set(plan.columns) - {file_col, size_col, "group_id"}
    if extra:
        raise ValueError(
            f"plan carries partition columns {sorted(extra)}: execute "
            "per partition directory (filter to one partition, drop its "
            "columns) — group_id is only dense within a partition"
        )
    src = Path(path)
    groups: dict = defaultdict(list)
    for r in plan.select(file_col, "group_id").collect():
        groups[r.group_id].append(r[file_col])
    written = removed = 0
    for gid, names in sorted(groups.items()):
        member_paths = [str(src / n) for n in names]
        staging = Path(tempfile.mkdtemp(prefix=".compactg_", dir=src.parent))
        spark.read.parquet(*member_paths).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging / "out"))
        [part] = list((staging / "out").glob("part-*.parquet"))
        new_name = f"compact-{gid}-{uuid.uuid4().hex}.parquet"
        # journal BEFORE the move: a crash between the move and the
        # member unlinks would otherwise leave permanent duplicate rows
        # with no artifact to detect them. The journal names the commit
        # point (new_file present -> roll FORWARD by finishing the
        # unlinks; absent -> roll BACK by dropping the journal) —
        # :func:`recover_compaction` replays it on restart.
        journal = src / f".compact-journal-{gid}-{uuid.uuid4().hex}.json"
        # write-then-rename: a crash mid-write must leave a torn TEMP
        # file (never matched by recovery's *.json glob), not a torn
        # journal that aborts recovery of every remaining group
        journal_tmp = journal.with_suffix(".json.tmp")
        journal_tmp.write_text(
            json.dumps({"members": names, "new_file": new_name})
        )
        os.replace(journal_tmp, journal)
        # move the new file in BEFORE removing members: a reader racing
        # this sees duplicates at worst transiently; table-format logs
        # (Delta/Iceberg) make the swap properly atomic — this is the
        # plain-directory form
        shutil.move(str(part), str(src / new_name))
        crc = staging / "out" / f".{part.name}.crc"
        if crc.exists():
            shutil.move(str(crc), str(src / f".{new_name}.crc"))
        written += 1
        for m in member_paths:
            Path(m).unlink()
            mcrc = Path(m).parent / f".{Path(m).name}.crc"
            if mcrc.exists():
                mcrc.unlink()
            removed += 1
        journal.unlink()
        shutil.rmtree(staging, ignore_errors=True)
    return {"groups": len(groups), "files_removed": removed,
            "files_written": written}


def recover_compaction(path: str) -> dict:
    """Finish or roll back half-committed :func:`execute_compaction`
    groups after a crash — run BEFORE reading a directory that might
    hold an interrupted compaction.

    Each leftover ``.compact-journal-*.json`` names one group's
    members and its compacted file. The move of the compacted file is
    the commit point (an atomic rename): if it is present the group
    rolls FORWARD (unlink any members still on disk — removing the
    duplicate rows), otherwise it rolls BACK (members are intact and
    complete; just drop the journal). Idempotent — safe to re-run.

    Returns ``{"rolled_forward": n, "rolled_back": n,
    "members_removed": n}``.
    """
    from pathlib import Path

    src = Path(path)
    fwd = back = dropped = 0
    # temp journals are pre-commit by construction (the rename into the
    # *.json name IS the journal's commit): sweep them as rollbacks
    for t in sorted(src.glob(".compact-journal-*.json.tmp")):
        t.unlink()
        back += 1
    for j in sorted(src.glob(".compact-journal-*.json")):
        try:
            entry = json.loads(j.read_text())
        except (json.JSONDecodeError, UnicodeDecodeError):
            # torn journal (pre-rename crash on a writer without the
            # write-then-rename fix): the group's move provably hasn't
            # happened — the journal is written before the move — so
            # this is the rollback case, not a recovery abort
            j.unlink()
            back += 1
            continue
        if (src / entry["new_file"]).exists():
            for name in entry["members"]:
                m = src / name
                if m.exists():
                    m.unlink()
                    dropped += 1
                mcrc = src / f".{name}.crc"
                if mcrc.exists():
                    mcrc.unlink()
            fwd += 1
        else:
            back += 1
        j.unlink()
    return {"rolled_forward": fwd, "rolled_back": back,
            "members_removed": dropped}
