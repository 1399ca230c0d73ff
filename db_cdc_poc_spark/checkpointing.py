"""Lineage truncation with a choice of durability.

The iterative operators (union-find pointer jumping, PageRank, the
streaming dedup index, pair-stats cores referenced from several join
sides) must cut lineage every round — otherwise Catalyst re-analyzes
an ever-deeper plan and an unmaterialized upstream (a whole LSH
pipeline) re-runs once per reference. ``localCheckpoint`` does that
with EXECUTOR-LOCAL block storage: correct and cheap on one node, but
on a real cluster the truncation removes the recompute path, so one
lost executor kills a long-running job (the reference's own pipeline
is continuous — notebooks/pipeline.json:11 — so long jobs are the
design point, not the exception).

:func:`materialize` is the one chokepoint: by default it stays
``localCheckpoint`` (single-node friendly, zero extra I/O); when the
caller passes ``checkpoint_dir`` it switches to write-then-read
parquet under that directory — durable storage (HDFS/S3/ABFS in
production), so a lost executor re-READS instead of failing the job.
Write-then-read is chosen over RDD ``.checkpoint()`` deliberately:

* it stays at the DataFrame level — no RDD round-trip through Java
  serialization, data stays columnar-compressed on disk;
* the re-read is a plain parquet scan: column pruning and predicate
  pushdown still apply to downstream consumers;
* the per-step files double as an audit trail of each iteration and
  are resumable by ANY engine (the same portability argument as the
  md5-derived hashing used throughout this repo).

Every reliable step writes to a fresh subdirectory
``<checkpoint_dir>/<label>-<run>-<n>`` (a per-process run token plus a
process-wide counter — neither two operators in one run nor two runs
sharing a dir ever collide); callers own cleanup of the directory,
exactly like ``spark.sparkContext.setCheckpointDir`` semantics.
"""

from __future__ import annotations

import itertools
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["materialize"]

_step = itertools.count()
# per-process token: two RUNS (or a restart) pointing at the same
# checkpoint_dir must not collide on step names — mode("error") would
# otherwise refuse the write on a leftover directory
_RUN = uuid.uuid4().hex[:8]


def materialize(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
    label: str = "step",
    storage: str = "auto",
) -> DataFrame:
    """Truncate ``df``'s lineage.

    ``checkpoint_dir=None`` -> ``localCheckpoint(eager=eager)`` (the
    single-node default). Otherwise the DataFrame is written once as
    parquet under ``checkpoint_dir`` and read back — a RELIABLE
    checkpoint: recompute-after-executor-loss becomes a re-read from
    durable storage. The reliable path is always eager (a write is).

    ``storage`` controls WHERE the local checkpoint's blocks live:

    * ``"auto"`` — Spark's default (deserialized memory-and-disk).
      Right for small waists that several downstream stages re-read.
    * ``"disk"`` — ``StorageLevel.DISK_ONLY``. Right for waists that
      SCALE WITH THE CORPUS and are consumed once or twice by
      sequential scans (the DSIR doc-count waist, the winnowing
      fingerprint index): caching them in storage memory buys almost
      nothing but competes with execution memory — the measured cause
      of the sf10 q66/q150 superlinear step (SCALING.md "Waist
      storage at 100×"). Serialized-compact on local disk, the blocks
      cost no heap and the re-read is sequential I/O.

    Environment overrides (measurement knobs — no code edits needed):
    ``SPARK_GRAFT_CHECKPOINT_DIR`` supplies a durable directory when
    the caller passed none; ``SPARK_GRAFT_WAIST_STORAGE`` =
    ``disk``/``memory`` forces every local waist to that level.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None
    if checkpoint_dir is None:
        forced = os.environ.get("SPARK_GRAFT_WAIST_STORAGE", "").lower()
        level = {"disk": "disk", "memory": "auto"}.get(forced, storage)
        if level == "disk":
            return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
        return df.localCheckpoint(eager=eager)
    path = f"{checkpoint_dir.rstrip('/')}/{label}-{_RUN}-{next(_step):06d}"
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)
