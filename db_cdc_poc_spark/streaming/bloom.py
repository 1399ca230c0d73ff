"""Per-version-dir Bloom summaries for append-only bucketed state.

The streaming dedup index's probe joins each micro-batch's band hashes
against the persisted band table. The state read is already bucket-
pruned, but every version dir of a touched bucket is read in full —
O(index bytes) per dense trigger, the round-9 soak's residual creep
(walls +~0.5 s/trigger at 93 MB). Version dirs are IMMUTABLE once
committed (`BucketedStateTable` commits by rename), which makes them
the perfect Bloom unit:

* at append time, the writer drops a fixed-width Bloom filter of the
  delta's keys next to its parquet (`_*_bloom.npz` — the underscore
  prefix keeps Spark's file readers from treating it as data);
* at probe time, a version dir is read ONLY if its Bloom might contain
  one of the batch's keys — a dir that provably holds no colliding key
  is skipped without touching parquet. No false negatives (the exact
  join still decides), false positives only cost an extra read.

Probe I/O therefore scales with the number of COLLISION-BEARING dirs,
not with index size: a mostly-novel batch reads almost nothing; a
duplicate-heavy batch reads the dirs its originals live in.

Fixed width (``m_bits``, default 2^21 = 256 KiB packed) is deliberate:
all versions of a table share one geometry, so a compacted snapshot's
Bloom is the bitwise OR of its source versions' Blooms — no key
re-scan, no driver traffic beyond the bitsets. Size it ~10 bits per
expected key per bucket; an overfull bucket saturates its filter and
degrades to always-read — graceful, never wrong. At 100 TB scale,
``num_buckets`` grows with state (the table's own sizing rule), which
keeps per-bucket key counts — and the filter width — flat.

Loaded filters are cached by dir path for the index's lifetime
(immutability again); a missing or torn file simply marks the dir
unprunable.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_U64 = np.uint64
BLOOM_K = 4
_SALTS = [0xD6E8FEB86659FD93, 0xA3B195354A39B70D, 0x1B03738712FAD5C9, 0x9E3779B97F4A7C15]


def _mix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — uniform bit avalanche over uint64."""
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _positions(keys: np.ndarray, i: int, m: int) -> np.ndarray:
    return (_mix(keys ^ _U64(_SALTS[i])) % _U64(m)).astype(np.int64)


class BloomFront:
    """Build / test / union per-dir Bloom filters over int64 keys."""

    def __init__(self, filename: str, m_bits: int = 1 << 21) -> None:
        if m_bits % 8:
            raise ValueError(f"m_bits must be a multiple of 8: {m_bits}")
        self.filename = filename
        self.m_bits = m_bits
        # dir-path -> unpacked bit array, or None for missing/torn/
        # foreign-geometry files (= unprunable, always read)
        self._cache: dict[str, np.ndarray | None] = {}

    # -- build -------------------------------------------------------------

    def write(self, d: Path, keys: np.ndarray) -> None:
        """Summarize ``keys`` (int64) into ``d``'s Bloom file."""
        bits = np.zeros(self.m_bits, dtype=bool)
        if keys.size:
            k = keys.astype(np.int64).astype(np.uint64)
            for i in range(BLOOM_K):
                bits[_positions(k, i, self.m_bits)] = True
        self._write_bits(d, bits)

    def union_write(self, d: Path, sources: list[Path]) -> bool:
        """Write ``d``'s Bloom as the OR of the sources' Blooms (the
        compaction path: a snapshot holds exactly its sources' rows).
        Returns False — and writes nothing, leaving ``d`` unprunable —
        if any source lacks a readable same-geometry Bloom."""
        acc = np.zeros(self.m_bits, dtype=bool)
        for s in sources:
            bits = self._load(s)
            if bits is None:
                return False
            acc |= bits
        self._write_bits(d, acc)
        return True

    def _write_bits(self, d: Path, bits: np.ndarray) -> None:
        tmp = d / f".{self.filename}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, bits=np.packbits(bits), m=np.int64(self.m_bits))
        os.replace(tmp, d / self.filename)  # torn writes never surface
        self._cache[str(d)] = bits

    # -- probe -------------------------------------------------------------

    def _load(self, d: Path) -> np.ndarray | None:
        key = str(d)
        if key not in self._cache:
            try:
                with np.load(d / self.filename) as z:
                    if int(z["m"]) != self.m_bits:
                        self._cache[key] = None  # foreign geometry
                    else:
                        self._cache[key] = (
                            np.unpackbits(z["bits"])[: self.m_bits].astype(bool)
                        )
            except Exception:
                self._cache[key] = None
        return self._cache[key]

    def loadable(self, d: Path) -> bool:
        """True iff ``d`` has a readable same-geometry Bloom (loads it
        into the cache — call before the dir might be pruned off disk)."""
        return self._load(d) is not None

    def might_contain_any(self, d: Path, keys: np.ndarray) -> bool:
        """False only when ``d`` PROVABLY holds none of ``keys``."""
        bits = self._load(d)
        if bits is None:
            return True  # unprunable: missing/torn/foreign Bloom
        if keys.size == 0:
            return False
        k = keys.astype(np.int64).astype(np.uint64)
        alive = np.ones(k.size, dtype=bool)
        for i in range(BLOOM_K):
            alive &= bits[_positions(k, i, self.m_bits)]
            if not alive.any():
                return False
        return True
