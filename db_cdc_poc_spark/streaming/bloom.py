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

Loaded filters are cached by dir path — PACKED (m_bits/8 bytes each;
membership tests index the packed bytes directly, no unpack pass) and
behind an LRU bound (``max_entries``): filters are reloadable from
disk, so eviction is always safe, and the driver's resident cost is
capped at ``max_entries * m_bits/8`` bytes no matter how many
buckets × versions a long-lived index accumulates. A missing or torn
file simply marks the dir unprunable.
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

    def __init__(
        self, filename: str, m_bits: int = 1 << 21, max_entries: int = 512
    ) -> None:
        if m_bits % 8:
            raise ValueError(f"m_bits must be a multiple of 8: {m_bits}")
        if max_entries < 1:
            raise ValueError(f"max_entries must be >= 1: {max_entries}")
        self.filename = filename
        self.m_bits = m_bits
        # LRU bound on the driver-resident cache: at most max_entries
        # PACKED bitsets (max_entries * m_bits/8 bytes; 512 * 256 KiB =
        # 128 MiB at the default geometry). Eviction is always safe —
        # the file is immutable and reloadable; an evicted dir just
        # pays one re-read on its next probe.
        self.max_entries = max_entries
        # dir-path -> packed bit bytes (uint8), or None for missing/
        # torn/foreign-geometry files (= unprunable, always read);
        # insertion order is recency order (moved-to-end on hit)
        self._cache: dict[str, np.ndarray | None] = {}

    # -- build -------------------------------------------------------------

    def write(self, d: Path, keys: np.ndarray) -> None:
        """Summarize ``keys`` (int64) into ``d``'s Bloom file."""
        bits = np.zeros(self.m_bits, dtype=bool)
        if keys.size:
            k = keys.astype(np.int64).astype(np.uint64)
            for i in range(BLOOM_K):
                bits[_positions(k, i, self.m_bits)] = True
        self._write_bits(d, np.packbits(bits))

    def union_write(self, d: Path, sources: list[Path]) -> bool:
        """Write ``d``'s Bloom as the OR of the sources' Blooms (the
        compaction path: a snapshot holds exactly its sources' rows).
        Returns False — and writes nothing, leaving ``d`` unprunable —
        if any source lacks a readable same-geometry Bloom."""
        acc = np.zeros(self.m_bits // 8, dtype=np.uint8)
        for s in sources:
            packed = self._load(s)
            if packed is None:
                return False
            acc |= packed
        self._write_bits(d, acc)
        return True

    def _write_bits(self, d: Path, packed: np.ndarray) -> None:
        tmp = d / f".{self.filename}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, bits=packed, m=np.int64(self.m_bits))
        os.replace(tmp, d / self.filename)  # torn writes never surface
        self._remember(str(d), packed)

    # -- probe -------------------------------------------------------------

    def _remember(self, key: str, packed: np.ndarray | None) -> None:
        """Insert at the recency end, evicting the least-recently-used
        entry past ``max_entries`` (dict insertion order = LRU order)."""
        self._cache.pop(key, None)
        self._cache[key] = packed
        while len(self._cache) > self.max_entries:
            self._cache.pop(next(iter(self._cache)))

    def _load(self, d: Path) -> np.ndarray | None:
        key = str(d)
        if key in self._cache:
            packed = self._cache.pop(key)  # re-insert = touch LRU
            self._cache[key] = packed
            return packed
        try:
            with np.load(d / self.filename) as z:
                if int(z["m"]) != self.m_bits:
                    packed = None  # foreign geometry
                else:
                    packed = np.ascontiguousarray(
                        z["bits"][: self.m_bits // 8], dtype=np.uint8
                    )
        except Exception:
            packed = None
        self._remember(key, packed)
        return packed

    def loadable(self, d: Path) -> bool:
        """True iff ``d`` has a readable same-geometry Bloom (loads it
        into the cache — call before the dir might be pruned off disk)."""
        return self._load(d) is not None

    def might_contain_any(self, d: Path, keys: np.ndarray) -> bool:
        """False only when ``d`` PROVABLY holds none of ``keys``."""
        packed = self._load(d)
        if packed is None:
            return True  # unprunable: missing/torn/foreign Bloom
        if keys.size == 0:
            return False
        k = keys.astype(np.int64).astype(np.uint64)
        alive = np.ones(k.size, dtype=bool)
        for i in range(BLOOM_K):
            pos = _positions(k, i, self.m_bits)
            # test bits in the PACKED bytes directly (big-endian bit
            # order, matching np.packbits): byte pos>>3, bit 7-(pos&7)
            alive &= (
                (packed[pos >> 3] >> (7 - (pos & 7)).astype(np.uint8)) & 1
            ).astype(bool)
            if not alive.any():
                return False
        return True
