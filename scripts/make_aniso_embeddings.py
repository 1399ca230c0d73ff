"""Anisotropic embeddings fixture for the OPQ evidence run.

The round-9 verdict recorded an honest null for OPQ: the driver's
synthetic embeddings are isotropic gaussians, where NO orthogonal
rotation can beat identity (every subspace split sees the same
energy). Real text/image embeddings are nothing like that — their
covariance is sharply low-rank (a few directions carry most of the
variance) and not axis-aligned. This script builds that shape with
numpy only:

    X = Z @ diag(sqrt(spectrum)) @ Q^T,  rows L2-normalized

* ``spectrum``: 8 leading eigenvalues at 1.0, the remaining 56 at
  0.01 — ~93% of the energy in a 12.5% subspace;
* ``Q``: a seeded random orthogonal matrix (QR of a gaussian), so the
  energy is NOT axis-aligned — coordinate-chunked PQ subspaces each
  get a mix, which is exactly the misallocation OPQ's eigenvalue
  balancing (OPQ-P, Ge et al. 2013) exists to fix;
* row normalization keeps cosine/L2 semantics comparable to the
  driver fixture (unit-ish norms, |x| << the Lloyd guard's 1024).

Output matches the driver's embeddings schema (vec_id int64,
embedding list<float>, label int32) so every engine path loads it
unchanged:

    python scripts/make_aniso_embeddings.py [out_dir] [n] [dim]
    # default .benchdata/aniso01, 2000 x 64 (the sf0.1 geometry)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else ".benchdata/aniso01")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rank = max(4, dim // 8)

    rng = np.random.RandomState(20260815)
    spectrum = np.full(dim, 0.01)
    spectrum[:rank] = 1.0
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    z = rng.randn(n, dim)
    x = (z * np.sqrt(spectrum)[None, :]) @ q.T
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    out_dir.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                (np.arange(n) % 16).astype(np.int32), type=pa.int32()
            ),
        }
    )
    pq.write_table(table, out_dir / "embeddings.parquet")
    # evidence of the anisotropy: share of energy in the top-`rank`
    # principal directions (isotropic would be rank/dim = 12.5%)
    cov = np.cov(x, rowvar=False)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
    top = float(eig[:rank].sum() / eig.sum())
    print(
        f"wrote {out_dir}/embeddings.parquet n={n} dim={dim} rank={rank} "
        f"top-{rank}-eig energy share={top:.3f}"
    )


if __name__ == "__main__":
    main()
