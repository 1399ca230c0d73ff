"""Deterministically scale the driver testdata to a larger SF.

The driver ships parquet at sf{0.001,0.01,0.1} only; VERDICT r4 asked
for bench evidence at sf1.0 ("every design argument is currently proven
only at sf0.1 where everything broadcasts"). This script replicates the
sf0.1 tables K times (default 10) with referential integrity preserved:

- region/nation: copied as-is (fixed-size dims, as in TPC-H).
- customer/supplier/part/orders/lineitem/events: replica ``i`` shifts
  every primary AND foreign key by ``i * (max_key + 1)`` of its domain,
  so each replica joins onto its own replica of every dimension — join
  fan-out distributions (orders per customer, lineitems per order) are
  exactly preserved while the key domains grow 10x.
- documents: doc_id shifted; for i>0 the text gets a per-replica token
  injected every 4th word. Without this, every doc would gain 9 exact
  twins and the dedup family's pair counts would grow quadratically
  (100x pairs for 10x docs) — not how a real 10x corpus behaves. The
  injected tokens break word-shingle overlap (every 3+-gram spans one)
  and perturb the token multiset enough to move SimHash fingerprints.
- embeddings: vec_id shifted; for i>0 deterministic N(0, 0.35) noise
  (seeded by replica) is added per-dimension so replicas are not exact
  vector twins, then values stay float32.

Everything is seeded/derived — two runs produce byte-identical output.

Usage: python scripts/make_scaled_sf.py [--src /root/testdata/sf0.1]
           [--dst .benchdata/sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key_column -> (table, column) domain it belongs to; every occurrence
# of a domain key (PK or FK) is shifted by the same per-replica offset.
KEY_DOMAINS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# table -> {column: domain} for FK columns living in another table
FOREIGN = {
    "orders": {"o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
}

SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]
COPIED = ["region", "nation"]


def _domain_offsets(src: Path) -> dict[str, int]:
    """max(domain key) + 1 per key domain, read from the source tables."""
    offs: dict[str, int] = {}
    for table, cols in KEY_DOMAINS.items():
        t = pq.read_table(src / f"{table}.parquet", columns=[cols[0]])
        offs[cols[0]] = pc.max(t.column(0)).as_py() + 1
        for extra in cols[1:]:
            t = pq.read_table(src / f"{table}.parquet", columns=[extra])
            offs[extra] = pc.max(t.column(0)).as_py() + 1
    return offs


def _shift(table: pa.Table, col: str, amount: int) -> pa.Table:
    idx = table.schema.get_field_index(col)
    shifted = pc.add(table.column(idx), pa.scalar(amount, table.schema.field(idx).type))
    return table.set_column(idx, table.schema.field(idx), shifted)


def _perturb_documents(table: pa.Table, replica: int) -> pa.Table:
    texts = table.column("text").to_pylist()
    out = []
    for doc_i, txt in enumerate(texts):
        if txt is None:
            out.append(None)
            continue
        words = txt.split()
        for k in range(len(words) // 4, 0, -1):
            words.insert(k * 4, f"q{replica}p{(doc_i + k) % 97}")
        out.append(" ".join(words))
    idx = table.schema.get_field_index("text")
    table = table.set_column(idx, table.schema.field(idx), pa.array(out, pa.string()))
    # n_chars tracks the perturbed text
    n_idx = table.schema.get_field_index("n_chars")
    n = pa.array([None if t is None else len(t) for t in out],
                 table.schema.field(n_idx).type)
    return table.set_column(n_idx, table.schema.field(n_idx), n)


def _perturb_embeddings(table: pa.Table, replica: int) -> pa.Table:
    col = table.column("embedding").combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    rng = np.random.default_rng(1_000_003 * replica)
    noised = values + rng.normal(0.0, 0.35, size=values.shape).astype(np.float32)
    new = pa.ListArray.from_arrays(col.offsets, pa.array(noised, pa.float32()))
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field(idx),
                            new.cast(table.schema.field(idx).type))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=str(Path(__file__).resolve().parent.parent
                                         / ".benchdata" / "sf1.0"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)

    for name in COPIED:
        pq.write_table(pq.read_table(src / f"{name}.parquet"),
                       dst / f"{name}.parquet")
        print(f"{name}: copied")

    offsets = _domain_offsets(src)
    for name in SCALED:
        base = pq.read_table(src / f"{name}.parquet")
        own = {c: offsets[c] for c in KEY_DOMAINS.get(name, []) if c in base.column_names}
        fks = {c: offsets[d] for c, d in FOREIGN.get(name, {}).items()}
        replicas = []
        for i in range(args.k):
            t = base
            for c, off in {**own, **fks}.items():
                if i:
                    t = _shift(t, c, i * off)
            if i and name == "documents":
                t = _perturb_documents(t, i)
            if i and name == "embeddings":
                t = _perturb_embeddings(t, i)
            replicas.append(t)
        full = pa.concat_tables(replicas)
        pq.write_table(full, dst / f"{name}.parquet", row_group_size=200_000)
        print(f"{name}: {base.num_rows} -> {full.num_rows}")


if __name__ == "__main__":
    main()
