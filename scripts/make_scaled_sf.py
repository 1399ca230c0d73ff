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

``--zipf`` additionally plants a REALISTIC hot-key distribution
(VERDICT r5 next-round #3 — the salt/cap story had only ever been
proven on synthetic unit-test corpora, never at bench scale):

- events: 30% of rows (deterministic Knuth-hash of event_id) are
  reassigned to the 3 smallest user_ids — three single-giant-keys
  (~100k rows each at sf1.0 vs ~70 typical) that a uniform fan-out
  never produces. FK validity is preserved (the hot ids are existing
  user ids).
- documents: 2% of docs (doc_id mod 50 == 7) have their text REPLACED
  by a shared ~150-word boilerplate plus 3 per-doc unique words — the
  boilerplate-page pathology that makes LSH band buckets go hot
  (every such pair has Jaccard ~0.96, so all 16 bands collide and the
  candidate join pays d^2 on a ~1000-doc bucket without the
  ``max_bucket_size`` cap).

Usage: python scripts/make_scaled_sf.py [--src /root/testdata/sf0.1]
           [--dst .benchdata/sf1.0] [--k 10] [--zipf]
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


BOILERPLATE = (
    "this website uses cookies to ensure you get the best experience on "
    "our site by continuing to browse you agree to our use of cookies and "
    "to the terms of service and the privacy policy which describe how we "
    "collect store and process your personal information including your "
    "ip address browser type and pages visited we share this data with "
    "our analytics and advertising partners who may combine it with other "
    "information you have provided to them or that they have collected "
    "from your use of their services you can withdraw consent at any time "
    "by visiting the preferences page all rights reserved unauthorized "
    "reproduction or distribution of any material from this site is "
    "strictly prohibited without prior written permission please contact "
    "support for questions about licensing subscriptions refunds or "
    "account management our office hours are monday through friday nine "
    "to five excluding public holidays thank you for visiting and enjoy "
    "the rest of your stay on this page"
)


def _zipf_events(table: pa.Table, n_hot: int = 3) -> pa.Table:
    """Reassign 30% of events to the ``n_hot`` smallest user ids,
    selected by a deterministic Knuth multiplicative hash of event_id.
    ``n_hot=1`` concentrates the whole 30% on ONE giant key — the
    straggler-killer case the salting benches need at bench scale."""
    uid = table.column("user_id").to_numpy(zero_copy_only=False)
    eid = table.column("event_id").to_numpy(zero_copy_only=False)
    hot = np.sort(np.unique(uid))[:n_hot]
    h = (eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    take = (h % np.uint64(10)) < np.uint64(3)
    new = uid.copy()
    new[take] = hot[(h[take] % np.uint64(n_hot)).astype(np.int64)]
    idx = table.schema.get_field_index("user_id")
    return table.set_column(
        idx, table.schema.field(idx), pa.array(new, table.schema.field(idx).type)
    )


def _zipf_documents(table: pa.Table) -> pa.Table:
    """Replace 2% of docs (doc_id % 50 == 7) with shared boilerplate +
    3 per-doc unique words — hot LSH band buckets by construction."""
    doc_ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    texts = table.column("text").to_pylist()
    out = []
    for did, txt in zip(doc_ids, texts):
        if txt is not None and did % 50 == 7:
            txt = f"{BOILERPLATE} unique{did}a unique{did}b unique{did}c"
        out.append(txt)
    t_idx = table.schema.get_field_index("text")
    table = table.set_column(
        t_idx, table.schema.field(t_idx), pa.array(out, pa.string())
    )
    n_idx = table.schema.get_field_index("n_chars")
    n = pa.array([None if t is None else len(t) for t in out],
                 table.schema.field(n_idx).type)
    return table.set_column(n_idx, table.schema.field(n_idx), n)


def _giant_documents(table: pa.Table, n_giant: int, mult: int) -> pa.Table:
    """Inflate the ``n_giant`` smallest doc_ids to ~``mult`` x the median
    word length — the pathological-document fixture (VERDICT r11 ask #1).

    The packed-row hazard in the exact pair verify is DISTINCT shingles,
    so the filler is a per-doc DISTINCT word soup (repetition would
    dedup away); two neighbor docs' full texts are pasted verbatim so
    giants actually enter the candidate set of the containment /
    dup-span queries instead of being all-unique islands."""
    texts = table.column("text").to_pylist()
    doc_ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    lens = sorted(len(t.split()) for t in texts if t)
    median = max(lens[len(lens) // 2], 1) if lens else 50
    target = median * mult
    chosen = set(np.sort(doc_ids)[:n_giant].tolist())
    out = []
    n_docs = len(texts)
    for i, (did, txt) in enumerate(zip(doc_ids, texts)):
        if txt is not None and did in chosen:
            nbrs = [texts[(i + 1) % n_docs] or "", texts[(i + 2) % n_docs] or ""]
            soup_n = max(
                0,
                target - len(txt.split()) - sum(len(x.split()) for x in nbrs),
            )
            soup = " ".join(f"g{did}w{j}" for j in range(soup_n))
            txt = " ".join([txt, soup, *nbrs])
        out.append(txt)
    t_idx = table.schema.get_field_index("text")
    table = table.set_column(
        t_idx, table.schema.field(t_idx), pa.array(out, pa.string())
    )
    n_idx = table.schema.get_field_index("n_chars")
    n = pa.array([None if t is None else len(t) for t in out],
                 table.schema.field(n_idx).type)
    return table.set_column(n_idx, table.schema.field(n_idx), n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=str(Path(__file__).resolve().parent.parent
                                         / ".benchdata" / "sf1.0"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--zipf", action="store_true",
                    help="plant hot keys: giant event user_ids, "
                         "boilerplate near-dup documents")
    ap.add_argument("--hot-keys", type=int, default=3,
                    help="number of hot user_ids splitting the 30%% "
                         "share under --zipf (1 = one giant key)")
    ap.add_argument("--giant-docs", type=int, default=0,
                    help="inflate this many documents to --giant-mult x "
                         "the median word length (distinct-word soup + "
                         "verbatim neighbor pastes)")
    ap.add_argument("--giant-mult", type=int, default=1000,
                    help="length multiplier for --giant-docs")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset of tables to emit "
                         "(default: all); referenced FK domains are "
                         "still offset consistently")
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    subset = set(args.tables.split(",")) if args.tables else None
    copied = [n for n in COPIED if subset is None or n in subset]
    scaled = [n for n in SCALED if subset is None or n in subset]

    for name in copied:
        pq.write_table(pq.read_table(src / f"{name}.parquet"),
                       dst / f"{name}.parquet")
        print(f"{name}: copied")

    offsets = _domain_offsets(src)
    for name in scaled:
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
        if args.zipf and name == "events":
            full = _zipf_events(full, n_hot=args.hot_keys)
        if args.zipf and name == "documents":
            full = _zipf_documents(full)
        if args.giant_docs and name == "documents":
            full = _giant_documents(full, args.giant_docs, args.giant_mult)
        pq.write_table(full, dst / f"{name}.parquet", row_group_size=200_000)
        print(f"{name}: {base.num_rows} -> {full.num_rows}")


if __name__ == "__main__":
    main()
