"""Deterministic sf1 fixture: scale the driver's sf0.1 tables 10x.

The driver ships sf0.001/sf0.01/sf0.1 (TESTDATA.md, seed 42, read-
only). Proving the 100x scale story one more decade needs an sf1
(~6M lineitem rows); this script synthesizes it FROM sf0.1 rather
than re-implementing the driver's generator: each output table is
``REPLICAS`` disjoint key-remapped copies of the sf0.1 table, so

- referential integrity is exact (every replica is a disjoint copy of
  the whole join graph: orders->customer, lineitem->orders/part/
  supplier, all with stride = base table row count, keeping keys
  contiguous 0..10N-1 like a natural sf1);
- per-key join fan-out, group sizes per date/status/priority, and
  filter selectivities are IDENTICAL to sf0.1 — a probe ratio between
  sf0.1 and sf1 therefore isolates data volume, not distribution
  drift;
- distinct counts of remapped keys scale exactly 10x, and embedded-
  key strings (c_name/s_name) are re-rendered from the new key so
  name-keyed queries scale like key-keyed ones.

Corpus tables get deterministic DECORRELATION so near-dup structure
scales naturally instead of every document gaining 9 cross-replica
twins:

- documents: replica i>0 applies a seeded PERMUTATION of the corpus
  vocabulary (31 distinct words at sf0.1) word-by-word. A bijection
  preserves shingle equality, so within-replica pair structure —
  exact dup groups, MinHash/Jaccard/SimHash relations — is preserved
  EXACTLY, while cross-replica similarity drops to the baseline of
  two fresh draws from the same vocabulary. Result: dup clusters
  scale 10x in COUNT, not 10x in SIZE — how a naturally larger corpus
  behaves.
- embeddings: replica i>0 applies a seeded permutation of the 64
  dimensions — norms and all WITHIN-replica distances are bit-exact,
  cross-replica cosine scrambles toward random.

region/nation stay fixed (TPC-H convention: dims don't scale).

Determinism: pure function of the sf0.1 bytes + the constants below;
no wall-clock, no unseeded RNG. Output (default
<repo>/testdata_sf1/) is gitignored — regenerate with
``python tools/make_sf1.py`` (~20 s).

Usage: python tools/make_sf1.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

# base-table row counts at sf0.1 = the key strides (keys are 0-based
# contiguous, verified against max(key)+1 of every table)
STRIDE = {
    "customer": 15_000,
    "orders": 150_000,
    "lineitem": 600_000,  # (no own key; carried for completeness)
    "part": 20_000,
    "supplier": 1_000,
    "events": 100_000,
    "events_user": 1_500,
    "documents": 5_000,
    "embeddings": 2_000,
}


def _write(con: duckdb.DuckDBPyConnection, sql: str, path: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
    )


def relational_tables(out: str, replicas: int) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({replicas})) AS i")

    _write(con, "SELECT * FROM region", f"{out}/region.parquet")
    _write(con, "SELECT * FROM nation", f"{out}/nation.parquet")
    _write(
        con,
        f"""SELECT c_custkey + i*{STRIDE['customer']} AS c_custkey,
               printf('Customer#%09d', c_custkey + i*{STRIDE['customer']}) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN reps
            ORDER BY c_custkey""",
        f"{out}/customer.parquet",
    )
    _write(
        con,
        f"""SELECT s_suppkey + i*{STRIDE['supplier']} AS s_suppkey,
               printf('Supplier#%09d', s_suppkey + i*{STRIDE['supplier']}) AS s_name,
               s_nationkey, s_acctbal
            FROM supplier CROSS JOIN reps
            ORDER BY s_suppkey""",
        f"{out}/supplier.parquet",
    )
    _write(
        con,
        f"""SELECT p_partkey + i*{STRIDE['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
            FROM part CROSS JOIN reps
            ORDER BY p_partkey""",
        f"{out}/part.parquet",
    )
    _write(
        con,
        f"""SELECT o_orderkey + i*{STRIDE['orders']} AS o_orderkey,
               o_custkey + i*{STRIDE['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders CROSS JOIN reps
            ORDER BY o_orderkey""",
        f"{out}/orders.parquet",
    )
    _write(
        con,
        f"""SELECT l_orderkey + i*{STRIDE['orders']} AS l_orderkey,
               l_partkey + i*{STRIDE['part']} AS l_partkey,
               l_suppkey + i*{STRIDE['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN reps
            ORDER BY l_orderkey, l_linenumber""",
        f"{out}/lineitem.parquet",
    )
    _write(
        con,
        f"""SELECT event_id + i*{STRIDE['events']} AS event_id, ts,
               user_id + i*{STRIDE['events_user']} AS user_id,
               event_type, value, props
            FROM events CROSS JOIN reps
            ORDER BY event_id""",
        f"{out}/events.parquet",
    )
    con.close()


def documents_table(out: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = tbl["doc_id"].to_pylist()
    text = tbl["text"].to_pylist()
    lang = tbl["lang"].to_pylist()
    source = tbl["source"].to_pylist()

    vocab = sorted({w for t in text if t is not None for w in t.split(" ")})
    ids, txts, langs, srcs, nchars = [], [], [], [], []
    for i in range(replicas):
        if i == 0:
            vmap = {w: w for w in vocab}
        else:
            perm = np.random.RandomState(2000 + i).permutation(len(vocab))
            vmap = {w: vocab[p] for w, p in zip(vocab, perm)}
        for d, t, lg, sc in zip(doc_id, text, lang, source):
            if i and t is not None:
                t = " ".join(vmap[w] for w in t.split(" "))
            ids.append(d + i * STRIDE["documents"])
            txts.append(t)
            langs.append(lg)
            srcs.append(sc)
            nchars.append(len(t) if t is not None else None)
    out_tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(txts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(nchars, pa.int64()),
        }
    )
    # Small row groups so Spark can actually SPLIT the scan: a single
    # row group is one unsplittable task however many cores exist (the
    # regex-heavy text scoring then runs serial — a fixture artifact,
    # not an engine property).
    pq.write_table(
        out_tbl, f"{out}/documents.parquet", compression="snappy",
        row_group_size=2_000,
    )


def embeddings_table(out: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    label = np.asarray(tbl["label"].to_pylist(), dtype=np.int32)
    emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]

    ids, labels, vecs = [], [], []
    for i in range(replicas):
        perm = (
            np.arange(dim)
            if i == 0
            else np.random.RandomState(1000 + i).permutation(dim)
        )
        ids.append(vec_id + i * STRIDE["embeddings"])
        labels.append(label)
        vecs.append(emb[:, perm])
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": pa.array(
                list(np.concatenate(vecs)), pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labels)),
        }
    )
    pq.write_table(
        out_tbl, f"{out}/embeddings.parquet", compression="snappy",
        row_group_size=1_000,
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    relational_tables(out, replicas)
    documents_table(out, replicas)
    embeddings_table(out, replicas)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")
    print(f"wrote {out} (replicas={replicas})")


if __name__ == "__main__":
    main()
