"""Build an Nx replica of the sf0.1 documents/embeddings tables for the
scale rehearsal (VERDICT r03 #6; factor parameterized for the r8 #5
30-50x decade) — the driver ships no sf1. Usage:

    python scripts/make_scale10.py [factor]    # default 10 -> .scale10/

Output: .scale{factor}/ (gitignored). The factor is capped at 32: the
embedding replica transform is a cyclic rotation by 6*k mod 64, which is
injective for k < 32 (gcd(6,64)=2) — beyond that, replicas would repeat
earlier rotations bit-for-bit and inject spurious exact cross-replica
duplicates, breaking the linear-dup-structure invariant below.

Replication preserves per-replica structure so linear scaling is the
CORRECT expectation:
- documents: replica k namespaces every word with 'r{k}_' — intra-replica
  shingle/dup structure is byte-for-byte isomorphic to the original (each
  replica contributes exactly the original's candidate pairs), while
  cross-replica n-gram overlap is zero. A 10x corpus therefore carries 10x
  the dup pairs, not 45x (which naive copy-with-suffix would produce, every
  copy near-dupping its siblings).
- embeddings: replica k cyclically rotates the 64 components by 6*k — norms
  and intra-replica angles are preserved exactly; cross-replica cosines
  fall back to the corpus background level.
- customer/orders/lineitem (round 13): consistent key-spine shift per
  replica (see the inline note) so TPC-H joins and the HLL distinct plane
  scale with genuine Nx fact volume; region/nation/supplier/part stay 1x
  (the dimension catalog does not grow with order volume).
Output: /root/repo/.scale10/ (gitignored).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb

import sys

SRC = Path("/root/testdata/sf0.1")
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
# documents (word namespacing), events and the orders key spine (id
# shifts) are injective at ANY factor; only the embedding rotation family
# is exhausted past 32. Beyond 32 (the 100x cc/canonical rehearsal,
# VERDICT r12 #8) embeddings copy through at 1x — documented, and none of
# the documents/orders/events-plane queries read them.
assert 2 <= REPLICAS <= 128, "replica factor out of range"
EMB_REPLICAS = min(REPLICAS, 32)
DST = Path(__file__).resolve().parent.parent / f".scale{REPLICAS}"

def main() -> None:
    DST.mkdir(exist_ok=True)
    con = duckdb.connect()
    n_docs = con.sql(f"SELECT MAX(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(f"SELECT MAX(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]

    con.sql(f"""
      COPY (
        SELECT doc_id + k * {n_docs} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          w -> 'r' || k || '_' || w), ' ')
               END AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet', (SELECT unnest(range({REPLICAS})) AS k)
      ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
      COPY (
        SELECT vec_id + k * {n_vecs} AS vec_id, label,
               list_transform(range(1, 65),
                 i -> embedding[((i - 1 + 6 * k) % 64) + 1]) AS embedding
        FROM '{SRC}/embeddings.parquet', (SELECT unnest(range({EMB_REPLICAS})) AS k)
      ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
    """)
    if EMB_REPLICAS != REPLICAS:
        print(f"# embeddings capped at {EMB_REPLICAS}x (rotation family "
              "exhausted) — embeddings-plane queries must not cite this "
              f"replica set as a {REPLICAS}x measurement")
    # events: replica k shifts event/user ids and keeps event time, types and
    # values — per-window per-type counts scale exactly 10x with unchanged
    # window structure, so windowed aggregations/top-k/anomaly operators see
    # a genuine 10x event firehose over the same time axis (the realistic
    # shape: more traffic, same clock).
    n_ev = con.sql(f"SELECT MAX(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
    n_users = con.sql(f"SELECT MAX(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        SELECT event_id + k * {n_ev} AS event_id, ts,
               user_id + k * {n_users} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', (SELECT unnest(range({REPLICAS})) AS k)
      ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)
    # orders plane (round 13, VERDICT r12 #2): replica k shifts the key
    # spine consistently — customers, the orders that reference them, and
    # the lineitems that reference those orders — while preserving dates,
    # prices, statuses, and the part/supplier catalog (copied 1x: more
    # orders over the same catalog, the realistic growth shape). Each
    # replica is join-isomorphic to the original, so every TPC-H
    # aggregate/join and the HLL distinct-count sees a genuine Nx fact
    # volume with unchanged per-key group structure — linear scaling is
    # the CORRECT expectation, same argument as documents/events above.
    n_cust = con.sql(f"SELECT MAX(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0]
    n_ord = con.sql(f"SELECT MAX(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    con.sql(f"""
      COPY (
        SELECT c_custkey + k * {n_cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', (SELECT unnest(range({REPLICAS})) AS k)
      ) TO '{DST}/customer.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
      COPY (
        SELECT o_orderkey + k * {n_ord} AS o_orderkey,
               o_custkey + k * {n_cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', (SELECT unnest(range({REPLICAS})) AS k)
      ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
      COPY (
        SELECT l_orderkey + k * {n_ord} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', (SELECT unnest(range({REPLICAS})) AS k)
      ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "supplier", "part"):
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")
    for t in ("documents", "embeddings", "events", "customer", "orders",
              "lineitem"):
        n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)

if __name__ == "__main__":
    main()
