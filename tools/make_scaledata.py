#!/usr/bin/env python3
"""Dev-only weak-scaling data generator: replicate the driver's sf0.1
tables K times with disjoint key spaces to approximate sf1.0 for the
scale-trend bench (PERF.md). NOT part of the shipped engine and NOT a
substitute for driver testdata — correctness gates always run on
/root/testdata.

Replication is distribution-preserving and interaction-free:
  - every key column shifts by replica * stride (disjoint id spaces, so
    graphs/joins gain components instead of densifying);
  - document tokens get a per-replica prefix (vocabulary grows with the
    corpus, as a real crawl's does) so the dedup families don't see an
    artificial 10-way exact-duplicate explosion;
  - customer names get a per-replica prefix so entity-resolution blocks
    stay within a replica instead of matching 10 synthetic twins.

Usage: python3 tools/make_scaledata.py [replicas] [outDir]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/scaledata/sf1.0"

STRIDE = 100_000_000  # far above every sf0.1 key range


def shift(tbl: pa.Table, col: str, i: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    shifted = pc.add(tbl.column(col), pa.scalar(i * STRIDE, type=pa.int64()))
    return tbl.set_column(idx, tbl.schema.field(col), shifted)


def prefix_re(tbl: pa.Table, col: str, pattern: str, repl: str) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    out = pc.replace_substring_regex(tbl.column(col), pattern=pattern, replacement=repl)
    return tbl.set_column(idx, tbl.schema.field(col), out)


def replicate(name, key_cols, text_col=None, token_prefix=False):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(K):
        t = src
        for c in key_cols:
            t = shift(t, c, i)
        if text_col and i > 0:
            if token_prefix:  # prefix EVERY whitespace token
                t = prefix_re(t, text_col, r"(\S+)", rf"r{i}x\1")
            else:  # prefix the whole value once
                t = prefix_re(t, text_col, r"^", f"r{i} ")
        parts.append(t)
    merged = pa.concat_tables(parts)
    pq.write_table(merged, f"{OUT}/{name}.parquet", compression="snappy")
    print(f"{name}: {src.num_rows} -> {merged.num_rows} rows")


def replicate_embeddings():
    """vec_id shifts by stride; each replica's vectors are ROLLED by the
    replica index (norm- and distribution-preserving, decorrelates the
    replicas) so the similarity families don't see 10 exact twins of
    every vector."""
    import numpy as np
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    parts = []
    for i in range(K):
        t = shift(src, "vec_id", i)
        if i > 0:
            rolled = np.roll(emb, i, axis=1)
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(idx, t.schema.field("embedding"),
                             pa.array(list(rolled), type=t.schema.field("embedding").type))
        parts.append(t)
    merged = pa.concat_tables(parts)
    pq.write_table(merged, f"{OUT}/embeddings.parquet", compression="snappy")
    print(f"embeddings: {src.num_rows} -> {merged.num_rows} rows")


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("customer", ["c_custkey"], text_col="c_name")
    replicate("documents", ["doc_id"], text_col="text", token_prefix=True)
    replicate("events", ["event_id", "user_id"])
    replicate_embeddings()


if __name__ == "__main__":
    main()
