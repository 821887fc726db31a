#!/usr/bin/env python3
"""Deterministic 10x replication of an sf dir — the local scale-stress
slice (VERDICT r7 item 5). Replica 0 is the original; replicas k>0 shift
every key by k*STRIDE so the relational structure replicates without
colliding. Document text gets every 7th token tagged per replica (so
replicas are NOT near-duplicates: shingle overlap lands far below the
LSH thresholds and candidate volume stays linear, which is the property
being stress-tested). Embeddings get a small deterministic per-replica
perturbation (distinct vectors, similar geometry).

Usage: tools/make_scale_slice.py [K] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/sfx10
"""
import sys, os
import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfx10"
STRIDE = 1_000_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def rep(table, shifted_cols, passthrough_sql=None):
    """UNION ALL of K shifted replicas written as one parquet file."""
    src = f"read_parquet('{SRC}/{table}.parquet')"
    cols = duckdb.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
    parts = []
    for k in range(K):
        sel = []
        for name, _typ, *_ in cols:
            if name in shifted_cols:
                sel.append(f"{name} + {k * STRIDE} AS {name}")
            elif passthrough_sql and name in passthrough_sql:
                sel.append(passthrough_sql[name](k) + f" AS {name}")
            else:
                sel.append(name)
        parts.append(f"SELECT {', '.join(sel)} FROM {src}")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")

# dims shared across replicas (suppliers/nations/regions are reference
# data; p_brand category nodes intentionally stay shared, as a real
# 10x corpus shares its category vocabulary)
for t in ["region", "nation", "supplier"]:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

rep("customer", {"c_custkey"})
rep("part", {"p_partkey"})
rep("orders", {"o_orderkey", "o_custkey"})
rep("lineitem", {"l_orderkey", "l_partkey"})
rep("events", {"event_id", "user_id"})

# documents: tag every 7th token per replica k>0 — replicas share ~4/7
# of their 3-gram shingles pairwise, Jaccard ~0.4, far below the 0.7+
# thresholds, so near-dup pair volume scales linearly with the corpus.
con.create_function(
    "perturb_text",
    lambda text, k: text if k == 0 else " ".join(
        (tok + f"_r{k}" if i % 7 == 6 else tok)
        for i, tok in enumerate(text.split(" "))),
    ["VARCHAR", "BIGINT"], "VARCHAR")
src = f"read_parquet('{SRC}/documents.parquet')"
parts = [
    f"SELECT doc_id + {k * STRIDE} AS doc_id, perturb_text(text, {k}) AS text,"
    f" lang, source, CAST(length(perturb_text(text, {k})) AS BIGINT)"
    f" AS n_chars FROM {src}"
    for k in range(K)]
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/documents.parquet'"
            " (FORMAT PARQUET)")
print("documents:", duckdb.sql(
    f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')"
).fetchone()[0], "rows")

# embeddings: per-replica deterministic perturbation — distinct vectors,
# similar geometry (clusters thicken rather than teleport).
src = f"read_parquet('{SRC}/embeddings.parquet')"
parts = [
    (f"SELECT vec_id AS vec_id, embedding, label FROM {src}" if k == 0 else
     f"SELECT vec_id + {k * STRIDE} AS vec_id,"
     f" CAST(list_transform(list_zip(embedding,"
     f"   range(len(embedding))),"
     f"   p -> p[1] + (({k} * 31 + p[2]) % 17 - 8) * 0.001) AS FLOAT[])"
     f" AS embedding, label FROM {src}")
    for k in range(K)]
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/embeddings.parquet'"
            " (FORMAT PARQUET)")
print("embeddings:", duckdb.sql(
    f"SELECT count(*) FROM read_parquet('{OUT}/embeddings.parquet')"
).fetchone()[0], "rows")
print(f"done -> {OUT}")
