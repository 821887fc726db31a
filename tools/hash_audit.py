#!/usr/bin/env python3
"""Cross-run determinism audit over Verify dumps (round-14 verdict #1c).

Usage: python3 tools/hash_audit.py <verifyOutDirA> <verifyOutDirB>

Canonically hashes every query's Spark result parquet in BOTH dirs —
columns sorted by name, rows sorted by their canonical tuple, doubles
at exact IEEE bit level, arrow types included — and reports any query
whose hash differs between the two runs. Run the two Verify mains in
SEPARATE JVMs (fresh sbt invocations) so JIT/parallelism/memo state
cannot be shared; a mismatch here is a nondeterministic row the driver
would see as a cross-run "flake" (r13: quality_model_train).

This audits SPARK-side run-to-run stability. Oracle-side stability is
covered by running tools/check_oracle.py against both dirs (the oracle
SQL re-executes per invocation).

Exit 0 = all stable; 1 = at least one unstable or missing query.
"""
import sys, os, glob, json, struct, hashlib, decimal
import duckdb


def canon(v):
    if isinstance(v, float):
        # Pack the value directly: `v + 0.0` would canonicalize -0.0 to
        # +0.0, hiding a run-to-run sign-of-zero flip — exactly the
        # class of instability this tool exists to catch (ADVICE r14).
        return b"f" + struct.pack("<d", v)
    if isinstance(v, bool):
        return b"b1" if v else b"b0"
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, decimal.Decimal):
        return b"d" + str(v).encode()
    if isinstance(v, bytes):
        return b"y" + v
    if v is None:
        return b"n"
    if isinstance(v, list):
        return b"[" + b",".join(canon(x) for x in v) + b"]"
    if isinstance(v, dict):
        return b"{" + b",".join(
            k.encode() + b"=" + canon(v[k]) for k in sorted(v)) + b"}"
    return b"s" + str(v).encode()


def query_hash(qdir):
    files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not files:
        return None
    t = duckdb.connect().execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    cols = sorted(t.column_names)
    h = hashlib.sha256()
    for c in cols:
        h.update(c.encode() + b":" + str(t.schema.field(c).type).encode())
    rows = sorted(b"|".join(canon(r[c]) for c in cols)
                  for r in t.to_pylist())
    for r in rows:
        h.update(r + b"\n")
    return f"{len(rows)}:{h.hexdigest()}"


def main(dir_a, dir_b):
    qs_a = {d for d in os.listdir(dir_a)
            if os.path.isdir(os.path.join(dir_a, d))}
    qs_b = {d for d in os.listdir(dir_b)
            if os.path.isdir(os.path.join(dir_b, d))}
    bad = 0
    for q in sorted(qs_a ^ qs_b):
        print(f"MISSING {q}: only in {'A' if q in qs_a else 'B'}")
        bad += 1
    stable = 0
    for q in sorted(qs_a & qs_b):
        ha = query_hash(os.path.join(dir_a, q))
        hb = query_hash(os.path.join(dir_b, q))
        if ha is None or hb is None:
            print(f"MISSING {q}: no parquet in {'A' if ha is None else 'B'}")
            bad += 1
        elif ha != hb:
            print(f"UNSTABLE {q}: {ha} vs {hb}")
            bad += 1
        else:
            stable += 1
    print(f"\n{stable} stable, {bad} unstable/missing "
          f"of {len(qs_a | qs_b)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
