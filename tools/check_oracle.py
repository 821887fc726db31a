#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare, for fast iteration.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - run the SQL in DuckDB with views over <sfDir>/*.parquet
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - sort columns by name, compare ARROW TYPES, then row-by-row values

The type compare is strict on purpose: the driver's hash is
type-sensitive (a DuckDB HUGEINT `sum()` vs a Spark int64 hashes
differently even when every value matches), so a Python-level
`Decimal('3') == 3` pass here would mask exactly the failure the
driver reports. Timestamp timezone annotations are normalized (UTC vs
none reads back equal) — the driver compares values in session-UTC.
"""
import sys, json, glob, os, struct
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_type(t):
    # Timestamp tz annotation is presentation-only at the driver (session
    # TZ is UTC on both engines); everything else must match exactly.
    s = str(t)
    return s.replace(", tz=UTC", "") if s.startswith("timestamp") else s

def norm(v):
    # Compare doubles at exact bit level (the repo's parity claims are
    # IEEE-754-exact; rounding here would mask cross-engine drift).
    # -0.0 normalizes to 0.0: the two are ==-equal and a signed zero from
    # one engine's aggregate is not a semantic divergence.
    if isinstance(v, float):
        return struct.pack("<d", v + 0.0)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        spark = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        ocols, scols = sorted(oracle.column_names), sorted(spark.column_names)
        if ocols != scols:
            print(f"FAIL {name}: schema mismatch oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        otypes = {c: norm_type(oracle.schema.field(c).type) for c in ocols}
        stypes = {c: norm_type(spark.schema.field(c).type) for c in scols}
        if otypes != stypes:
            bad = {c: (otypes[c], stypes[c])
                   for c in ocols if otypes[c] != stypes[c]}
            print(f"FAIL {name}: arrow type mismatch (oracle, spark): {bad}")
            n_fail += 1
            continue
        orows = [tuple(norm(r[c]) for c in ocols) for r in oracle.to_pylist()]
        srows = [tuple(norm(r[c]) for c in scols) for r in spark.to_pylist()]
        if orows == srows:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (oracle {len(orows)}, spark {len(srows)})")
            for i, (o, s) in enumerate(zip(orows, srows)):
                if o != s:
                    print(f"  first diff at row {i}:\n    oracle: {o}\n    spark:  {s}")
                    break
            else:
                print(f"  one side is a prefix of the other")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
