#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/local_verify.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result) and <out>/oracle_sql.json,
runs each oracle in DuckDB over <sf_dir>'s parquet tables, and compares:
column names (sorted), row counts, and a hash of the sorted value matrix.
This is a best-effort stand-in for the driver's CORRECTNESS_r{N}.json.
"""
import sys, os, json, hashlib, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for hashing: floats BIT-EXACT, bytes hex.

    repr() is the shortest round-tripping decimal — distinct doubles
    canonicalize distinctly, so this compares floats bit-for-bit. The
    engine's determinism rules (graft.functions.Portable) promise
    exactly that: every emitted double is either exact integer/decimal
    arithmetic or a fixed sequence of correctly-rounded IEEE ops, so
    the gate can and should demand bit identity (earlier sig-digit
    roundings here were masking nothing, and a looser local gate than
    the driver's would let divergence through to round scoring).
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
            exp = con.sql(oracle[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"SCHEMA   {name}: spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"ROWS     {name}: spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        if frame_key(gcols, grows) != frame_key(ecols, erows):
            print(f"HASH     {name}: values differ ({len(grows)} rows)")
            # show first diff
            order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
            order_e = sorted(range(len(ecols)), key=lambda i: ecols[i])
            sg = sorted(tuple(canon(r[i]) for i in order_g) for r in grows)
            se = sorted(tuple(canon(r[i]) for i in order_e) for r in erows)
            for a, b in zip(sg, se):
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS     {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
