#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark output) and oracle_sql.json,
runs each oracle against the sf parquet tables in DuckDB, and compares
schemas + values exactly (columns sorted by name, rows in result order).
Optional query names restrict the check — useful at sf0.1+. Since r8 the
word-3-shingle family's oracles use a grouped-intersection (non-quadratic)
formulation, so the only oracle still infeasible one scale up is
dedup_minhash_lsh: its char-5-gram shingles are near-universal across
docs, so BOTH the all-pairs list_intersect form (~hours at 5k docs) and a
grouped-intersection rewrite (sum of df^2 = 1.5e9 join rows, measured)
melt — gate it at sf0.01 only.
"""
import sys, json, glob, os, shutil
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Where DuckDB may spill, and how much. Unbounded spill once left 75 GiB
# of duckdb_temp_storage-*.tmp under .tmp/, filled the disk to 100%, and
# took a whole round's driver artifacts down with it — a melting oracle
# must fail ITS query, not the machine.
SPILL_DIR = os.path.normpath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", "duckdb_spill"))
SPILL_CAP = "20GiB"

def main(sf_dir, out_dir, only=()):
    # clean leftovers from any previous crashed run (old unbounded runs
    # spilled directly under .tmp/ — sweep that pattern too)
    shutil.rmtree(SPILL_DIR, ignore_errors=True)
    for stale in glob.glob(os.path.join(os.path.dirname(SPILL_DIR),
                                        "duckdb_temp_storage-*.tmp")):
        try: os.remove(stale)
        except OSError: pass
    os.makedirs(SPILL_DIR, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET temp_directory='{SPILL_DIR}'")
    con.sql(f"SET max_temp_directory_size='{SPILL_CAP}'")
    for t in TABLES:
        # testdata tables are single files; ScaleUp rehearsal corpora are
        # Spark-written directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        unknown = set(only) - set(oracle)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}"); return 1
        oracle = {n: oracle[n] for n in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            want = con.sql(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.sql(oracle[name]).description]
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got, got_cols = got_rel.fetchall(), [d[0] for d in got_rel.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols oracle={want_cols} spark={got_cols}")
            n_fail += 1; continue
        # reorder spark cols to oracle order
        idx = [got_cols.index(c) for c in want_cols]
        got = [tuple(r[i] for i in idx) for r in got]
        if len(want) != len(got):
            print(f"FAIL {name}: rows oracle={len(want)} spark={len(got)}")
            n_fail += 1; continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(want, got)) if w != g]
        if bad:
            i, w, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(want)} rows differ; "
                  f"first at {i}:\n  oracle={w}\n  spark ={g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    con.close()
    # a clean exit leaves no spill behind (the "full sweep leaves .tmp
    # empty" contract); a crash leaves it for the next run's cleanup above
    shutil.rmtree(SPILL_DIR, ignore_errors=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
