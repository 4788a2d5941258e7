#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB over
the same parquet tables, sorts columns by name, and compares row-by-row.
Dev-only tool (not part of the Spark library).
"""
import sys, os, json, math
import duckdb
import pyarrow  # preload: fetch_arrow_table imports lazily, and mapping
                # the .so can fail once DuckDB sits at its memory cap

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # optional resource caps (the 100x-sweep lesson: one uncapped query
    # OOMs the shared connection and poisons every query after it):
    #   GRAFT_ORACLE_MEMLIMIT, e.g. '96GB' -> PRAGMA memory_limit
    #   GRAFT_ORACLE_TMP       -> PRAGMA temp_directory (spill volume;
    #                             default '.tmp' fills the repo disk)
    mem = os.environ.get("GRAFT_ORACLE_MEMLIMIT")
    if mem:
        con.execute(f"PRAGMA memory_limit='{mem}'")
    tmp = os.environ.get("GRAFT_ORACLE_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"PRAGMA temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        if not os.path.exists(p):
            continue
        sel = "*"
        if t == "events":
            # ScaleGen (Spark-written) events carry ts as raw nanosecond
            # longs (Spark cannot write ns timestamps); mirror the engine's
            # Tables.events mapping ts -> timestamp_micros(ts div 1000)
            # DESCRIBE reads the column type from parquet metadata, so
            # this works on an empty table too (a LIMIT 1 fetchone()
            # returns None on zero rows and would crash the gate)
            ts_type = con.execute(
                f"SELECT column_type FROM (DESCRIBE SELECT ts FROM {src}) "
                "WHERE column_name = 'ts'").fetchone()[0]
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        # The driver hash-compares the *typed* arrow values, so a DuckDB
        # HUGEINT (decimal128) sum vs a Spark int64 fails even when the
        # Python values match. Mirror that: arrow types must be identical.
        tdiff = [(c, want.schema.field(c).type, got.schema.field(c).type)
                 for c in wcols
                 if want.schema.field(c).type != got.schema.field(c).type]
        if tdiff:
            print(f"FAIL {name}: arrow types differ (driver hash would mismatch):")
            for c, wt, gt in tdiff:
                print(f"  {c}: oracle={wt} spark={gt}")
            n_fail += 1
            continue
        wrows = [tuple(canon(r[c]) for c in wcols) for r in want.to_pylist()]
        grows = [tuple(canon(r[c]) for c in gcols) for r in got.to_pylist()]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows differ: oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g]
        if bad:
            i, w, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first at {i}:")
            print(f"  cols:   {wcols}")
            print(f"  oracle: {w}")
            print(f"  spark:  {g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wrows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
