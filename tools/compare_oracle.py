#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query in
outDir/oracle_sql.json, run the SQL against the sfDir parquet tables and
diff against the Spark result parquet (column names sorted, rows sorted,
exact value equality)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = 0, 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
        got = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f"{outdir}/{name}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        bad += 1
        continue
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)] if len(got.columns) else got
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        bad += 1
        continue
    # normalize: datetimes → ns, sort rows
    for df in (want, got):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    want = want.sort_values(by=list(want.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        bad += 1
        continue
    mismatch = None
    for c in want.columns:
        wv, gv = want[c], got[c]
        if str(wv.dtype) != str(gv.dtype):
            mismatch = f"dtype[{c}]: {gv.dtype} != {wv.dtype}"
            break
        if wv.dtype == object:
            eq = (wv.fillna("\0") == gv.fillna("\0")).all()
        else:
            eq = ((wv == gv) | (wv.isna() & gv.isna())).all()
        if not eq:
            idx = (~((wv == gv) | (wv.isna() & gv.isna()))).idxmax()
            mismatch = f"value[{c}] row{idx}: got={gv[idx]!r} want={wv[idx]!r}"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        bad += 1
    else:
        ok += 1
        print(f"ok   {name} ({len(got)} rows)")
print(f"\n{ok} ok, {bad} fail, {len(oracle)} total")
