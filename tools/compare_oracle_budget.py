#!/usr/bin/env python3
"""compare_oracle.py with a per-query wall budget: each oracle SQL gets
`--budget` seconds in DuckDB before con.interrupt() marks it
skipped_slow_oracle (the ORACLE is slow at this scale, not the engine —
Spark's side already ran in Verify). Unbuffered per-query progress.
Usage: compare_oracle_budget.py SFDIR OUTDIR [budget_sec]"""
import sys, json, glob, threading
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad, slow = 0, 0, []
for name, sql in sorted(oracle.items()):
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        want = con.sql(sql).df()
    except Exception as e:
        timer.cancel()
        if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
            print(f"slow {name}: oracle exceeded {budget:.0f}s at this scale",
                  flush=True)
            slow.append(name)
        else:
            print(f"FAIL {name}: oracle exec error: {e}", flush=True)
            bad += 1
        continue
    timer.cancel()
    try:
        got = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f"{outdir}/{name}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: result read error: {e}", flush=True)
        bad += 1
        continue
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)] if len(got.columns) else got
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}",
              flush=True)
        bad += 1
        continue
    for df in (want, got):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    want = want.sort_values(by=list(want.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}", flush=True)
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
        print(f"FAIL {name}: {mismatch}", flush=True)
        bad += 1
    else:
        print(f"ok   {name} ({len(got)} rows)", flush=True)
        ok += 1

print(f"\n{ok} ok, {bad} fail, {len(slow)} slow-oracle-skipped "
      f"({', '.join(slow)}), {ok + bad + len(slow)} total", flush=True)
sys.exit(1 if bad else 0)
