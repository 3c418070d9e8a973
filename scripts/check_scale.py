#!/usr/bin/env python3
"""sf1-corpus correctness sweep: scripts/check.py semantics (sort columns
by name, rows by all columns, exact value compare) with a per-oracle
TIMEOUT and a committed JSON artifact, because several DuckDB oracle
formulations are deliberately "unrolled" (recursive-CTE graph fixpoints,
full shingle explosions) and become intractable on a 10x corpus even
though the Spark side scales fine. A timeout is recorded as an explicit
EXCLUDED row with the reason, never as a silent pass.

Usage: check_scale.py <sfDir> <verifyOutDir> <outJson> [timeout_s] [only]

`only` is a comma-separated query-name filter; with it the script
re-checks just those queries and MERGES their rows into an existing
<outJson> (the re-verify path after a targeted fix).
"""
import sys, os, json, glob
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def check_one(sf_dir, out_dir, name, sql, q):
    """Worker: run one oracle + compare; posts a (status, detail) tuple."""
    import duckdb, pandas as pd
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        want = con.execute(sql).fetchdf()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            q.put(("FAIL", f"columns {list(g.columns)} != {list(w.columns)}")); return
        if len(g) != len(w):
            q.put(("FAIL", f"rows {len(g)} != {len(w)}")); return
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        q.put(("PASS", f"{len(g)} rows"))
    except AssertionError as e:
        q.put(("FAIL", "value mismatch: " + str(e).split("\n")[0]))
    except Exception as e:
        q.put(("FAIL", f"oracle error: {e}"))


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n))
                   and (only is None or n in only))
    results = {}
    if only is not None and os.path.exists(out_json):
        results = json.load(open(out_json)).get("queries", {})
    for name in names:
        if name not in oracle:
            results[name] = {"status": "NO_ORACLE"}
            print(f"SKIP  {name}: no oracle")
            continue
        q = mp.Queue()
        p = mp.Process(target=check_one,
                       args=(sf_dir, out_dir, name, oracle[name], q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join()
            results[name] = {"status": "EXCLUDED",
                             "reason": f"oracle exceeded {timeout:.0f}s in DuckDB "
                                       "at this corpus size"}
            print(f"EXCL  {name}: oracle timeout ({timeout:.0f}s)")
        else:
            status, detail = q.get() if not q.empty() else ("FAIL", "worker died")
            results[name] = {"status": status, "detail": detail}
            print(f"{status:5s} {name}: {detail}")
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    artifact = {"sf_dir": sf_dir, "timeout_s": timeout, "counts": counts,
                "queries": results}
    json.dump(artifact, open(out_json, "w"), indent=1)
    print(f"\n{counts}")
    sys.exit(1 if counts.get("FAIL", 0) else 0)


if __name__ == "__main__":
    main()
