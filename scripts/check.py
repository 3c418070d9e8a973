#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def dtype_mismatches(g: pd.DataFrame, w: pd.DataFrame):
    """Replicate the driver's dtype-sensitive hash for the dangerous classes:
    an integer column on one side vs float64/object on the other (DuckDB
    renders HUGEINT as float64 and DECIMAL as object through the pandas
    bridge — the round-13 a_gini_split/a_jenks_breaks escape), and — round-15,
    the r14 verdict's suggested extension — a datetime column on ONE side only
    (a string-rendered ts vs a raw ts compares equal under pandas coercion
    here while the driver's dtype-sensitive hash diverges; the Q-scaladoc rule
    is string-rendered timestamps on BOTH sides).
    """
    def obj_is_datelike(s: pd.Series) -> bool:
        nn = s.dropna()
        if nn.empty:
            return False
        import datetime
        return isinstance(nn.iloc[0], (datetime.date, datetime.datetime, pd.Timestamp))

    bad = []
    for c in g.columns:
        kg, kw = kind(g[c]), kind(w[c])
        if kg == kw:
            continue
        numeric = {"int", "float"}
        # ts vs object-of-date is the pandas DATE bridge, not a rendering
        # divergence — only ts vs STRING (or numeric) is the driver-hash trap.
        one_sided_ts = ("ts" in (kg, kw)) and not (
            (kg == "obj" and obj_is_datelike(g[c])) or
            (kw == "obj" and obj_is_datelike(w[c])))
        if (kg == "int" and kw in {"float", "obj"}) or \
           (kw == "int" and kg in {"float", "obj"}) or \
           ((kg in numeric) != (kw in numeric) and "ts" not in (kg, kw)) or \
           one_sided_ts:
            bad.append((c, str(g[c].dtype), str(w[c].dtype)))
    return bad


def ts_rule_warnings(g: pd.DataFrame, w: pd.DataFrame):
    """Columns that are raw datetimes on BOTH sides: the driver passes these
    today, so they stay green, but the Q-scaladoc rule says render timestamps
    as strings — surface them so new queries don't copy the pattern."""
    return [c for c in g.columns if kind(g[c]) == "ts" and kind(w[c]) == "ts"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes a bit: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        raw_w = want.reindex(sorted(want.columns), axis=1)
        raw_g = got.reindex(sorted(got.columns), axis=1)
        dbad = dtype_mismatches(raw_g, raw_w)
        if dbad:
            det = ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in dbad)
            print(f"FAIL  {name}: dtype parity: {det}")
            n_fail += 1
            continue
        tsw = ts_rule_warnings(raw_g, raw_w)
        if tsw:
            print(f"WARN  {name}: raw timestamp columns {tsw} "
                  "(Q rule: render ts as strings on both sides)")
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:6]
            print(f"FAIL  {name}: value mismatch: " + " / ".join(msg))
            # show first differing rows
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"      first diff row {i}:\n      got : {g.loc[i].to_dict()}\n      want: {w.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
