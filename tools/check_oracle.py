#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [q_a,q_b,...]

The optional third argument restricts the check to a comma-separated
query subset — pair it with SPARK_GRAFT_ONLY on graft.Verify for a
fast targeted gate during iteration.

Reads every <verifyOutDir>/<query>/ parquet written by graft.Verify, runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
fixture tables, and compares: column names (sorted), row counts, and
values (rows sorted, exact equality; tiny float tolerance reported
separately so we know which queries are bit-exact).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(out_dir, name):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: dates->str, categories->str
    for c in df.columns:
        if df[c].dtype == "object" or str(df[c].dtype).startswith("datetime"):
            # normalize null spellings: pandas renders a null datetime as
            # 'NaT' but a null object as 'None' — same SQL NULL, and the
            # spark/duck frames can land on different dtypes for the
            # same nullable date column. Mask the nulls BEFORE
            # stringifying: a post-hoc string replace would conflate a
            # legitimate data value 'nan'/'NaT'/'<NA>' with SQL NULL and
            # mask a real engine-vs-oracle null difference
            mask = df[c].isna()
            df[c] = df[c].astype(str).mask(mask, "None")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    if only is not None:
        missing = only - set(oracles)
        if missing:
            print(f"FAIL: unknown queries in subset: {sorted(missing)}")
            sys.exit(1)
        oracles = {k: v for k, v in oracles.items() if k in only}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_df = load_spark(out_dir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        # the driver's hash is value-based (pandas hash): int32 vs int64
        # collide fine, but int-vs-float (DuckDB HUGEINT -> float64) and
        # numeric-vs-object DO break it — flag exactly that kind divergence
        def kind(dt):
            k = dt.kind
            if k in "iu": return "int"
            if k == "f": return "float"
            if k == "M": return "dt"
            if k == "b": return "bool"
            return "obj"
        dt_mismatch = []
        for c in sorted(set(spark_df.columns) & set(duck_df.columns)):
            a, b = kind(spark_df[c].dtype), kind(duck_df[c].dtype)
            # dates: spark parquet reads as object(datetime.date), duck as
            # datetime64 — canon() stringifies both; driver does the same
            if a != b and {a, b} != {"dt", "obj"}:
                dt_mismatch.append(f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
        s, k = canon(spark_df), canon(duck_df)
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}"); n_fail += 1; continue
        if list(s.columns) != list(k.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(k.columns)}")
            n_fail += 1; continue
        if len(s) != len(k):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(k)}"); n_fail += 1; continue
        mismatch = []
        for c in s.columns:
            a, b = s[c], k[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                an, bn = a.astype(float), b.astype(float)
                both_nan = an.isna() & bn.isna()
                exact = (an == bn) | both_nan
                if not exact.all():
                    close = np.isclose(an, bn, rtol=1e-12, atol=1e-12, equal_nan=True)
                    if close.all():
                        mismatch.append((c, "float-close-not-exact"))
                    else:
                        bad = (~exact & ~close).sum()
                        mismatch.append((c, f"{bad} values differ"))
            else:
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int(np.argmax(~eq.values))
                    mismatch.append((c, f"{(~eq).sum()} differ, e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"))
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
