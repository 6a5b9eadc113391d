#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran (or run
with --run to invoke it). For each query in out_dir/oracle_sql.json: run the
SQL in DuckDB over the same parquet tables, load the Spark parquet result,
sort columns by name, sort rows, and compare cell-by-cell.

This file is a development tool only — the engine itself is pure Scala.
"""
import json, math, os, struct, subprocess, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = args[2].split(",") if len(args) > 2 else None

    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            check=True, cwd="/root/repo")

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata ships single files; Spark-derived sets (e.g.
        # the sf1 ScaleUp output) are part-file DIRECTORIES — glob them.
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            oracle_df = con.execute(sql).df()
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, oracle_df)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


def normalize(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: timestamps -> iso strings, floats kept as floats
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def compare(a, b):
    a, b = normalize(a), normalize(b)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} oracle={len(b)}"
    # Dtype pre-flight: the driver hashes raw values, so int64 123 vs
    # float64 123.0 is a hash mismatch even though float(x)==float(y)
    # below would pass. DuckDB leaks HUGEINT (e.g. un-cast integer
    # sum()) which pandas renders as float64 — fail loudly here so the
    # oracle gets its CAST(... AS BIGINT) before the driver ever sees it.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} in ({"i", "f"}, {"u", "f"}) and not (
                a[c].isna().all() or b[c].isna().all()):
            return False, (f"col {c} dtype mismatch: spark={a[c].dtype} "
                           f"oracle={b[c].dtype} (HUGEINT leak? add CAST)")
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                # Hash-faithful: the driver hashes raw bytes, so -0.0
                # vs 0.0 (equal under ==) is a driver red. Compare the
                # IEEE-754 bit patterns, exactly like the driver does.
                if struct.pack("<d", x) != struct.pack("<d", y):
                    return False, (f"col {c} row {i}: spark={x!r} "
                                   f"oracle={y!r} (bitwise)")
            elif (x is None) != (y is None) or str(x) != str(y):
                try:
                    if float(x) == float(y):
                        continue
                except (TypeError, ValueError):
                    pass
                return False, f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return True, ""


if __name__ == "__main__":
    main()
