#!/usr/bin/env python3
"""Dev-loop oracle checker: mimics the driver's DuckDB compare.

Usage: check_oracle.py <sfdir> <verify_outdir>

Loads each <outdir>/<name> parquet (Spark result), runs the matching SQL from
<outdir>/oracle_sql.json in DuckDB with views named after the parquet tables
in <sfdir>, and compares as sorted row sets (columns sorted by name, rows
sorted by all columns, values stringified with float rounding).
"""
import json
import sys
import glob
import os

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    # Type-tagged canonicalization: the driver hashes exact typed values, so
    # an integral Spark column vs a float oracle column (e.g. DuckDB HUGEINT
    # sums coerced to float64 by .df()) must FAIL here too. Tagging "i:" vs
    # "f:" stops %.9g from flattening 3549.0 == 3549 (the r1 q31/q49 escape).
    def norm(v):
        if v is None or (isinstance(v, (float, np.floating)) and pd.isna(v)):
            return "NULL"
        if isinstance(v, (bool, np.bool_)):
            return f"b:{bool(v)}"
        if isinstance(v, (float, np.floating)):
            return f"f:{float(v):.9g}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            print(f"FAIL {name}: first diff row {i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(a)} rows)")
    print(f"{n_ok}/{len(oracles)} passed")


if __name__ == "__main__":
    main()
