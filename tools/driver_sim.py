"""Simulate the grading driver: run queries() vs oracle_sql() via DuckDB.

Usage: python tools/driver_sim.py [sf_dir] [only_query ...]
Owns its own Ray session (the real driver inits Ray itself).
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(x) -> pd.DataFrame:
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    import pyarrow as pa

    if isinstance(x, pa.Table):
        return x.to_pandas()
    raise TypeError(type(x))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception:
            print(f"FAIL {name}: query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
            continue
        try:
            gold = canon(con.sql(sqls[name]).df())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(gold)
        ok_cols = list(mine.columns) == list(gold.columns)
        ok_vals = ok_rows and ok_cols and mine.equals(gold)
        if not ok_vals and ok_rows and ok_cols:
            # loose float compare for diagnostics
            try:
                pd.testing.assert_frame_equal(mine, gold, check_dtype=False, rtol=1e-6, atol=1e-6)
                ok_vals = "approx"
            except Exception:
                pass
        status = "PASS" if ok_vals is True else ("APPROX" if ok_vals == "approx" else "FAIL")
        if status == "FAIL":
            n_fail += 1
            print(f"FAIL {name}: rows {len(mine)}/{len(gold)} cols_ok={ok_cols} ({dt:.1f}s)")
            if ok_cols and ok_rows:
                diff = (mine != gold).any(axis=0) if mine.shape == gold.shape else None
                print("  my cols:", list(mine.columns))
                if diff is not None:
                    print("  differing cols:", list(diff[diff].index))
                    bad = (mine != gold).any(axis=1)
                    print("  mine:", mine[bad].head(3).to_dict("records"))
                    print("  gold:", gold[bad].head(3).to_dict("records"))
            else:
                print("  my cols:", list(mine.columns), "gold cols:", list(gold.columns))
                print("  mine:", mine.head(3).to_dict("records"))
                print("  gold:", gold.head(3).to_dict("records"))
        else:
            n_pass += 1
            print(f"{status} {name}: {len(mine)} rows ({dt:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()


if __name__ == "__main__":
    main()
