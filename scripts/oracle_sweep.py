"""Fast judge-style oracle sweep: every ``oracle_sql()`` pair compared
against DuckDB on one local[32] session.

Replicates tests/test_entry.py::compare_frames semantics (column set,
row count, numeric-kind drift, exact value equality) but amortizes one
big session over the whole registry instead of pytest's local[4]
fixture — minutes, not hours.

Usage:
    python scripts/oracle_sweep.py                 # sf0.001
    python scripts/oracle_sweep.py /root/testdata/sf0.01
    python scripts/oracle_sweep.py sf0.01 name1 name2   # subset
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from inception_spark.session import build_session  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name, sa, da) -> str | None:
    sa, da = canon(sa), canon(da)
    if list(sa.columns) != list(da.columns):
        return f"columns {list(sa.columns)} vs {list(da.columns)}"
    if len(sa) != len(da):
        return f"rows {len(sa)} vs {len(da)}"
    for col in sa.columns:
        s_int = pd.api.types.is_integer_dtype(sa[col])
        d_int = pd.api.types.is_integer_dtype(da[col])
        s_flt = pd.api.types.is_float_dtype(sa[col])
        d_flt = pd.api.types.is_float_dtype(da[col])
        if (s_int and d_flt) or (s_flt and d_int):
            return f"{col}: numeric kind {sa[col].dtype} vs {da[col].dtype}"
    for col in sa.columns:
        for i, (x, y) in enumerate(zip(sa[col], da[col])):
            if not values_equal(x, y):
                return f"{col}[{i}]: {x!r} vs {y!r}"
    return None


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    names = None
    args = sys.argv[1:]
    if args:
        a0 = args[0]
        if "/" in a0 or a0.startswith("sf"):
            sf_dir = a0 if "/" in a0 else f"/root/testdata/{a0}"
            names = args[1:] or None
        else:
            names = args

    spark = build_session("inception_spark_oracle_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    todo = sorted(names or oracles)
    unknown = [n for n in todo if n not in oracles]
    if unknown:
        raise SystemExit(f"no oracle for: {unknown}")

    n_ok = 0
    failures: dict[str, str] = {}
    t_start = time.perf_counter()
    for i, name in enumerate(todo):
        spark.sparkContext.setJobDescription(f"oracle:{name}")
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            err = compare(name, sdf, ddf)
        except Exception as exc:  # noqa: BLE001
            err = f"EXC {type(exc).__name__}: {exc}"[:300]
        dt = time.perf_counter() - t0
        if err:
            failures[name] = err
            print(f"FAIL {name}: {err}", flush=True)
        else:
            n_ok += 1
        if (i + 1) % 25 == 0:
            print(f"  .. {i + 1}/{len(todo)} ok={n_ok} "
                  f"({time.perf_counter() - t_start:.0f}s)", flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "n": len(todo), "ok": n_ok,
        "failed": sorted(failures),
        "wall_s": round(time.perf_counter() - t_start, 1),
    }))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
