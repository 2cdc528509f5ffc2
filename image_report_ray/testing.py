"""Oracle-parity harness: run a Ray query callable and its DuckDB SQL twin
over the same sf dir and compare row count, schema and values — a local
replica of the driver's correctness gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj.reset_index(drop=True)
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    # ray.data.Dataset
    return obj.to_pandas()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64", errors="ignore")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_result, duck_df: pd.DataFrame, *, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    a, b = _normalize(_to_pandas(ray_result)), _normalize(duck_df)
    problems: list[str] = []
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: ray={len(a)} sql={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64").to_numpy()
            bf = bv.astype("float64").to_numpy()
            ok = np.isclose(af, bf, rtol=0, atol=float_tol, equal_nan=True)
        else:
            ok = (av.to_numpy() == bv.to_numpy()) | (av.isna() & bv.isna()).to_numpy()
        if not ok.all():
            bad = int((~ok).sum())
            i = int(np.flatnonzero(~ok)[0])
            problems.append(
                f"column {c!r}: {bad} value diffs (first at row {i}: "
                f"ray={av.iloc[i]!r} sql={bv.iloc[i]!r})"
            )
    return problems


def run_parity(sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    """Run queries()+oracle_sql() pairs over ``sf_dir``; return problems."""
    import duckdb

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    out: dict[str, list[str]] = {}
    for name in names or sorted(qs):
        if name not in sqls:
            out[name] = ["<rows-only: no oracle sql>"]
            continue
        try:
            ray_res = qs[name](sf_dir)
            duck_res = con.sql(sqls[name]).df()
            out[name] = compare(ray_res, duck_res)
        except Exception as exc:  # surface, don't abort the sweep
            out[name] = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
    return out
