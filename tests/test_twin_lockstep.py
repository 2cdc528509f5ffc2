"""Kernel <-> SQL-twin lockstep guards (VERDICT r4 #7).

The pinned oracle twins (minhash permutation coefficients, LSH
hyperplanes, the unrolled IVF quantizer, the splitmix/Horner hash
helpers) are generated FROM the kernel constants at oracle_sql() call
time — but the SQL-side arithmetic (_poly_hash_sql, _sm_step) is a
hand-written duplicate of the numpy kernels, and a future edit to
either side can silently desync them. These tests regenerate each twin
from the kernel constants and diff it against what oracle_sql() hands
the driver, and prove the shared hash primitives agree value-for-value
through DuckDB. No Ray session required."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entry


# ---------------------------------------------------------------- primitives


def test_splitmix_constants_match_kernel():
    from image_report_ray.pipelines import text

    assert int(text._SM_C1) == entry._SM_C1
    assert int(text._SM_C2) == entry._SM_C2


def test_splitmix64_sql_lockstep():
    """numpy _splitmix64 == the HUGEINT 32-bit-split SQL steps, on values
    exercising the full uint64 range (including the overflow wraps the
    32-bit split exists for)."""
    from image_report_ray.pipelines.text import _splitmix64

    xs = np.array(
        [0, 1, 0x5EED, 2**32 - 1, 2**32, 2**63, 2**64 - 1, 0x9E3779B97F4A7C15],
        dtype=np.uint64,
    )
    want = _splitmix64(xs)
    con = duckdb.connect()
    step1 = entry._sm_step("h", 30, entry._SM_C1)
    step2 = entry._sm_step("h", 27, entry._SM_C2)
    got = con.execute(
        f"""
        WITH s0 AS (SELECT CAST(unnest(?) AS UBIGINT) AS h),
        s1 AS (SELECT {step1} AS h FROM s0),
        s2 AS (SELECT {step2} AS h FROM s1)
        SELECT xor(h, h >> 31) FROM s2
        """,
        [[int(x) for x in xs]],
    ).fetchall()
    assert [int(r[0]) for r in got] == [int(w) for w in want]


def test_hash_utf8_64_sql_lockstep():
    """kernel hash_utf8_64 (vectorized Horner over utf-8 bytes +
    splitmix64) == the _poly_hash_sql + _sm_step twin, including the
    empty string (SQL CASE guard -> Horner over zero bytes == 0) and a
    >256-char string (the kernel's positional-Horner fallback path)."""
    from image_report_ray.pipelines.dedup import hash_utf8_64

    strs = ["", "a", "hello world", "the quick brown fox", "x" * 300,
            "Mixed CASE 123 !?", " leading and trailing "]
    want = hash_utf8_64(np.array(strs, dtype=object))
    poly = (
        f"CASE WHEN length(s) = 0 THEN 0 ELSE {entry._poly_hash_sql('s')} END"
    )
    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH inp AS (SELECT unnest(?) AS s),
        h0 AS (SELECT CAST({poly} AS UBIGINT) AS h FROM inp),
        h1 AS (SELECT {entry._sm_step('h', 30, entry._SM_C1)} AS h FROM h0),
        h2 AS (SELECT {entry._sm_step('h', 27, entry._SM_C2)} AS h FROM h1)
        SELECT xor(h, h >> 31) FROM h2
        """,
        [strs],
    ).fetchall()
    assert [int(r[0]) for r in got] == [int(w) for w in want]


# ------------------------------------------------------- twin regeneration

# every generator-derived twin: oracle_sql() must hand the driver EXACTLY
# what a fresh regeneration from the kernel constants produces (guards
# against a future snapshot-to-string-literal shortcut)
_DERIVED_TWINS = {
    "dedup_minhash_lsh": entry._minhash_sql,
    "dedup_simhash": entry._simhash_sql,
    "knn_cosine_lsh": entry._knn_lsh_sql,
    "knn_cosine_ivf": entry._knn_ivf_sql,
    "cdc_incremental_dedup": entry._incdedup_sql,
    "dup_span_coverage": entry._dupspan_sql,
    "top_spans": entry._topspans_sql,
    "pair_pagerank": entry._pagerank_sql,
    "mixture_sample": entry._mixsample_sql,
}


@pytest.fixture(scope="module")
def oracle():
    return entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_DERIVED_TWINS))
def test_twin_matches_fresh_regeneration(oracle, name):
    assert name in oracle
    assert oracle[name] == _DERIVED_TWINS[name]()


def test_minhash_twin_pins_all_perm_coefficients(oracle):
    from image_report_ray.pipelines.dedup import (
        _BAND_MIX,
        _MH_PERMS,
        _MH_ROWS,
        _perm_coeffs,
    )

    sql = oracle["dedup_minhash_lsh"]
    a, _b = _perm_coeffs()
    assert len(a) == _MH_PERMS
    for j, coeff in enumerate(a):
        assert f"({j}, {int(coeff)})" in sql
    assert f"// {_MH_ROWS}" in sql
    assert str(int(_BAND_MIX)) in sql


def test_lsh_twin_pins_hyperplanes(oracle):
    from image_report_ray.pipelines.similarity import (
        _LSH_BITS,
        _LSH_MAX_HAMMING,
        _hyperplanes,
    )

    sql = oracle["knn_cosine_lsh"]
    pl = _hyperplanes(entry._embedding_dim())
    assert pl.shape[1] == _LSH_BITS
    for j in range(_LSH_BITS):
        for x in pl[:, j]:
            assert repr(float(x)) in sql
    assert f"<= {_LSH_MAX_HAMMING}" in sql


def test_ivf_twin_unrolls_kernel_iterations(oracle):
    from image_report_ray.pipelines.similarity import (
        _IVF_CELLS,
        _IVF_CENT_ROUND,
        _IVF_ITERS,
        _IVF_SIM_ROUND,
        _IVF_TRAIN_SAMPLE,
    )

    sql = oracle["knn_cosine_ivf"]
    # one Lloyd update CTE per kernel iteration, plus the final assign
    assert all(f"m{t} AS" in sql for t in range(1, _IVF_ITERS + 1))
    assert f"m{_IVF_ITERS + 1} AS" not in sql
    assert f"LIMIT {_IVF_CELLS}" in sql
    assert f"<= {_IVF_TRAIN_SAMPLE}" in sql
    assert f", {_IVF_SIM_ROUND})" in sql
    assert f", {_IVF_CENT_ROUND})" in sql
