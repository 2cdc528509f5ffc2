"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() twin must match DuckDB on the same parquet
(row count + schema + values). Runs at sf0.001 to stay fast."""

import pytest

SF = "/root/testdata/sf0.001"


def test_all_queries_match_oracle(ray_session):
    from image_report_ray.testing import run_parity

    res = run_parity(SF)
    failures = {
        k: v for k, v in res.items() if v and v != ["<rows-only: no oracle sql>"]
    }
    assert not failures, f"oracle parity failures: {failures}"


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    assert res.num_rows >= 0
    assert "conv_id" in res.schema.names
    # every oracle has a query; queries without oracle are rows-only checks
    assert set(e.oracle_sql()) <= set(e.queries())
