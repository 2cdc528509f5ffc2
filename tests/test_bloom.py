"""Bloom-broadcast path tests: the pure bitmap kernel (no Ray) and the
gated Bloom + exact co-partitioned confirm paths of q3 and the customer
anti-join, forced via a zero key gate and compared bit-for-bit to the
broadcast path / a known synthetic answer."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from image_report_ray.pipelines.bloom import (
    bloom_contains,
    bloom_insert,
    bloom_params,
)

SF = "/root/testdata/sf0.001"


def test_bloom_kernel_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 40, size=20_000))
    others = np.setdiff1d(
        np.unique(rng.integers(0, 1 << 40, size=20_000)), keys
    )
    n_bits, k = bloom_params(len(keys))
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    bloom_insert(words, pa.array(keys, pa.int64()), n_bits, k)
    # every inserted key must hit
    assert bloom_contains(words, pa.array(keys, pa.int64()), n_bits, k).all()
    # false-positive rate near the designed ~1%
    fp = bloom_contains(words, pa.array(others, pa.int64()), n_bits, k).mean()
    assert fp < 0.03
    # empty probe
    assert len(bloom_contains(words, pa.array([], pa.int64()), n_bits, k)) == 0


def test_bloom_kernel_string_keys():
    keys = pa.array([f"conv-{i}" for i in range(5000)])
    n_bits, k = bloom_params(len(keys))
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    bloom_insert(words, keys, n_bits, k)
    assert bloom_contains(words, keys, n_bits, k).all()
    misses = pa.array([f"other-{i}" for i in range(5000)])
    assert bloom_contains(words, misses, n_bits, k).mean() < 0.03


def test_q3_bloom_path_matches_broadcast(ray_session):
    from image_report_ray.pipelines.relational import q3_top_orders

    small = q3_top_orders(SF)
    gated = q3_top_orders(SF, max_broadcast_keys=0)
    assert small.equals(gated)
    assert small.num_rows > 0  # the comparison is not vacuous


def test_anti_join_bloom_path_exact(ray_session, tmp_path):
    """Synthetic corpus where the orderless set is known: customers
    0..199, orders only for even custkeys — both paths must return
    exactly the odd customers."""
    from image_report_ray.pipelines.relational import customers_without_orders

    sf = str(tmp_path)
    cust = pa.table(
        {
            "c_custkey": pa.array(range(200), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(200)]),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array(
                [2 * (i % 100) for i in range(1000)], pa.int64()
            )
        }
    )
    pq.write_table(cust, os.path.join(sf, "customer.parquet"))
    pq.write_table(orders, os.path.join(sf, "orders.parquet"))

    expect = pa.array(range(1, 200, 2), pa.int64())
    small = customers_without_orders(sf)
    gated = customers_without_orders(sf, max_broadcast_keys=0)
    assert small.equals(gated)
    assert small.column("c_custkey").combine_chunks().equals(expect)


def test_anti_join_empty_orders(ray_session, tmp_path):
    """No orders at all: every customer comes back, on both paths."""
    from image_report_ray.pipelines.relational import customers_without_orders

    sf = str(tmp_path)
    cust = pa.table(
        {
            "c_custkey": pa.array(range(10), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(10)]),
        }
    )
    pq.write_table(cust, os.path.join(sf, "customer.parquet"))
    pq.write_table(
        pa.table({"o_custkey": pa.array([], pa.int64())}),
        os.path.join(sf, "orders.parquet"),
    )
    small = customers_without_orders(sf)
    gated = customers_without_orders(sf, max_broadcast_keys=0)
    assert small.equals(gated)
    assert small.num_rows == 10


def test_q5_supplier_exchange_path_matches_broadcast(ray_session):
    from image_report_ray.pipelines.relational import q5_region_revenue

    small = q5_region_revenue(SF)
    gated = q5_region_revenue(SF, max_broadcast_keys=0)
    assert small.num_rows > 0
    assert small.equals(gated)


def test_q14_gated_path_matches_broadcast(ray_session):
    from image_report_ray.pipelines.relational import q14_promo_revenue

    small = q14_promo_revenue(SF)
    gated = q14_promo_revenue(SF, max_broadcast_keys=0)
    assert small.equals(gated)
    assert small.column("promo_pct_bp")[0].as_py() > 0


def test_bloom_semi_join_saturated_bloom_exact(ray_session):
    """A 64-bit (fully saturated) bloom must still return the exact
    semi-join — the co-partitioned confirm pass owns correctness, the
    bloom only bounds shuffle volume."""
    from image_report_ray.pipelines.relational import bloom_semi_join

    a = bloom_semi_join(SF)
    b = bloom_semi_join(SF, nbits=64, k=2)
    assert a.equals(b)


def test_bloom_semi_join_constructed(ray_session, tmp_path):
    """3 users: u1 has 2 purchases (qualifies at min=2), u2 has 1, u3
    has 0 — only u1's TOTAL event count comes back."""
    import numpy as np

    from image_report_ray.pipelines.relational import bloom_semi_join

    ts = pa.array(
        np.arange(6, dtype="int64") * 1_000_000, pa.timestamp("us")
    )
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["purchase", "purchase", "click",
                                    "purchase", "click", "click"]),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
        }),
        os.path.join(str(tmp_path), "events.parquet"))
    out = bloom_semi_join(str(tmp_path), min_purchases=2)
    assert out.to_pylist() == [{"user_id": 1, "n_events": 3}]
