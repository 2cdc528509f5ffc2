"""Text-analysis pipelines over the ``documents`` table.

The per-row digest/metric work mirrors the reference's extractor-registry
stage (/root/reference/ir:126-227 dispatching hashing_config.py's 22
functions): vectorized kernels per batch, per-function failure accounting,
selection DSL. The SQL-checkable subset lives here; the wider metric
registry (simhash, minhash, fingerprints) is in ``functions/textmetrics``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._util import ds_to_table, finalize

_TOKEN_SPLIT = r"\s+"
_PUNCT = r"[.,!?;:]"


def _rd():
    import ray.data as rd

    return rd


def text_stats(sf_dir: str) -> pa.Table:
    """Per-document token/char/punctuation counts — all pyarrow.compute
    kernels (count_substring_regex), zero Python row loops."""
    rd = _rd()

    def stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars_calc": pc.utf8_length(text).cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
                "n_punct": pc.count_substring_regex(text, _PUNCT).cast(pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return finalize(ds_to_table(ds.map_batches(stats, batch_format="pyarrow")),
                    [("doc_id", "ascending")])


def top_tokens(sf_dir: str, k: int = 20) -> pa.Table:
    """Global token frequency top-k: per-batch partial counts (combiner)
    then a small grouped sum — the pre-aggregate-before-shuffle pattern."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), _TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"), "n_part": vc.field("counts")})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    t = ds_to_table(out)
    t = t.set_column(t.column_names.index("n"), "n", t.column("n").cast(pa.int64()))
    t = finalize(t, [("n", "descending"), ("token", "ascending")])
    return t.slice(0, k).select(["token", "n"])


def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: content-hash each text, keep the smallest doc_id per
    hash. The shuffle key is the 64-hex digest, not the text itself, so the
    exchange moves fixed-width keys (what 100 TB needs); grouping by the
    raw text would ship every document body through the shuffle."""
    import pandas as pd

    rd = _rd()

    def add_hash(df: "pd.DataFrame") -> "pd.DataFrame":
        df["h"] = [
            hashlib.sha256(s.encode("utf-8")).hexdigest() for s in df["text"].to_numpy()
        ]
        return df

    def keep_first(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id")
        return g.head(1)[["doc_id", "text"]]

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )
    return finalize(ds_to_table(out), [("doc_id", "ascending")])


def lang_stats(sf_dir: str) -> pa.Table:
    """Documents per language with average length (floor at 1e-4 — integer
    derivation keeps the value bit-equal to the SQL oracle)."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="s_chars")
    )
    t = ds_to_table(out)
    n = t.column("n_docs").to_numpy().astype(np.int64)
    s = t.column("s_chars").to_numpy().astype(np.int64)
    t = pa.table(
        {
            "lang": t.column("lang"),
            "n_docs": pa.array(n),
            "avg_chars": (s * 10_000 // n) / 10_000.0,
        }
    )
    return finalize(t, [("lang", "ascending")])
