"""image_report_ray — a Ray-Data-native CDC / incremental-ingest engine.

Re-imagines seanwevans/Image-Report's extract-and-emit pipeline
(/root/reference/ir:309-364) as a streaming changelog-to-lake flow:

* WAL tail (epoch-ordered Parquet change events) -> hash-partitioned,
  last-writer-wins keyed upsert into a Parquet lake of multi-turn
  conversation transcripts (primary key ``(conv_id, turn_idx)``),
* exactly-once via an idempotent two-phase commit manifest keyed by
  ``(partition, epoch)`` (Delta-Lake-style, PAPERS.md),
* additive schema evolution via ``pyarrow.unify_schemas`` + null-fill,
* per-partition XML lineage reports in the spirit of the reference's
  per-image XML reports (self-describing counts / durations / params,
  /root/reference/ir:218-221,241-247,353),
* checkpoint/resume from ``(last_applied_lsn, row_count, merkle_digest)``.

All heavy stages are ``ray.data.Dataset`` transforms over zero-copy Arrow
batches; only the merge stage is stateful (per-partition state lives in the
lake's committed Parquet files, not in actor memory, so it survives 100 TB).

Alongside the CDC core, the package ships the operator library a
large-scale training-data pipeline needs: relational queries, exact and
near deduplication (MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, and text analysis — each expressed
Ray-Data-first.
"""

VERSION = "0.1.0"          # engine version, stamped on lineage roots
                           # (graft of /root/reference/utils.py:18)
STATE_FORMAT_VERSION = 1   # lake/state on-disk format version
