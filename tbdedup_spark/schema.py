"""Fixed StructTypes — declared once, enforced everywhere.

The reference versions its SQLite schema by hand
(tbdedup/db/__init__.py:37-45,114-128) and infers only the MBOX dialect
(tbdedup/mbox/mboxfile.py:62-119). We do the same: fixed schemas, no runtime
inference. The ``images`` shape is exactly BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The primary input table (input_hint): one row per image+caption pair.
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# Narrow signature relation — the analog of the reference's ``messages``
# table (tbdedup/db/__init__.py:37-45): identity columns only, never the
# payload bytes, so downstream shuffles stay narrow (late materialization;
# the reference stored (location, start, end) offsets for the same reason,
# tbdedup/db/__init__.py:42).
SIGNATURES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("sig", T.StringType(), False),        # canonical (parsed-hash analog)
        T.StructField("disk_sig", T.StringType(), False),   # raw-bytes (disk-hash analog)
        T.StructField("caption_sig", T.StringType(), False),# secondary key (Message-ID analog)
        T.StructField("phash", T.LongType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

# Candidate pairs from any detector: always a_id < b_id, payload-free.
PAIRS = T.StructType(
    [
        T.StructField("a_id", T.StringType(), False),
        T.StructField("b_id", T.StringType(), False),
        T.StructField("detector", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# Final cluster assignment: cluster_id = min(image_id) in the component.
CLUSTERS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("is_representative", T.BooleanType(), False),
    ]
)

# Lineage ledger — generalizes the reference's mapping.json / plan_output.json
# documents (tbdedup/planner/plan.py:46-80, tbdedup/combinatory/__init__.py:49-57).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("input_ref", T.StringType(), True),
        T.StructField("output_ref", T.StringType(), True),
        T.StructField("row_count", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

# Metrics rows — generalizes TimeTracker logs (tbdedup/utils/time.py:33-66)
# and the disk/parsed count sanity pair (tbdedup/dedup/__init__.py:120-123).
METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

# Quarantine — rows failing the verify-on-write invariant; the analog of the
# reference writing a ``<hash>.orig-<id>.mboxrecord`` file and skipping
# (tbdedup/dedup/__init__.py:142-151). evidence_bytes carries the failing
# member's raw bytes (size-capped), so one quarantine row is sufficient to
# reproduce the mismatch offline — the .mboxrecord artifact parity.
QUARANTINE = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), True),   # null: failed before clustering
        T.StructField("rep_id", T.StringType(), True),
        T.StructField("reason", T.StringType(), False),
        T.StructField("psnr_db", T.DoubleType(), True),
        T.StructField("cap_sim", T.DoubleType(), True),
        T.StructField("evidence_bytes", T.BinaryType(), True),
    ]
)
