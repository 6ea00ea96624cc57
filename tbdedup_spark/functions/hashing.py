"""Signature columns — the dual-identity core of the reference.

The reference computes two SHA-256 identities per message: a *canonical*
("parsed") hash over content minus volatile headers
(tbdedup/mbox/mboxmessage.py:94-117, skip list :37-43) and a *raw* ("disk")
hash over exact on-disk bytes (:96-98); the user picks one via
``--msg-hash-source`` (tbdedup/cmd/__init__.py:71-77). Here:

* disk signature  = ``sha2(bytes, 256)`` — pure built-in, JVM-side, zero Python;
* canonical signature = sha256 over (decoded canonical pixels + caption) — an
  Arrow-batched pandas UDF because pixel decode cannot be expressed in
  Catalyst. The per-image work (zlib inflate, numpy reshape, hashlib) is all
  C; Python only loops over the rows *of one Arrow batch*.
* caption signature = secondary identity, the Message-ID-header analog
  (tbdedup/mbox/mboxmessage.py:119-132).

Scale note: signatures are computed once in the ingest stage and persisted to
the narrow ``signatures`` table; the wide ``bytes`` column never enters a
shuffle (late materialization, same reason the reference stored byte offsets
instead of bodies, tbdedup/db/__init__.py:42).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import codecs


def disk_sig(bytes_col: str | Column = "bytes") -> Column:
    """Raw-bytes identity (tbdedup/mbox/mboxmessage.py:96-98)."""
    col = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.sha2(col, 256)


def caption_sig(caption_col: str | Column = "caption") -> Column:
    col = F.col(caption_col) if isinstance(caption_col, str) else caption_col
    return F.sha2(F.encode(col, "utf-8"), 256)


def _canonical_sig_fn(data: pd.Series, caption: pd.Series) -> pd.Series:
    """sha256(canonical_pixel_bytes(bytes) + utf8(caption)) per row.

    Vectorized at the Arrow-batch level; decode is C-backed per image. A row
    that fails to decode gets sentinel ``DECODE_ERROR:<sha256(bytes)>`` rather
    than failing the stage — the analog of the reference quarantining
    mismatched records instead of aborting (tbdedup/dedup/__init__.py:142-151).
    The sentinel hashes the FULL bytes (not a prefix — the first 8 bytes are
    the format magic, identical across all corrupt files of one format), so
    distinct undecodable images never collide into one exact-dup group; only
    byte-identical corrupt rows group, which is correct by the disk-sig
    contract. The pipeline additionally quarantines DECODE_ERROR rows before
    pair generation (plans/pipeline.py).
    """
    out = []
    for b, c in zip(data, caption):
        try:
            h = hashlib.sha256()
            h.update(codecs.canonical_pixel_bytes(bytes(b)))
            h.update(("\x00" + (c or "")).encode("utf-8"))
            out.append(h.hexdigest())
        except Exception:
            out.append("DECODE_ERROR:" + hashlib.sha256(bytes(b)).hexdigest())
    return pd.Series(out)


_canonical_sig_udf = None


def canonical_sig(bytes_col: str = "bytes", caption_col: str = "caption") -> Column:
    # pandas_udf registration needs an active session → create lazily
    global _canonical_sig_udf
    if _canonical_sig_udf is None:
        _canonical_sig_udf = pandas_udf(_canonical_sig_fn, "string")
    return _canonical_sig_udf(F.col(bytes_col), F.col(caption_col))
