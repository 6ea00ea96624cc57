"""Raw container-file ingestion: one file → N IMAGES rows.

The reference's first mile is a stateful one-file→N-records split over MBOX
archives (tbdedup/mbox/mboxfile.py:187-344): a line scan keyed on a start-line
regex, with byte offsets tracked per record, an empty-file guard (:192-196 →
``ErrEmptyFile``), an invalid-first-record guard (:236-239 →
``ErrInvalidFileFormat``), a final-record flush (:342-344), and a sampled
≤1000-record dialect detector (:62-119, four MBOX dialects from From-line
quoting × Content-Length presence). This module is that first mile for image
corpora, Spark-shaped:

* source = ``binaryFile`` (recursive, glob-filtered) — one row per container
  file, exactly the reference's directory walk (tbdedup/mbox/mboxfolder.py:30-51);
* split = ``mapInPandas`` over file contents — each Arrow batch of files
  yields IMAGES rows; per-file parse state never crosses files, so the stage
  is embarrassingly parallel (task-per-file-split, the asyncio fan-out analog);
* errors (empty file, bad first record, truncated record) become ERROR ROWS,
  not job aborts — the quarantine discipline, mirroring the reference's
  raise-per-file semantics which its combinatory driver catches per task.

Container format ("IMGC"), the image-world analog of the MBOX record stream.
Record layout:

    IMGREC <image_id> w=<w> h=<h> fmt=<fmt> phash=<phash> caplen=<c>[ len=<n>]\\n
    <c bytes of caption>\\n
    <n bytes of image payload>\\n

Two dialects, the Content-Length × quoting axes of the reference:

* ``IMGC_CL`` — ``len=`` present: payload read by length (MBOXCL analog;
  robust for arbitrary binary payloads);
* ``IMGC_RD`` — no ``len=``: payload scanned to the next start line, with
  payload lines that begin with ``IMGREC `` (or quoting thereof) escaped by
  a ``>`` prefix on write and unescaped on read (MBOXRD analog).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMGC_CL = "imgc_cl"
IMGC_RD = "imgc_rd"

_START = re.compile(
    rb"^IMGREC (\S+) w=(\d+) h=(\d+) fmt=(\w+) phash=(-?\d+) caplen=(\d+)(?: len=(\d+))?$"
)
_QUOTED = re.compile(rb"^>+IMGREC ")

# split output: IMAGES columns + provenance + error channel
SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("src_path", T.StringType(), False),
        T.StructField("start_offset", T.LongType(), True),
        T.StructField("end_offset", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def write_container(path: str, rows, dialect: str = IMGC_CL) -> None:
    """Test/generation helper (driver-side): serialize IMAGES-shaped tuples
    ``(image_id, bytes, w, h, fmt, caption, phash)`` into one container."""
    with open(path, "wb") as f:
        for image_id, data, w, h, fmt, caption, phash in rows:
            cap = (caption or "").encode("utf-8")
            data = bytes(data)
            head = (
                f"IMGREC {image_id} w={w} h={h} fmt={fmt} phash={phash} caplen={len(cap)}"
            )
            if dialect == IMGC_CL:
                head += f" len={len(data)}"
                f.write(head.encode() + b"\n" + cap + b"\n" + data + b"\n")
            else:  # IMGC_RD: quote payload lines that would look like starts
                quoted = b"\n".join(
                    b">" + ln if (ln.startswith(b"IMGREC ") or _QUOTED.match(ln)) else ln
                    for ln in data.split(b"\n")
                )
                f.write(head.encode() + b"\n" + cap + b"\n" + quoted + b"\n")


def detect_container_type(content: bytes, sample_n: int = 1000) -> str:
    """Sampled dialect detection — the O2 analog of
    ``Mailbox.detect_mbox_type`` (tbdedup/mbox/mboxfile.py:62-119): classify
    from the first ≤``sample_n`` records' start lines only (len= presence =
    the Content-Length axis; ``>IMGREC`` quoting = the MBOXRD axis)."""
    has_len = False
    seen = 0
    for ln in content.split(b"\n"):
        m = _START.match(ln)
        if m:
            seen += 1
            if m.group(7) is not None:
                has_len = True
        if seen >= sample_n:
            break
    return IMGC_CL if has_len else IMGC_RD


def split_container(content: bytes, src_path: str) -> list[tuple]:
    """One container → SPLIT_SCHEMA tuples. Error semantics mirror the
    reference: empty file and invalid first record yield a single error row
    (ErrEmptyFile / ErrInvalidFileFormat analogs, mboxfile.py:192-196,236-239);
    a truncated record yields an error row for that record only."""
    def err(reason):
        return [(None, None, None, None, None, None, None, src_path, None, None, reason)]

    if not content:
        return err("empty_file")
    nl0 = content.find(b"\n")
    first = content[: nl0 if nl0 != -1 else len(content)]
    if not _START.match(first):
        return err("invalid_first_record")

    out = []
    pos = 0  # byte offset of the current line — pure offset scan, O(file)
    n = len(content)
    while pos < n:
        nl = content.find(b"\n", pos)
        line_end = nl if nl != -1 else n
        ln = content[pos:line_end]
        m = _START.match(ln)
        if m is None:
            if ln:  # stray bytes between records (blank trailing line is fine)
                out.append((None, None, None, None, None, None, None, src_path, pos, None, "stray_data"))
            pos = line_end + 1
            continue
        start_off = pos
        image_id = m.group(1).decode()
        w, h = int(m.group(2)), int(m.group(3))
        fmt = m.group(4).decode()
        phash, caplen = int(m.group(5)), int(m.group(6))
        body_off = line_end + 1
        cap_blob = content[body_off : body_off + caplen]
        if len(cap_blob) < caplen:
            out.append((None, None, None, None, None, None, None, src_path, start_off, None, "truncated_caption"))
            break
        caption = cap_blob.decode("utf-8", errors="replace")
        data_off = body_off + caplen + 1  # + '\n'
        if m.group(7) is not None:  # IMGC_CL: read by length
            dlen = int(m.group(7))
            data = content[data_off : data_off + dlen]
            if len(data) < dlen:
                out.append((None, None, None, None, None, None, None, src_path, start_off, None, "truncated_payload"))
                break
            end_off = data_off + dlen + 1
        else:  # IMGC_RD: scan to the next start line, unquote
            j = content.find(b"\nIMGREC ", max(data_off - 1, 0))
            end_off = (j + 1) if j != -1 else n
            raw = content[data_off:end_off]
            if raw.endswith(b"\n"):
                raw = raw[:-1]
            data = b"\n".join(
                ln2[1:] if _QUOTED.match(ln2) else ln2 for ln2 in raw.split(b"\n")
            )
        pos = end_off
        out.append((image_id, data, w, h, fmt, caption, phash, src_path, start_off, end_off, None))
    return out


def split_records(files: DataFrame) -> DataFrame:
    """``binaryFile`` rows → SPLIT_SCHEMA rows via ``mapInPandas`` (the
    flatMap shape of the reference's buildSummary generator). Python loops
    only over files-per-Arrow-batch; the per-record scan is regex + slicing
    over in-memory bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SPLIT_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(split_container(bytes(content), path))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(gen, schema=SPLIT_SCHEMA)


def read_images_from_containers(
    spark: SparkSession,
    input_dir: str,
    pattern: str = "*.imgc",
    recursive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(IMAGES-schema DataFrame, error rows (src_path, start_offset, reason)).

    The full first mile: recursive directory scan (mboxfolder.py:30-51) →
    per-file record split → valid rows as the standard IMAGES relation,
    errors as quarantine-able rows."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(input_dir)
    )
    split = split_records(files)
    images = split.filter(F.col("error").isNull()).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )
    errors = split.filter(F.col("error").isNotNull()).select(
        "src_path", "start_offset", F.col("error").alias("reason")
    )
    return images, errors
