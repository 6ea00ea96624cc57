"""Raw container ingestion: the reference's one-file→N-records split
(tbdedup/mbox/mboxfile.py:187-344) re-expressed as binaryFile + mapInPandas,
with its error semantics (empty file / invalid first record → error rows, not
job aborts) and the sampled dialect detector (:62-119 analog). The detector
test mirrors the reference's parameterized table
(/root/reference/tests/mbox/test_file.py:54-77)."""

import os

import pytest
from pyspark.sql import functions as F

from tbdedup_spark import synth
from tbdedup_spark.sources import containers
from tbdedup_spark.plans.pipeline import run_pipeline


def _corpus_tuples(n_bases=20, seed=9):
    rows = synth.generate_corpus(n_bases=n_bases, seed=seed)
    return synth.to_spark_rows(rows)


@pytest.mark.parametrize("dialect", [containers.IMGC_CL, containers.IMGC_RD])
def test_container_roundtrip(tmp_path, dialect):
    tuples = _corpus_tuples(8)
    # adversarial payload: binary containing a fake start line mid-payload
    evil = list(tuples[0])
    evil[0] = "evil0"
    evil[1] = b"\x89PNG\nIMGREC fake w=1 h=1 fmt=png phash=0 caplen=0\n>IMGREC quoted\ntail"
    tuples = [tuple(evil)] + tuples
    p = str(tmp_path / "a.imgc")
    containers.write_container(p, tuples, dialect=dialect)
    content = open(p, "rb").read()
    assert containers.detect_container_type(content) == dialect
    recs = containers.split_container(content, p)
    assert all(r[-1] is None for r in recs), [r[-1] for r in recs]
    assert len(recs) == len(tuples)
    got = {r[0]: (bytes(r[1]), r[5], r[6]) for r in recs}
    for t in tuples:
        assert got[t[0]] == (bytes(t[1]), t[5], t[6]), t[0]
    # offsets are faithful: re-reading the byte range re-finds the record
    for r in recs:
        assert content[r[8] : r[9]].startswith(b"IMGREC " + r[0].encode())


def test_container_error_semantics(tmp_path):
    assert containers.split_container(b"", "f")[0][-1] == "empty_file"
    assert containers.split_container(b"not a record\n", "f")[0][-1] == "invalid_first_record"
    # truncated payload: error row for that record, no abort
    tuples = _corpus_tuples(2)[:1]
    p = str(tmp_path / "t.imgc")
    containers.write_container(p, tuples, dialect=containers.IMGC_CL)
    content = open(p, "rb").read()[:-20]
    recs = containers.split_container(content, "f")
    assert recs[-1][-1] == "truncated_payload"


def test_detect_container_type_table(tmp_path):
    """The 9-row detector table analog (tests/mbox/test_file.py:54-77):
    dialect x record-count, detection from <=1000 records."""
    for dialect in (containers.IMGC_CL, containers.IMGC_RD):
        for n in (1, 3, 8):
            tuples = _corpus_tuples(max(n, 2))[:n]
            p = str(tmp_path / f"{dialect}_{n}.imgc")
            containers.write_container(p, tuples, dialect=dialect)
            assert containers.detect_container_type(open(p, "rb").read()) == dialect


def test_containers_to_pipeline_e2e(spark, tmp_path):
    """Directory of multi-image container files (nested dirs — recursion) →
    split → pipeline → same clusters as the pre-rowed DataFrame path."""
    from tbdedup_spark import schema

    tuples = _corpus_tuples(20)
    d = tmp_path / "containers" / "nested"
    os.makedirs(d)
    for i in range(4):  # 4 containers, round-robin
        containers.write_container(
            str(d / f"part{i}.imgc"),
            tuples[i::4],
            dialect=containers.IMGC_CL if i % 2 == 0 else containers.IMGC_RD,
        )
    images, errors = containers.read_images_from_containers(
        spark, str(tmp_path / "containers")
    )
    assert errors.count() == 0
    assert images.count() == len(tuples)

    out_c = run_pipeline(spark, images, str(tmp_path / "wh_c"))
    ref_df = spark.createDataFrame(tuples, schema.IMAGES)
    out_r = run_pipeline(spark, ref_df, str(tmp_path / "wh_r"))
    a = sorted((r.image_id, r.cluster_id) for r in out_c["clusters"].collect())
    b = sorted((r.image_id, r.cluster_id) for r in out_r["clusters"].collect())
    assert a == b


def test_container_streaming(spark, tmp_path):
    from tbdedup_spark.streaming import ingest

    tuples = _corpus_tuples(6)
    src = tmp_path / "stream_src" / "sub"
    os.makedirs(src)
    containers.write_container(str(src / "s0.imgc"), tuples, dialect=containers.IMGC_CL)
    q = ingest.stream_signatures_from_containers(
        spark,
        str(tmp_path / "stream_src"),
        str(tmp_path / "stream_out"),
        str(tmp_path / "stream_ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sigs = spark.read.parquet(str(tmp_path / "stream_out"))
    assert sigs.count() == len(tuples)
    assert sigs.filter(F.col("sig").startswith("DECODE_ERROR:")).count() == 0
