"""Codec + canonicalization semantics — the analog of the reference's hash
re-implementation checks (tests/mbox/test_message.py:178-229)."""

import numpy as np
import pytest

from tbdedup_spark import codecs, synth


@pytest.fixture
def px():
    return np.random.default_rng(7).integers(0, 256, (96, 64, 3), dtype=np.uint8)


def test_png_roundtrip(px):
    data = codecs.encode_png(px, {"Author": "test"})
    out, meta = codecs.decode_png(data)
    assert (out == px).all()
    assert meta == {"Author": "test"}


def test_fake_jpeg_lossy_psnr(px):
    data = codecs.encode_fake_jpeg(px)
    out = codecs.decode_fake_jpeg(data)
    assert out.shape == px.shape
    p = codecs.psnr(px, out)
    assert 40.0 <= p < float("inf")  # lossy but over the invariant bound


def test_canonical_ignores_metadata(px):
    """The X-Mozilla-* analog (tbdedup/mbox/mboxmessage.py:37-43): container
    metadata must not change the canonical identity; raw bytes must."""
    a = codecs.encode_png(px)
    b = codecs.encode_png(px, {"Software": "x", "Comment": "y"})
    assert a != b
    assert codecs.canonical_pixel_bytes(a) == codecs.canonical_pixel_bytes(b)


def test_canonical_differs_across_dims(px):
    """Same pixel bytes reshaped (64x96 vs 96x64) must NOT collide —
    dimensions are part of the canonical payload."""
    a = codecs.encode_png(px)
    b = codecs.encode_png(px.reshape(64, 96, 3))
    assert codecs.canonical_pixel_bytes(a) != codecs.canonical_pixel_bytes(b)


def test_decode_dispatch(px):
    assert (codecs.decode_image(codecs.encode_png(px)) == px).all()
    with pytest.raises(ValueError):
        codecs.decode_image(b"not an image at all")


def test_phash_locality(px):
    rng = np.random.default_rng(1)
    h0 = codecs.phash64(px)
    assert -(2**63) <= h0 < 2**63  # signed int64 per input_hint
    pert = synth._perturb(px, rng)
    assert synth.hamming64(h0, codecs.phash64(pert)) <= 7
    jpg = codecs.decode_fake_jpeg(codecs.encode_fake_jpeg(px))
    assert synth.hamming64(h0, codecs.phash64(jpg)) <= 7
    other = rng.integers(0, 256, (96, 64, 3), dtype=np.uint8)
    assert synth.hamming64(h0, codecs.phash64(other)) > 7


def test_corpus_deterministic():
    a = synth.generate_corpus(10, seed=42)
    b = synth.generate_corpus(10, seed=42)
    assert [(r.image_id, r.data, r.caption, r.phash) for r in a] == [
        (r.image_id, r.data, r.caption, r.phash) for r in b
    ]


def test_oracle_connects_derivatives():
    rows = synth.generate_corpus(30, seed=42)
    pairs = synth.golden_pairs(rows)
    clusters = synth.golden_clusters(rows, pairs)
    for r in rows:
        if r.dup_class in ("exact", "reencode", "perturb", "paraphrase", "contain"):
            assert clusters[r.image_id] == clusters[r.base_id], r
