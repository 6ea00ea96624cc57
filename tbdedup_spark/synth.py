"""Deterministic synthetic image+caption corpus with planted duplicates.

Blueprint: the reference's test corpus generator, which synthesizes emails
with deterministic structure and planted duplicate classes
(reference: tests/base.py:144-416, GenerateMboxFile tests/base.py:361-416).
Shapes follow FIXTURES.md: F1 ``images`` (exact input_hint schema),
F2 ``golden_clusters`` (trusted single-node oracle), F3 ``golden_pairs``,
F4 ``mbox_semantics`` (metadata-only-difference canonicalization fixture).

Everything is seeded numpy ``default_rng`` — no wall-clock, no ``random``
module (the reference's timestamped output names, tbdedup/planner/output.py:
26-78, are exactly what we must NOT do inside deterministic generation).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codecs

# 8000 distinct words (3-syllable products): vocabulary diversity models
# real caption corpora. With a small vocabulary (30 words, then 400) every
# pair of unrelated captions shares enough 5-char shingles to LSH-collide —
# at 75k rows that produced 14M junk candidate pairs whose Jaccard-verify
# dominated the pipeline. Planted duplicate classes are unaffected (they
# share/transform whole captions); unrelated rows now rarely collide, so
# buckets reflect genuine duplicate structure (hot-bucket handling is
# covered by tests/test_skew.py with constructed skew).
_SYL_A = "ba co di fu gra hel ki lo mun nor pe qui ra sto tu ve wi xa yo zen".split()
_SYL_B = "rin tal mor fex lua dri pon sk vel na zu qi ma ther ost ci gu by ren wa".split()
_SYL_C = "da el fi go hu ja ka li mo nu po ri sa te ul vo wy xi ya zo".split()
VOCAB = [a + b + c for a in _SYL_A for b in _SYL_B for c in _SYL_C]

DUP_CLASSES = ("exact", "reencode", "perturb", "paraphrase", "contain", "distinct")


@dataclass
class Row:
    image_id: str
    data: bytes
    w: int
    h: int
    fmt: str
    caption: str
    phash: int
    # oracle-only bookkeeping (not part of the F1 schema)
    dup_class: str = "base"
    base_id: str = ""
    pixels: np.ndarray | None = field(default=None, repr=False)


def _base_pixels(rng: np.random.Generator, sizes: tuple = (64, 96, 128)) -> np.ndarray:
    """Procedural image: seeded gradient + random rectangles. Sizes from
    {64, 96, 128}^2 per FIXTURES.md (tests); the bench corpus passes larger
    sizes so per-row decode cost is representative of real images."""
    w = int(rng.choice(list(sizes)))
    h = int(rng.choice(list(sizes)))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * rng.integers(1, 4) + yy * rng.integers(0, 3)) % 256,
            (yy * rng.integers(1, 4) + int(rng.integers(0, 256))) % 256,
            ((xx + yy) * rng.integers(1, 3) + int(rng.integers(0, 256))) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    for _ in range(int(rng.integers(2, 6))):
        x0, y0 = int(rng.integers(0, w - 8)), int(rng.integers(0, h - 8))
        rw, rh = int(rng.integers(8, w - x0)), int(rng.integers(8, h - y0))
        base[y0 : y0 + rh, x0 : x0 + rw] = rng.integers(0, 256, 3, dtype=np.uint8)
    return base


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(8, 25))
    return " ".join(VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), n))


def _perturb(pixels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Nudge <=1% of pixels by +-2 (PSNR >= 40 dB per FIXTURES.md)."""
    out = pixels.astype(np.int16).copy()
    h, w, _ = out.shape
    n = max(1, int(0.01 * h * w))
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    out[ys, xs] += rng.choice([-2, 2], (n, 3)).astype(np.int16)
    return np.clip(out, 0, 255).astype(np.uint8)


def _paraphrase(caption: str, rng: np.random.Generator) -> str:
    toks = caption.split()
    for _ in range(int(rng.integers(1, 3))):
        toks[int(rng.integers(0, len(toks)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
    return " ".join(toks)


def rows_for_base(base_idx: int, seed: int = 42, sizes: tuple = (64, 96, 128)) -> list[Row]:
    """All rows derived from one base: 1 base + 0-3 planted derivatives.

    Seeded per base index (``default_rng([seed, base_idx])``), so the corpus
    is identical whether generated sequentially on the driver or distributed
    across executors in any partitioning — the no-RNG-in-workers discipline
    (contrast the reference's wall-clock names, tbdedup/planner/output.py:26-78).
    """
    rng = np.random.default_rng([seed, base_idx])
    rows: list[Row] = []
    counter = 0

    def make_id() -> str:
        nonlocal counter
        counter += 1
        return f"img{base_idx:09d}_{counter - 1:02d}"

    px = _base_pixels(rng, sizes)
    cap = _caption(rng)
    fmt = "png" if rng.random() < 0.7 else "jpeg"
    if fmt == "png":
        data = codecs.encode_png(px)
        stored_px = px
    else:
        data = codecs.encode_fake_jpeg(px)
        stored_px = codecs.decode_fake_jpeg(data)  # lossy: stored != source
    base_id = make_id()
    h, w, _ = px.shape
    rows.append(
        Row(base_id, data, w, h, fmt, cap, codecs.phash64(stored_px), "base", base_id, stored_px)
    )

    n_deriv = int(rng.integers(0, 4))
    classes = rng.choice(DUP_CLASSES, n_deriv)
    for cls in classes:
        did = make_id()
        if cls == "exact":
            rows.append(Row(did, data, w, h, fmt, cap, codecs.phash64(stored_px), "exact", base_id, stored_px))
        elif cls == "reencode":
            # same source pixels, lossy re-encode (PNG -> fake JPEG)
            d2 = codecs.encode_fake_jpeg(stored_px)
            px2 = codecs.decode_fake_jpeg(d2)
            rows.append(Row(did, d2, w, h, "jpeg", cap, codecs.phash64(px2), "reencode", base_id, px2))
        elif cls == "perturb":
            px2 = _perturb(stored_px, rng)
            d2 = codecs.encode_png(px2)
            rows.append(Row(did, d2, w, h, "png", cap, codecs.phash64(px2), "perturb", base_id, px2))
        elif cls == "paraphrase":
            cap2 = _paraphrase(cap, rng)
            rows.append(Row(did, data, w, h, fmt, cap2, codecs.phash64(stored_px), "paraphrase", base_id, stored_px))
        elif cls == "contain":
            cap2 = cap + " " + _caption(rng)
            rows.append(Row(did, data, w, h, fmt, cap2, codecs.phash64(stored_px), "contain", base_id, stored_px))
        else:  # distinct — unrelated negative control
            px2 = _base_pixels(rng, sizes)
            cap2 = _caption(rng)
            d2 = codecs.encode_png(px2)
            h2, w2, _ = px2.shape
            rows.append(Row(did, d2, w2, h2, "png", cap2, codecs.phash64(px2), "distinct", did, px2))
    return rows


def generate_corpus(n_bases: int = 200, seed: int = 42, sizes: tuple = (64, 96, 128)) -> list[Row]:
    """``n_bases`` base rows, each with 0-3 planted derivatives (FIXTURES F1).
    Driver-side convenience over ``rows_for_base`` (the distributed generator
    in ``synth_dist.py`` calls the same per-base function, so small-scale test
    corpora and large-scale bench corpora share one definition)."""
    out: list[Row] = []
    for i in range(n_bases):
        out.extend(rows_for_base(i, seed, sizes))
    return out


def metadata_variant(row: Row, key: str = "Software", value: str = "tbdedup_spark") -> Row:
    """F4: same pixels, different PNG tEXt chunk — canonical sig must match,
    disk sig must differ (the X-Mozilla-* header analog,
    tbdedup/mbox/mboxmessage.py:37-43)."""
    assert row.fmt == "png"
    px = codecs.decode_png(row.data)[0]
    d2 = codecs.encode_png(px, {key: value})
    return Row(row.image_id + "_meta", d2, row.w, row.h, "png", row.caption, row.phash, "exact", row.base_id, px)


# --- trusted single-node oracle (FIXTURES F2/F3) ----------------------------


def shingles(text: str, k: int = 5) -> set[str]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return {t}
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def golden_pairs(
    rows: list[Row],
    jaccard_tau: float = 0.6,
    hamming_d: int = 8,
    shingle_k: int = 5,
) -> list[tuple[str, str, str, float]]:
    """Brute-force O(n^2) duplicate pairs — the trusted oracle, mirroring how
    the reference's tests independently re-implement the hash semantics
    (tests/mbox/test_message.py:178-229). Returns (a_id, b_id, detector, score)
    with a_id < b_id; one row per detector that fires."""
    sh = {r.image_id: shingles(r.caption, shingle_k) for r in rows}
    canon = {r.image_id: codecs.canonical_pixel_bytes(r.data) for r in rows}
    out = []
    srt = sorted(rows, key=lambda r: r.image_id)
    for i, a in enumerate(srt):
        for b in srt[i + 1 :]:
            if canon[a.image_id] == canon[b.image_id] and a.caption == b.caption:
                out.append((a.image_id, b.image_id, "exact", 1.0))
            j = jaccard(sh[a.image_id], sh[b.image_id])
            if j >= jaccard_tau:
                out.append((a.image_id, b.image_id, "minhash", j))
            hd = hamming64(a.phash, b.phash)
            if hd <= hamming_d:
                out.append((a.image_id, b.image_id, "simhash", 1.0 - hd / 64.0))
            ca = " ".join(a.caption.lower().split())
            cb = " ".join(b.caption.lower().split())
            if ca != cb and (ca in cb or cb in ca):
                out.append((a.image_id, b.image_id, "substr", 1.0))
    return out


def golden_clusters(rows: list[Row], pairs: list[tuple[str, str, str, float]]) -> dict[str, str]:
    """Union-find over oracle pairs; cluster_id = min image_id (smallest-id
    rule — the deterministic refinement of 'take the first entry',
    tbdedup/dedup/__init__.py:156-157)."""
    parent: dict[str, str] = {r.image_id: r.image_id for r in rows}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {r.image_id: find(r.image_id) for r in rows}


def to_spark_rows(rows: list[Row]) -> list[tuple]:
    """F1 tuples in IMAGES schema order."""
    return [(r.image_id, r.data, r.w, r.h, r.fmt, r.caption, r.phash) for r in rows]


# --- distributed media corpora (driver-contract audio/video dedup) -----------
#
# The driver's testdata ships no media tables, so the audio/video detector
# queries synthesize their input IN-QUERY: a spark.range over ids feeds a
# map-only Arrow stage that renders each clip from seeded numpy — fully
# distributed (no driver-side byte generation; at 10^12 rows the range
# splits across executors like any other source) and deterministic (every
# RNG is keyed by the row id, never wall-clock). Planted structure: row
# i >= n_orig is a near-duplicate of row i - n_orig; distinct bases are
# i.i.d. random, so their 64-bit fingerprints stay far apart in Hamming
# space w.h.p. and the banded detectors recover exactly the planted pairs.
# Reference analog: the deterministic planted-duplicate test corpus
# (reference tests/base.py:144-416).

MEDIA_SCHEMA = "media_id string, bytes binary"


def audio_corpus(spark, n_orig: int = 32, n_dup: int = 16,
                 rate: int = 8000, seed: int = 42):
    """(media_id, bytes) PCM16 WAV rows: au0000..au{n_orig-1} are random
    8-note melodies; au{n_orig+j} is a volume-scaled (0.7x), lightly-noised
    copy of au{j} — the planted near-dup set for ``audio_near_dups``."""
    import pandas as pd

    total = n_orig + n_dup
    assert n_dup <= n_orig

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = i if i < n_orig else i - n_orig
                brng = np.random.default_rng(seed * 1_000_003 + j)
                t = np.arange(rate // 4) / rate
                freqs = brng.uniform(150.0, 3600.0, 8)
                clip = np.concatenate([0.6 * np.sin(2 * np.pi * f * t) for f in freqs])
                if i >= n_orig:
                    nrng = np.random.default_rng(seed * 2_000_003 + i)
                    clip = 0.7 * clip + nrng.normal(0.0, 0.002, clip.shape)
                rows.append((f"au{i:04d}", codecs.encode_wav(clip, rate)))
            yield pd.DataFrame(rows, columns=["media_id", "bytes"])

    return spark.range(total).repartition(8).mapInPandas(gen, MEDIA_SCHEMA)


def video_corpus(spark, n_orig: int = 24, n_dup: int = 12, seed: int = 42):
    """(media_id, bytes) fake-container videos: vd{j} holds two seeded
    content frames (+2 noise frames); vd{n_orig+j} re-uses base j's content
    frames at different positions among its own noise — the planted
    cross-video shared-frame set for ``frame_near_dups``."""
    import pandas as pd

    from .operators.multimodal import encode_fake_video

    total = n_orig + n_dup
    assert n_dup <= n_orig

    def gen(batches):
        frame = lambda rng: rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = i if i < n_orig else i - n_orig
                brng = np.random.default_rng(seed * 3_000_017 + j)
                content = [frame(brng) // 32 * 32 for _ in range(2)]
                own = np.random.default_rng(seed * 4_000_037 + i)
                if i < n_orig:
                    frames = [content[0], frame(own), content[1], frame(own)]
                else:
                    frames = [frame(own), content[1], frame(own), content[0]]
                rows.append((f"vd{i:04d}", encode_fake_video(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "bytes"])

    return spark.range(total).repartition(8).mapInPandas(gen, MEDIA_SCHEMA)


def rotated_corpus(spark, n_orig: int = 40, n_dup: int = 20, seed: int = 42):
    """(image_id, bytes) PNG rows: im{j} (j < n_orig) are procedural base
    images; im{n_orig+j} is base j's pixels under a seeded NON-identity
    dihedral transform (rot90/180/270, mirrored or not) with a light
    perturbation — the planted rotated-re-upload set for
    ``multimodal.dihedral_near_dups`` (invisible to plain stored-orientation
    pHash, by design)."""
    import pandas as pd

    from .operators.multimodal import dihedral_transforms

    total = n_orig + n_dup
    assert n_dup <= n_orig

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = i if i < n_orig else i - n_orig
                brng = np.random.default_rng(seed * 5_000_011 + j)
                px = _base_pixels(brng)
                if i >= n_orig:
                    own = np.random.default_rng(seed * 6_000_083 + i)
                    o = int(own.integers(1, 8))  # never the identity
                    px = _perturb(
                        np.ascontiguousarray(dihedral_transforms(px)[o]), own
                    )
                rows.append((f"im{i:04d}", codecs.encode_png(px)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return (
        spark.range(total)
        .repartition(8)
        .mapInPandas(gen, "image_id string, bytes binary")
    )


def _speckled_base(seed: int, j: int) -> np.ndarray:
    """Procedural base image + bright speckles on a jittered 10-px grid:
    spacing >= 6 px guarantees each is an ISOLATED strict local max (random
    placement leaves unlucky crops keypoint-free — adjacent speckles
    suppress each other under the keypoint detector's strict-max rule)."""
    brng = np.random.default_rng(seed * 7_000_003 + j)
    px = _base_pixels(brng, sizes=(96, 128, 160)).copy()
    h, w, _ = px.shape
    gy, gx = np.mgrid[5 : h - 5 : 10, 5 : w - 5 : 10]
    ys = np.clip(gy + brng.integers(-2, 3, gy.shape), 0, h - 1)
    xs = np.clip(gx + brng.integers(-2, 3, gx.shape), 0, w - 1)
    px[ys.ravel(), xs.ravel()] = 255
    return px


def cropped_corpus(spark, n_orig: int = 40, n_dup: int = 20, seed: int = 42):
    """(image_id, bytes) PNG rows: im{j} (j < n_orig) are procedural base
    images with a deterministic speckle layer (isolated bright pixels — the
    texture stand-in real photographs have and pure gradients lack, which
    the keypoint detector anchors on); im{n_orig+j} is a seeded CROP of base
    j (each margin removes 4..dim/4 pixels, so >= half the area survives) —
    the planted cropped-re-upload set for
    ``multimodal.crop_resistant_near_dups``. Whole-image pHash is blind to
    these by design (cropping shifts every DCT coefficient), asserted in
    tests."""
    import pandas as pd

    total = n_orig + n_dup
    assert n_dup <= n_orig

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = i if i < n_orig else i - n_orig
                px = _speckled_base(seed, j)
                h, w, _ = px.shape
                if i >= n_orig:
                    own = np.random.default_rng(seed * 8_000_009 + i)
                    t, b = int(own.integers(4, h // 4)), int(own.integers(4, h // 4))
                    l, r = int(own.integers(4, w // 4)), int(own.integers(4, w // 4))
                    px = np.ascontiguousarray(px[t : h - b, l : w - r])
                rows.append((f"im{i:04d}", codecs.encode_png(px)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return (
        spark.range(total)
        .repartition(8)
        .mapInPandas(gen, "image_id string, bytes binary")
    )


def crop_tier_corpus(
    spark,
    n_hist: int = 40,
    n_crop: int = 10,
    n_exact: int = 10,
    n_near: int = 10,
    n_new: int = 10,
    seed: int = 42,
):
    """(image_id, bytes) corpus for the 4-tier batch-vs-history image dedup:
    hist{j} are the already-ingested speckled bases; the NEW batch plants one
    class per tier — copy{j} re-uploads base j's bytes verbatim ('exact'),
    near{j} is base (n_exact+j) lightly perturbed, PSNR >= 40 dB ('near':
    pHash-close), crop{j} crops base (n_exact+n_near+j) with margins
    dim/8..dim/4 ('crop': pHash-FAR by construction but interior keypoint
    patches identical), and new{j} are fresh bases from a disjoint seed
    stream ('unique'). Classes use disjoint history bases so each verdict is
    attributable."""
    import pandas as pd

    assert n_exact + n_near + n_crop <= n_hist
    total = n_hist + n_crop + n_exact + n_near + n_new

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_hist:
                    rows.append((f"hist{i:04d}", codecs.encode_png(_speckled_base(seed, i))))
                    continue
                k = i - n_hist
                if k < n_exact:
                    rows.append((f"copy{k:04d}", codecs.encode_png(_speckled_base(seed, k))))
                elif k < n_exact + n_near:
                    j = k - n_exact
                    px = _speckled_base(seed, n_exact + j)
                    own = np.random.default_rng(seed * 9_000_011 + j)
                    rows.append((f"near{j:04d}", codecs.encode_png(_perturb(px, own))))
                elif k < n_exact + n_near + n_crop:
                    j = k - n_exact - n_near
                    px = _speckled_base(seed, n_exact + n_near + j)
                    h, w, _ = px.shape
                    own = np.random.default_rng(seed * 9_100_019 + j)
                    t, b = int(own.integers(h // 8, h // 4)), int(own.integers(h // 8, h // 4))
                    l, r = int(own.integers(w // 8, w // 4)), int(own.integers(w // 8, w // 4))
                    rows.append(
                        (f"crop{j:04d}",
                         codecs.encode_png(np.ascontiguousarray(px[t : h - b, l : w - r])))
                    )
                else:
                    j = k - n_exact - n_near - n_crop
                    rows.append(
                        (f"new{j:04d}",
                         codecs.encode_png(_speckled_base(seed + 777_001, 50_000 + j)))
                    )
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return (
        spark.range(total)
        .repartition(8)
        .mapInPandas(gen, "image_id string, bytes binary")
    )
