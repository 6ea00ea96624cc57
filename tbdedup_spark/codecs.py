"""Image codecs for the synthetic corpus and the decode stage.

The container has no image libraries (no PIL/libjpeg/libpng bindings), so per
the build contract the *codec internals* are deterministic stand-ins while all
Spark-side plumbing (binary columns, Arrow batching, UDF signatures) is real:

* ``png``  — a real, spec-conformant subset of PNG: 8-bit RGB, filter type 0,
  zlib IDAT, optional tEXt ancillary chunks. Files round-trip through any
  standard decoder. Our decoder handles exactly what our encoder emits
  (filter 0); decoding arbitrary external PNGs (other filters, interlace,
  palettes) is out of scope and raises ``NotImplementedError``.
* ``jpeg`` — a clearly-marked deterministic FAKE: quantize pixels to the
  nearest multiple of Q (lossy, PSNR ~47 dB at Q=4) and zlib the result
  behind a JPEG SOI marker. Real JPEG DCT entropy coding needs libjpeg,
  absent here. The *semantics* the pipeline needs — "lossy re-encode of the
  same pixels, PSNR >= 40 dB" — hold exactly.

Role in the dedup semantics: PNG tEXt chunks are our analog of the volatile
``X-Mozilla-*`` headers the reference strips before its canonical hash
(reference: tbdedup/mbox/mboxmessage.py:37-43,94-117) — two byte streams
differing only in tEXt metadata must share a canonical signature while their
disk signatures differ.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_FAKE_JPEG_MAGIC = b"\xff\xd8\xff\xe0FAKEJPG1"  # SOI + APP0-ish + our tag
JPEG_QUANT = 4  # quantization step; max abs error Q/2 = 2 -> PSNR ~47 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, text_chunks: dict[str, str] | None = None) -> bytes:
    """Encode HxWx3 uint8 -> PNG bytes (filter 0, zlib level 6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per row
    out = [_PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    for k, v in (text_chunks or {}).items():
        out.append(_chunk(b"tEXt", k.encode("latin1") + b"\x00" + v.encode("latin1")))
    out.append(_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_png(data: bytes) -> tuple[np.ndarray, dict[str, str]]:
    """Decode our PNG subset -> (HxWx3 uint8, tEXt metadata)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w, h = 8, 0, 0
    idat, meta = [], {}
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError("PNG subset: 8-bit RGB non-interlaced only")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"tEXt":
            k, _, v = payload.partition(b"\x00")
            meta[k.decode("latin1")] = v.decode("latin1")
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("PNG subset: filter type 0 only")
    return raw[:, 1:].reshape(h, w, 3).copy(), meta


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE of lossy JPEG (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels.astype(np.int32) + JPEG_QUANT // 2) // JPEG_QUANT * JPEG_QUANT
    q = np.clip(q, 0, 255).astype(np.uint8)
    return (
        _FAKE_JPEG_MAGIC
        + struct.pack(">HH", w, h)
        + zlib.compress(q.tobytes(), 6)
        + b"\xff\xd9"  # EOI
    )


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[: len(_FAKE_JPEG_MAGIC)] != _FAKE_JPEG_MAGIC:
        raise ValueError("not a fake JPEG")
    off = len(_FAKE_JPEG_MAGIC)
    w, h = struct.unpack(">HH", data[off : off + 4])
    raw = zlib.decompress(data[off + 4 : -2])
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3).copy()


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes — the analog of the reference's MBOX dialect
    sniffing (tbdedup/mbox/mboxfile.py:62-119), degenerate because magic
    bytes are unambiguous."""
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)[0]
    if data[: len(_FAKE_JPEG_MAGIC)] == _FAKE_JPEG_MAGIC:
        return decode_fake_jpeg(data)
    raise ValueError("unknown image format")


def canonical_pixel_bytes(data: bytes) -> bytes:
    """Decoded-pixel bytes + dimensions — the canonicalization payload.

    This is the analog of the reference's parsed-message content (headers
    minus volatile ones + body, tbdedup/mbox/mboxmessage.py:94-117): container
    metadata (tEXt chunks, compression level, chunk layout) is stripped; only
    the pixel content identifies the image.
    """
    px = decode_image(data)
    h, w, _ = px.shape
    return struct.pack(">HH", w, h) + px.tobytes()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- perceptual hash (DCT pHash, numpy-only) --------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (classic pHash recipe, numpy-only).

    Grayscale -> area-resample to 32x32 -> 2D DCT -> top-left 8x8 minus DC ->
    median threshold -> 64 bits. Returned as a *signed* int64 (two's
    complement) to match the input_hint's ``phash:int64`` column.
    """
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # area resample to 32x32 via integral image (vectorized, non-multiples ok)
    yi = np.clip(np.linspace(0, h, 33).astype(int), 0, h)
    xi = np.clip(np.linspace(0, w, 33).astype(int), 0, w)
    yi[1:] = np.maximum(yi[1:], yi[:-1] + 1) if h >= 32 else yi[1:]
    xi[1:] = np.maximum(xi[1:], xi[:-1] + 1) if w >= 32 else xi[1:]
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = g.cumsum(0).cumsum(1)
    sums = ii[yi][:, xi]
    block_sum = sums[1:, 1:] - sums[:-1, 1:] - sums[1:, :-1] + sums[:-1, :-1]
    area = (yi[1:] - yi[:-1])[:, None] * (xi[1:] - xi[:-1])[None, :]
    small = block_sum / np.maximum(area, 1)
    m = _dct_matrix(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint64)
    bits[0] = 0  # drop DC
    val = 0
    for i, b in enumerate(bits):
        val |= int(b) << i
    return val - (1 << 64) if val >= (1 << 63) else val


# --- audio: RIFF/WAVE PCM16 (a REAL format — stdlib-grade parse) -------------
#
# Unlike image/video, audio needs no external codec for a faithful end-to-end
# path: PCM16 WAV is a 44-byte RIFF header + raw samples, fully decodable
# with struct + numpy. The reference parses every payload type its record
# split yields (tbdedup/mbox/mboxfile.py:187-344); this is the audio analog.

_WAV_RIFF = b"RIFF"
_WAV_WAVE = b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 RIFF/WAVE encoder. ``samples``: int16 array, shape (n,) mono or
    (n, ch); float inputs in [-1, 1] are quantized to int16. Files play in
    any standard audio tool."""
    pcm = np.asarray(samples)
    if pcm.dtype != np.int16:
        pcm = np.clip(np.asarray(pcm, np.float64), -1.0, 1.0)
        pcm = np.round(pcm * 32767.0).astype(np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )  # PCM, channels, rate, byte rate, block align, bits
    body = (
        _WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples int16 shape (n, ch), sample_rate) from PCM16 RIFF/WAVE.
    Walks the chunk list (tolerates extra chunks like LIST/INFO); raises
    ValueError on non-RIFF bytes or non-PCM16 encodings."""
    if len(data) < 12 or data[:4] != _WAV_RIFF or data[8:12] != _WAV_WAVE:
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, ch, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("truncated fmt chunk")
            codec, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", payload[:16])
            if codec != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding codec={codec} bits={bits}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None or not ch:
        raise ValueError("missing fmt/data chunk")
    usable = len(pcm) - (len(pcm) % (2 * ch))
    return np.frombuffer(pcm[:usable], "<i2").reshape(-1, ch), rate
