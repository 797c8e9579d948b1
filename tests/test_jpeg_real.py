"""Baseline-JPEG real pixel decode (pure stdlib + numpy).

The fixtures are produced by a minimal test-side ENCODER (numpy forward
DCT + canonical fixed-length Huffman tables) so the roundtrip needs no
codec library: encode here → decode with the production
`_jpeg_pixels` → compare pixels.  The encoder emits its own DHT
segments (all-DC-at-4-bits / all-AC-at-8-bits canonical tables), which
also exercises the decoder against non-Annex-K tables.

Reference behavior mirrored: orf/archive-to-parquet has no media
decode; this is the training-pipeline extension (SURVEY.md §2 north
star), with the codec boundary kept loud for unsupported processes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from archive_to_parquet_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    _jpeg_pixels,
    _jpeg_unsupported_kind,
    _real_decode_image,
    decode_pixels,
    perceptual_hash,
)

# ---------------------------------------------------------------- encoder


def _dct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    basis = np.cos((2 * x + 1) * u * np.pi / 16.0) * 0.5
    basis[0, :] *= 1.0 / np.sqrt(2.0)
    return basis


# Canonical fixed-length tables: DC categories 0..11 all at 4 bits,
# AC symbols (EOB, ZRL, every (run 0..15, size 1..10)) all at 8 bits.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _fixed_table(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for an all-one-length canonical table."""
    assert len(symbols) < (1 << length)  # keep the all-ones code unused
    return {sym: (i, length) for i, sym in enumerate(symbols)}


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter,
    zz: list[int],
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    diff = zz[0] - pred
    t = _category(diff)
    code, ln = dc_tbl[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(zz[k])
        code, ln = ac_tbl[(run << 4) | s]
        bw.put(code, ln)
        v = zz[k]
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]
        bw.put(code, ln)
    return zz[0]


def _pad_to_blocks(img: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = img.shape
    ph = (h + bh - 1) // bh * bh
    pw = (w + bw - 1) // bw * bw
    return np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")


def _block_zigzag(block: np.ndarray, qmat: np.ndarray) -> list[int]:
    basis = _dct_basis()
    coeffs = basis @ (block.astype(np.float64) - 128.0) @ basis.T
    quant = np.round(coeffs / qmat).astype(np.int64)
    flat = quant.ravel()
    return [int(flat[_JPEG_ZIGZAG[k]]) for k in range(64)]


def _headers(
    w: int, h: int, comps: list[tuple[int, int, int, int]], qts: list[list[int]]
) -> bytes:
    out = bytearray(b"\xff\xd8")
    for tq, table_zz in enumerate(qts):
        body = bytes([tq]) + bytes(table_zz)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_SYMBOLS, 4)
    out += _dht_segment(1, 0, _AC_SYMBOLS, 8)
    return bytes(out)


def _sos(comps: list[int]) -> bytes:
    body = bytes([len(comps)])
    for cid in comps:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0 for all
    body += bytes([0, 63, 0])  # spectral selection (fixed for baseline)
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def make_jpeg_gray(
    img: np.ndarray, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Single-component baseline JPEG of a (H, W) uint8 image."""
    h, w = img.shape
    qmat_zz = [quant] * 64
    qmat = np.full((8, 8), float(quant))
    dc_tbl = _fixed_table(_DC_SYMBOLS, 4)
    ac_tbl = _fixed_table(_AC_SYMBOLS, 8)
    out = bytearray(_headers(w, h, [(1, 1, 1, 0)], [qmat_zz]))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _sos([1])
    padded = _pad_to_blocks(img, 8, 8)
    bw = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for y0 in range(0, padded.shape[0], 8):
        for x0 in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = 0
            zz = _block_zigzag(padded[y0 : y0 + 8, x0 : x0 + 8], qmat)
            pred = _encode_block(bw, zz, pred, dc_tbl, ac_tbl)
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def make_jpeg_rgb(rgb: np.ndarray, subsample: bool = False) -> bytes:
    """3-component YCbCr baseline JPEG (4:4:4, or 4:2:0 with
    ``subsample=True``) of a (H, W, 3) uint8 image, quant all-ones."""
    h, w, _ = rgb.shape
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qmat = np.ones((8, 8))
    dc_tbl = _fixed_table(_DC_SYMBOLS, 4)
    ac_tbl = _fixed_table(_AC_SYMBOLS, 8)
    if subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        # 2×2 box-mean chroma; pad planes to the 16×16 MCU grid
        yp = _pad_to_blocks(np.clip(np.round(y), 0, 255), 16, 16)
        ypad_h, ypad_w = yp.shape
        cb_full = _pad_to_blocks(np.clip(np.round(cb), 0, 255), 16, 16)
        cr_full = _pad_to_blocks(np.clip(np.round(cr), 0, 255), 16, 16)
        cbs = cb_full.reshape(ypad_h // 2, 2, ypad_w // 2, 2).mean(axis=(1, 3))
        crs = cr_full.reshape(ypad_h // 2, 2, ypad_w // 2, 2).mean(axis=(1, 3))
        planes = [yp, np.round(cbs), np.round(crs)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
        planes = [
            _pad_to_blocks(np.clip(np.round(p), 0, 255), 8, 8)
            for p in (y, cb, cr)
        ]
    out = bytearray(_headers(w, h, comps, [[1] * 64]))
    out += _sos([1, 2, 3])
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_h = 16 if subsample else 8
    mcu_w = 16 if subsample else 8
    for my in range(0, planes[0].shape[0], mcu_h):
        for mx in range(0, planes[0].shape[1], mcu_w):
            for ci, (cid, hi, vi, _tq) in enumerate(comps):
                plane = planes[ci]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my // mcu_h) * vi * 8 + by * 8
                        x0 = (mx // mcu_w) * hi * 8 + bx * 8
                        zz = _block_zigzag(
                            plane[y0 : y0 + 8, x0 : x0 + 8], qmat
                        )
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_tbl, ac_tbl
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def make_progressive_stub(w: int = 8, h: int = 8) -> bytes:
    """Minimal SOF2 (progressive) JPEG header — enough for the marker
    walk to classify it; no decodable scan."""
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", len(sof) + 2)
        + sof
        + b"\xff\xd9"
    )


# ----------------------------------------------------------------- tests


def test_gray_roundtrip_quant1_near_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)  # non-8-multiple
    blob = make_jpeg_gray(img)
    got = _jpeg_pixels(blob)
    assert got is not None and got.shape == (24, 17)
    # quant=1 roundtrip: only fdct-round + float error survives
    assert np.abs(got - img.astype(np.float64)).max() <= 2.0


def test_gray_constant_image_exact():
    img = np.full((8, 8), 77, dtype=np.uint8)
    got = _jpeg_pixels(make_jpeg_gray(img))
    assert got is not None
    assert np.allclose(got, 77.0, atol=1e-9)


def test_gray_matches_quant_simulation_exactly():
    """Decoder output must equal the numpy simulation of
    quantize→dequantize→IDCT bit-for-bit (same float ops)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    quant = 8
    blob = make_jpeg_gray(img, quant=quant)
    got = _jpeg_pixels(blob)
    basis = _dct_basis()
    expect = np.empty((16, 16))
    for y0 in range(0, 16, 8):
        for x0 in range(0, 16, 8):
            block = img[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            q = np.round(basis @ block @ basis.T / quant) * quant
            expect[y0 : y0 + 8, x0 : x0 + 8] = basis.T @ q @ basis + 128.0
    assert got is not None
    assert np.allclose(got, np.clip(expect, 0, 255), atol=1e-9)


def test_gray_restart_markers():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 40), dtype=np.uint8)  # 5 MCUs
    blob = make_jpeg_gray(img, restart_interval=2)
    assert b"\xff\xd0" in blob  # RST0 actually emitted
    got = _jpeg_pixels(blob)
    assert got is not None
    assert np.abs(got - img.astype(np.float64)).max() <= 2.0


def test_rgb_444_yields_luma_plane():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = _jpeg_pixels(make_jpeg_rgb(rgb))
    y = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.float64)
    assert got is not None and got.shape == (16, 16)
    assert np.abs(got - y).max() <= 2.0


def test_rgb_420_subsampled_chroma_stays_in_sync():
    """4:2:0 MCUs interleave 4 Y + Cb + Cr blocks; the decoder must
    entropy-skip chroma correctly or the Y plane corrupts."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    got = _jpeg_pixels(make_jpeg_rgb(rgb, subsample=True))
    y = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.float64)
    assert got is not None and got.shape == (24, 40)
    assert np.abs(got - y).max() <= 2.0


def test_truncated_stream_degrades_to_none():
    img = np.full((16, 16), 100, dtype=np.uint8)
    blob = make_jpeg_gray(img)
    assert _jpeg_pixels(blob[: len(blob) // 2]) is None


def test_progressive_is_loud_in_real_decode_and_none_in_phash():
    blob = make_progressive_stub()
    assert _jpeg_unsupported_kind(blob) == "progressive"
    assert decode_pixels(blob) is None  # phash tier degrades quietly
    assert perceptual_hash(blob) is None
    with pytest.raises(NotImplementedError, match="progressive"):
        _real_decode_image(blob)


def test_baseline_jpeg_real_decode_feature_and_phash():
    """decode='real' returns true pixel stats; phash matches the PGM of
    the same pixels (high-contrast image, so rounding can't flip bits)."""
    from tests.test_phash import make_ppm

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:, 8:] = 230
    img[:, :8] = 20
    blob = make_jpeg_gray(img)
    w, h, channels, feature = _real_decode_image(blob)
    assert (w, h, channels) == (16, 16, 1)
    grid = np.array(feature).reshape(4, 4)
    # left half dark (~20), right half bright (~230): scaled to [-1, 1]
    assert np.allclose(grid[:, :2], 20.0 / 255.0 * 2 - 1, atol=0.05)
    assert np.allclose(grid[:, 2:], 230.0 / 255.0 * 2 - 1, atol=0.05)
    decoded = _jpeg_pixels(blob)
    pgm = make_ppm(
        np.repeat(
            np.clip(np.round(decoded), 0, 255).astype(np.uint8)[:, :, None],
            3,
            axis=2,
        )
    )
    assert perceptual_hash(blob) == perceptual_hash(pgm)


def test_jpeg_header_dims_still_parse():
    from archive_to_parquet_spark.operators.multimodal import parse_image_header

    img = np.full((10, 12), 50, dtype=np.uint8)
    parsed = parse_image_header(make_jpeg_gray(img))
    assert parsed == (12, 10, 1)


def test_fill_bytes_before_markers_still_real_decode():
    """JPEG B.1.1.2 allows runs of 0xFF fill bytes before any marker;
    the marker walks must skip them instead of silently degrading to
    the header/fingerprint tier (ADVICE r5)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    blob = make_jpeg_gray(img)
    # Pad fill bytes before SOF0 and before SOS (headers precede scan
    # data, and the quant=1 DQT body contains no 0xFF, so the first
    # occurrence is the real marker).
    padded = blob.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda", 1
    )
    assert _jpeg_unsupported_kind(padded) is None
    got = _jpeg_pixels(padded)
    assert got is not None and got.shape == (16, 16)
    assert np.array_equal(got, _jpeg_pixels(blob))
    # The unsupported-process walk must also see through fill padding.
    prog = make_progressive_stub().replace(b"\xff\xc2", b"\xff\xff\xff\xc2", 1)
    assert _jpeg_unsupported_kind(prog) == "progressive"
