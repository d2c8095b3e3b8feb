"""Baseline JPEG decoder tests.  The fixtures are produced by a minimal
spec-built encoder (forward DCT + quantization + canonical Huffman coding
per ITU T.81) defined here — no Pillow in this container, so encoder and
decoder are independent implementations of the same public spec, sharing
only the DCT basis definition."""

import struct

import numpy as np
import pytest

from morph_kgc_ray.ops.jpeg import ZIGZAG, decode_jpeg


# ---------------------------------------------------------------------------
# minimal spec-built encoder (test-only)
# ---------------------------------------------------------------------------

def _dct_basis():
    x = np.arange(8)
    A = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    A[0] /= np.sqrt(2)
    return A


_A = _dct_basis()


def _fdct2(block):
    return _A @ block @ _A.T


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _magnitude_bits(v: int, n: int) -> tuple[int, int]:
    """(bits, nbits) of the T.81 magnitude encoding (EXTEND inverse)."""
    if v < 0:
        v = v + (1 << n) - 1
    return v, n


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _canonical_table(symbols: list) -> tuple[bytes, bytes, dict]:
    """Fixed-length canonical Huffman over the distinct symbols (enough
    codes of length L = ceil(log2(count+1)) so the all-ones code is free)."""
    vals = sorted(set(symbols))
    L = max(2, (len(vals) + 1 - 1).bit_length())
    assert len(vals) < (1 << L)
    bits = bytearray(16)
    bits[L - 1] = len(vals)
    codes = {v: (i, L) for i, v in enumerate(vals)}
    return bytes(bits), bytes(vals), codes


def encode_jpeg(pixels: np.ndarray, sampling: str = '4:4:4',
                quant: 'np.ndarray | None' = None) -> bytes:
    """Baseline JPEG bytes for (h, w) grayscale or (h, w, 3) RGB uint8.
    ``sampling``: '4:4:4' or '4:2:0' (RGB only)."""
    if pixels.ndim == 2:
        comps_px = [pixels.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        px = pixels.astype(np.float64)
        Y = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        Cb = -0.168736 * px[..., 0] - 0.331264 * px[..., 1] + 0.5 * px[..., 2] + 128.0
        Cr = 0.5 * px[..., 0] - 0.418688 * px[..., 1] - 0.081312 * px[..., 2] + 128.0
        if sampling == '4:2:0':
            h, w = Y.shape
            Cb = Cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            Cr = Cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        comps_px = [Y - 128.0, Cb - 128.0, Cr - 128.0]

    q = quant if quant is not None else np.ones(64, np.int32)
    H, W = (pixels.shape[0], pixels.shape[1])
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    # pad each component plane to its MCU grid
    padded = []
    for (hs, vs), p in zip(samp, comps_px):
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.zeros((ph, pw))
        pp[:p.shape[0], :p.shape[1]] = p
        pp[p.shape[0]:, :p.shape[1]] = p[-1:, :]  # edge-extend
        pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1:p.shape[1]]
        padded.append(pp)

    # quantized zigzag blocks per component, then the MCU-interleaved
    # symbol stream (two passes: collect symbols, then emit)
    def blocks_of(ci):
        hs, vs = samp[ci]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        blk = _fdct2(padded[ci][y0:y0 + 8, x0:x0 + 8])
                        zz = np.round(blk.reshape(64)[ZIGZAG] / q).astype(int)
                        yield zz

    # interleaved encode order
    def mcu_stream():
        iters = [blocks_of(ci) for ci in range(len(samp))]
        for _ in range(mcus_y * mcus_x):
            for ci in range(len(samp)):
                hs, vs = samp[ci]
                for _ in range(hs * vs):
                    yield ci, next(iters[ci])

    dc_syms, ac_syms = [], []
    pred = [0] * len(samp)
    events = []
    for ci, zz in mcu_stream():
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat = _category(diff)
        dc_syms.append(cat)
        ev = [('dc', cat, diff)]
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                ac_syms.append(0x00)
                ev.append(('ac', 0x00, 0))
                break
            while run > 15:
                ac_syms.append(0xF0)
                ev.append(('ac', 0xF0, 0))
                run -= 16
            size = _category(int(zz[k]))
            sym = (run << 4) | size
            ac_syms.append(sym)
            ev.append(('ac', sym, int(zz[k])))
            k += 1
        events.append((ci, ev))

    dc_bits, dc_vals, dc_codes = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_table(ac_syms)

    w = _BitWriter()
    for ci, ev in events:
        for kind, sym, val in ev:
            codes = dc_codes if kind == 'dc' else ac_codes
            code, ln = codes[sym]
            w.write(code, ln)
            size = sym if kind == 'dc' else (sym & 0x0F)
            if size:
                bits, n = _magnitude_bits(val, size)
                w.write(bits, n)
    w.flush()

    out = bytearray(b'\xff\xd8')

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack('>H', len(payload) + 2) + payload)

    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    ncomp = len(samp)
    sof = bytes([8]) + struct.pack('>HH', H, W) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
    seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(w.out)
    out.extend(b'\xff\xd9')
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_constant_grayscale_roundtrip():
    img = np.full((8, 8), 130, np.uint8)
    px = decode_jpeg(encode_jpeg(img))
    assert px is not None and px.shape == (8, 8, 1)
    assert np.abs(px[..., 0].astype(int) - 130).max() <= 1


def test_random_grayscale_multiblock_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 16), dtype=np.uint8)
    px = decode_jpeg(encode_jpeg(img))
    assert px is not None and px.shape == (24, 16, 1)
    # quant=1 keeps coefficient rounding error <= 0.5 each; pixel error stays
    # within a few levels after the float DCT/IDCT round trip
    assert np.abs(px[..., 0].astype(int) - img.astype(int)).max() <= 4


def test_rgb_444_roundtrip():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(16, 8, 3), dtype=np.uint8)
    px = decode_jpeg(encode_jpeg(img, sampling='4:4:4'))
    assert px is not None and px.shape == (16, 8, 3)
    # color conversion + DCT rounding: small per-channel tolerance
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 8


def test_rgb_420_subsampling_decodes():
    # smooth chroma so 2x2 averaging + nearest upsampling reconstructs well
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(x * 8 + 64).clip(0, 255),
                    (y * 8 + 32).clip(0, 255),
                    np.full((16, 16), 90)], axis=-1).astype(np.uint8)
    px = decode_jpeg(encode_jpeg(img, sampling='4:2:0'))
    assert px is not None and px.shape == (16, 16, 3)
    assert np.abs(px.astype(int) - img.astype(int)).mean() <= 6


def test_nonuniform_quant_table_applies():
    q = np.ones(64, np.int32)
    q[0] = 16  # coarse DC quantization
    img = np.full((8, 8), 200, np.uint8)
    px = decode_jpeg(encode_jpeg(img, quant=q))
    assert px is not None
    # DC (200-128)*8 = 576 -> 576/16 = 36 exactly, so still lossless here
    assert np.abs(px[..., 0].astype(int) - 200).max() <= 1


def test_non_jpeg_and_progressive_rejected():
    assert decode_jpeg(b'PNG not a jpeg') is None
    blob = bytearray(encode_jpeg(np.full((8, 8), 10, np.uint8)))
    i = blob.find(b'\xff\xc0')
    blob[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert decode_jpeg(bytes(blob)) is None


def test_package_gray_encoder_exact_on_constant_blocks():
    """encode_gray_jpeg (the oracle-query fixture generator) round-trips
    blockwise-constant images EXACTLY, including non-multiple-of-8 sizes
    (MCU edge padding + multi-block scans)."""
    from morph_kgc_ray.ops.jpeg import encode_gray_jpeg
    for v, (h, w) in [(0, (8, 8)), (255, (11, 13)), (130, (9, 24)), (7, (16, 17))]:
        px = decode_jpeg(encode_gray_jpeg(np.full((h, w), v, np.uint8)))
        assert px is not None and px.shape == (h, w, 1)
        assert (px[..., 0] == v).all(), (v, h, w)
    # and a random multi-block grayscale stays within DCT rounding tolerance
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(17, 10), dtype=np.uint8)
    px = decode_jpeg(encode_gray_jpeg(img))
    assert np.abs(px[..., 0].astype(int) - img.astype(int)).max() <= 4


def test_decode_image_bytes_routes_jpeg():
    from morph_kgc_ray.ops.multimodal import decode_image_bytes
    img = np.full((8, 8), 55, np.uint8)
    px = decode_image_bytes(encode_jpeg(img))
    assert px is not None and px.shape == (8, 8, 1)
    assert np.abs(px[..., 0].astype(int) - 55).max() <= 1
