"""Baseline JPEG (SOF0/SOF1) decoder — pure numpy + stdlib, written from
the public ITU-T T.81 spec (no Pillow/turbojpeg in this container).

Supported: sequential DCT, Huffman entropy coding, 8-bit samples,
grayscale or 3-component YCbCr with any h/v sampling factors (4:4:4,
4:2:2, 4:2:0 covered by nearest-neighbor chroma upsampling), 8- or 16-bit
quantization tables, restart markers (DRI / RSTn), byte stuffing (FF 00).
Progressive (SOF2), arithmetic coding and 12-bit precision return None —
this is the conformance-scale decode path behind
``ops.multimodal.decode_image_bytes``; plug a real codec there for bulk
throughput.

Closes the reference-parity gap where JPEG payloads previously fell back
to the deterministic sha256 fake (ops/multimodal.py); the reference
delegates decoding to external libs, so everything here derives from the
T.81 marker/huffman/DCT definitions only.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index k of the scan -> (row, col) flattened offset
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _idct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-III basis: pixels = A.T @ coeffs @ A."""
    x = np.arange(8)
    u = x[:, None]
    A = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) * np.sqrt(2 / 8)
    A[0] /= np.sqrt(2)
    return A


_A = _idct_basis()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


class _HuffTable:
    """Canonical JPEG Huffman table from the DHT BITS/HUFFVAL arrays."""

    def __init__(self, bits: bytes, vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    byte-unstuffing; stops at any marker (FFxx, xx != 00)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a marker: no more entropy data here
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError('entropy segment ended at a marker')
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker byte pair; returns the marker code."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the n-bit magnitude to a signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_huff(r: _BitReader, table: _HuffTable) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.lookup.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError('invalid Huffman code')


def decode_jpeg(blob: bytes) -> 'np.ndarray | None':
    """(h, w, ch) uint8 pixels for a baseline JPEG; None if not baseline
    JPEG (wrong magic, progressive, arithmetic, 12-bit, ...)."""
    if not blob.startswith(b'\xff\xd8'):
        return None
    try:
        return _decode(blob)
    except (IndexError, KeyError, ValueError, EOFError, ZeroDivisionError,
            struct.error):
        return None


def _decode(blob: bytes) -> 'np.ndarray | None':
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from('>H', blob, pos + 2)[0]
        seg = blob[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, '>u2', 64, i).astype(np.int32)
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = seg[i + 1:i + 17]
                n = sum(bits)
                vals = seg[i + 17:i + 17 + n]
                huff[(cls, tid)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline-compatible)
            prec = seg[0]
            if prec != 8:
                return None
            H, W = struct.unpack_from('>HH', seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({'id': cid, 'h': hv >> 4, 'v': hv & 0x0F, 'tq': tq})
            frame = {'H': H, 'W': W, 'comps': comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless: not baseline
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from('>H', seg, 0)[0]
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                return None
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(blob, pos + 2 + seg_len, frame, scan, qt,
                                huff, restart_interval)
        pos += 2 + seg_len
    return None


def _decode_scan(blob, pos, frame, scan, qt, huff, restart_interval):
    H, W, comps = frame['H'], frame['W'], frame['comps']
    hmax = max(c['h'] for c in comps)
    vmax = max(c['v'] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    planes = [np.zeros((mcus_y * c['v'] * 8, mcus_x * c['h'] * 8), np.float64)
              for c in comps]
    for c in comps:
        dc_t, ac_t = scan[c['id']]
        c['dc'] = huff[(0, dc_t)]
        c['ac'] = huff[(1, ac_t)]
        c['q'] = qt[c['tq']]

    r = _BitReader(blob, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = r.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError('expected RST marker')
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c['v']):
                    for bx in range(c['h']):
                        coeffs = np.zeros(64, np.float64)
                        t = _decode_huff(r, c['dc'])
                        diff = _extend(r.receive(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci] * c['q'][0]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, c['ac'])
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError('AC run past block end')
                            coeffs[ZIGZAG[k]] = _extend(r.receive(size), size) * c['q'][k]
                            k += 1
                        px = _idct2(coeffs.reshape(8, 8))
                        y0 = (my * c['v'] + by) * 8
                        x0 = (mx * c['h'] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    # upsample to full MCU-padded resolution, crop, level-shift
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, hmax // c['h'], axis=1), vmax // c['v'], axis=0)
        full.append(p[:H, :W] + 128.0)
    if len(full) == 1:
        out = full[0][..., None]
    elif len(full) == 3:
        Y, Cb, Cr = full
        R = Y + 1.402 * (Cr - 128.0)
        G = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
        B = Y + 1.772 * (Cb - 128.0)
        out = np.stack([R, G, B], axis=-1)
    else:
        return None
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# minimal spec-built encoder — fixture / test-vector generator
# ---------------------------------------------------------------------------

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
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1 bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _canonical_table(symbols) -> tuple:
    """Fixed-length canonical Huffman over the distinct symbols: enough
    codes of length L = bit_length(count+1 - 1)... chosen so the all-ones
    code stays unused (T.81 C.2 recommends reserving it)."""
    vals = sorted(set(symbols))
    L = max(2, (len(vals)).bit_length())
    if len(vals) >= (1 << L):
        L += 1
    bits = bytearray(16)
    bits[L - 1] = len(vals)
    codes = {v: (i, L) for i, v in enumerate(vals)}
    return bytes(bits), bytes(vals), codes


def encode_gray_jpeg(pixels: np.ndarray, quant: 'np.ndarray | None' = None) -> bytes:
    """Baseline JPEG bytes for (h, w) grayscale uint8 — a spec-built
    encoder (forward DCT + quantization + canonical Huffman per T.81) used
    to generate deterministic test vectors for the decoder; with the
    default all-ones quantization table, blockwise-constant images
    round-trip EXACTLY (the oracle queries rely on that)."""
    q = quant if quant is not None else np.ones(64, np.int64)
    H, W = pixels.shape
    mcus_y, mcus_x = -(-H // 8), -(-W // 8)
    p = np.zeros((mcus_y * 8, mcus_x * 8))
    p[:H, :W] = pixels.astype(np.float64) - 128.0
    p[H:, :W] = p[H - 1:H, :W]  # edge-extend padding
    p[:, W:] = p[:, W - 1:W]

    blocks = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            blk = _A @ p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] @ _A.T
            blocks.append(np.round(blk.reshape(64)[ZIGZAG] / q).astype(int))

    dc_syms, ac_syms, events = [], [], []
    pred = 0
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
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
        events.append(ev)

    dc_bits, dc_vals, dc_codes = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_table(ac_syms)
    w = _BitWriter()
    for ev in events:
        for kind, sym, val in ev:
            code, ln = (dc_codes if kind == 'dc' else ac_codes)[sym]
            w.write(code, ln)
            size = sym if kind == 'dc' else (sym & 0x0F)
            if size:
                v = val if val >= 0 else val + (1 << size) - 1
                w.write(v, size)
    w.flush()

    out = bytearray(b'\xff\xd8')

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack('>H', len(payload) + 2) + payload)

    seg(0xDB, bytes([0x00]) + bytes(int(x) & 0xFF for x in q))
    seg(0xC0, bytes([8]) + struct.pack('>HH', H, W) + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
    seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out.extend(w.out)
    out.extend(b'\xff\xd9')
    return bytes(out)
