"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec — stdlib +
numpy only, no codec libraries.

Closes the last image-format stub in datapipe/multimodal.py the same
way PNG did in round 4: the container has no media libs, but baseline
JPEG needs none — the entropy coding is canonical Huffman over
run-length-coded zigzag coefficients, and the transform is an 8x8
DCT-II, both implementable directly from the public spec. All constant
tables below are the example tables of ITU-T T.81 Annex K (the ones
virtually every encoder ships).

Supported: baseline sequential SOF0, 8-bit, 1 or 3 components, 4:4:4
and 4:2:0 sampling, restart-interval-free streams (DRI with a nonzero
interval raises — the bundled encoder never emits one). Progressive
(SOF2), arithmetic coding and 12-bit precision raise NotImplementedError
with a precise message.

Determinism: encode and decode are pure numpy float64 + integer ops —
bit-identical across runs on a platform. JPEG is lossy, so tests pin
(a) exact round-trips on DC-only inputs (solid blocks survive
quantization exactly), (b) bounded max-abs error on gradients, and
(c) decode(encode(x)) self-equality.

Scale shape: this is a per-payload kernel invoked from the Arrow
mapInPandas decode stage (multimodal.decode_media) — pure Python
entropy decoding is the documented cost of codec-lib-free decode and
is CPU-bound per payload with no shuffle implications; swap in a
native decoder behind the same (w, h, array) contract when the
cluster image allows one.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ---------------------------------------------------------

# zigzag scan order: position i of the scan reads natural index ZIGZAG[i]
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: forward F = M @ B @ M.T
_K = np.arange(8)
_DCT_M = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.where(
    _K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def is_jpeg(payload) -> bool:
    return payload is not None and bytes(payload[:2]) == b"\xff\xd8"


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled table clipped to
    [1, 255] (8-bit baseline tables)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits, vals):
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_decoder(bits, vals):
    """(code, length) -> symbol for the bit-serial decoder."""
    return {cl: sym for sym, cl in _build_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    """appended bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


# --- encoder ----------------------------------------------------------------


def _block_dct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """plane (H, W multiple of 8) -> (n_blocks, 64) quantized zigzag
    coefficients, blocks in raster order. Vectorized over blocks."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,bjk,lk->bil", _DCT_M, blocks, _DCT_M)
    qz = qt[ZIGZAG].reshape(1, 64)
    flat = coef.reshape(-1, 64)[:, ZIGZAG]
    # round-half-away like libjpeg's integer DCT descale
    return np.sign(flat) * np.floor(np.abs(flat) / qz + 0.5)


def _encode_block(w: _BitWriter, zz: np.ndarray, dc_prev: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - dc_prev)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac_codes[0xF0]
            w.write(zrl, zl)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        eob, el = ac_codes[0x00]
        w.write(eob, el)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mult, (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(arr, quality: int = 75, subsample: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (SOF0, Annex K
    Huffman tables, libjpeg-scaled Annex K quant tables; 4:2:0 when
    `subsample` else 4:4:4)."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape[:2]
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qt_l, qt_c = _scaled_qt(QT_LUM, quality), _scaled_qt(QT_CHR, quality)
    if subsample:
        y_p = _pad_edge(y, 16)
        cb_p = _pad_edge(cb, 16).reshape(-1, 2, y_p.shape[1] // 2, 2).mean((1, 3))
        cr_p = _pad_edge(cr, 16).reshape(-1, 2, y_p.shape[1] // 2, 2).mean((1, 3))
        hv = (2, 2)
    else:
        y_p, cb_p, cr_p = (_pad_edge(p, 8) for p in (y, cb, cr))
        hv = (1, 1)

    zz_y = _block_dct_quant(y_p, qt_l)
    zz_cb = _block_dct_quant(cb_p, qt_c)
    zz_cr = _block_dct_quant(cr_p, qt_c)

    dc_l, ac_l = _build_codes(DC_LUM_BITS, DC_LUM_VALS), _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c, ac_c = _build_codes(DC_CHR_BITS, DC_CHR_VALS), _build_codes(AC_CHR_BITS, AC_CHR_VALS)

    bw = _BitWriter()
    yw = y_p.shape[1] // 8  # Y blocks per row
    mcu_cols = y_p.shape[1] // (8 * hv[0])
    mcu_rows = y_p.shape[0] // (8 * hv[1])
    cw = cb_p.shape[1] // 8
    prev = [0, 0, 0]
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            for vy in range(hv[1]):
                for hx in range(hv[0]):
                    bi = (mr * hv[1] + vy) * yw + (mc * hv[0] + hx)
                    prev[0] = _encode_block(bw, zz_y[bi], prev[0], dc_l, ac_l)
            ci = mr * cw + mc
            prev[1] = _encode_block(bw, zz_cb[ci], prev[1], dc_c, ac_c)
            prev[2] = _encode_block(bw, zz_cr[ci], prev[2], dc_c, ac_c)
    bw.flush()

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(b"\xff\xe0", b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT bodies are zigzag-ordered in the file (T.81 B.2.4.1)
    out += seg(b"\xff\xdb", b"\x00" + bytes(int(x) for x in qt_l[ZIGZAG]))
    out += seg(b"\xff\xdb", b"\x01" + bytes(int(x) for x in qt_c[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, (hv[0] << 4) | hv[1], 0])
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(b"\xff\xc0", sof)
    for cls_id, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS),
        (0x01, DC_CHR_BITS, DC_CHR_VALS), (0x11, AC_CHR_BITS, AC_CHR_VALS),
    ):
        out += seg(b"\xff\xc4", bytes([cls_id]) + bytes(bits) + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(b"\xff\xda", sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def _parse_jpeg(payload: bytes):
    """baseline JPEG bytes -> (width, height, (H, W, 3) uint8 RGB)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0) "
                "is supported without codec libs"
            )
        length = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qts[tq] = np.frombuffer(
                    body[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            fh, fw = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", body[:2])[0] != 0:
                raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — scan follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            return _decode_scan(data, pos + length, frame, scan, qts,
                                dc_tabs, ac_tabs)
        pos += length
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qts, dc_tabs, ac_tabs):
    if frame is None:
        raise ValueError("SOS before SOF0")
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["dc"] = dc_tabs[s["td"]]
        c["ac"] = ac_tabs[s["ta"]]
        c["bw"] = mcu_cols * c["h"] * 8
        c["bh"] = mcu_rows * c["v"] * 8
        c["plane"] = np.zeros((c["bh"], c["bw"]), dtype=np.float64)
        c["prev"] = 0

    br = _BitReader(data, pos)
    idx = np.empty(64, dtype=np.int64)
    idx[ZIGZAG] = np.arange(64)  # natural index -> zigzag position
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            for c in order:
                for vy in range(c["v"]):
                    for hx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.read_symbol(c["dc"])
                        diff = _extend(br.read_bits(size), size)
                        c["prev"] += diff
                        zz[0] = c["prev"]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(c["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qts[c["tq"]][np.arange(64)]
                        block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M
                        y0 = (mr * c["v"] + vy) * 8
                        x0 = (mc * c["h"] + hx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = block + 128.0
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        yp = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, np.stack([yp, yp, yp], axis=-1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return w, h, rgb.astype(np.uint8)
