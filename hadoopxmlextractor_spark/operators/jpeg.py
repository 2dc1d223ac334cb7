"""Baseline JPEG codec with ZERO dependencies (numpy only) — the last
image leg PIL's absence from this container blocked, made real for the
shapes that dominate training corpora: baseline DCT (SOF0), 8-bit,
grayscale or YCbCr at 4:4:4 / 4:2:2 / 4:2:0, restart markers.

Decode chain (ITU-T T.81): marker walk (DQT / DHT / SOF0 / DRI / SOS),
canonical Huffman tables from the (bits, values) spec form, entropy
decode of the interleaved MCU stream (DC prediction + AC
run/length/EOB), dequantize, de-zigzag, IDCT-II via the explicit
cosine basis (numpy einsum — the spec's float IDCT), level shift,
chroma upsample by sampling factors, JFIF full-range YCbCr→RGB.
Progressive (SOF2), arithmetic coding, and 12-bit precision return
None — the PIL plug-in point, same auditable-NULL contract as the
other decoders.

Encode (test/synthesis partner): grayscale or 4:4:4 color, Annex-K
quantization and Huffman tables, forward DCT by the transposed basis.
The pair is LOSSY by nature, so correctness is pinned three
independent ways in the tests: (1) flat blocks make the quantized DC
path EXACTLY computable (``v' = round(round((v-128)*8/Q)*Q/8) + 128``)
— a registry query replays that arithmetic as a DuckDB oracle, giving
a lossy codec an exact cross-engine check; (2) coefficient-injection:
entropy-coded streams built directly from chosen quantized
coefficients must decode to an independently computed IDCT; (3)
roundtrip tolerance on smooth images at high quality.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — luminance quantization table (quality 50)
K1_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K.2 — chrominance quantization table
K2_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 — typical Huffman tables: (BITS counts 1..16, HUFFVAL)
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# the 8-point DCT-II basis: B[u, x] = c(u) cos((2x+1)uπ/16) / 2
_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8×8 coefficient block (float)."""
    return _B.T @ coef @ _B


def _fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one 8×8 sample block (float)."""
    return _B @ block @ _B.T


def _build_huffman(bits, values):
    """Canonical Huffman per T.81 Annex C: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_codes(bits, values):
    """Inverse of :func:`_build_huffman`: {value: (length, code)}."""
    return {v: (ln, c) for (ln, c), v in _build_huffman(bits, values).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal and RSTn tolerance."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        while True:
            if self.pos >= len(self.data):
                raise EOFError
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    pass  # stuffed 0xFF: consume normally
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker inside the stream: skip, reset pad
                    self.pos += 2
                    self.bit = 0
                    continue
                else:
                    raise EOFError  # EOI or next segment
            b = (byte >> (7 - self.bit)) & 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
                if byte == 0xFF:  # skip the stuffed 0x00
                    self.pos += 1
            return b

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1
            if self.pos <= len(self.data) and self.data[self.pos - 1] == 0xFF:
                self.pos += 1

    def decode_huff(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid huffman code")

    def receive_extend(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        if v < (1 << (n - 1)):  # negative branch per F.2.2.1
            v -= (1 << n) - 1
        return v


def decode_jpeg(blob: bytes):
    """Baseline JPEG → (H, W, 3) uint8 RGB array, or None for
    non-baseline / malformed input (the PIL plug-in point)."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    try:
        qt = {}
        huff_dc = {}
        huff_ac = {}
        frame = None
        restart_interval = 0
        pos = 2
        while pos + 2 <= len(blob):
            if blob[pos] != 0xFF:
                return None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # the marker byte — skip them instead of misreading the
            # next two bytes as a segment length.
            while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
                pos += 1
            marker = blob[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                # TEM / RSTn: standalone markers with no length field
                pos += 2
                continue
            if pos + 4 > len(blob):
                return None
            (seg_len,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
            seg = blob[pos + 4 : pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    prec, tid = seg[p] >> 4, seg[p] & 0xF
                    if prec != 0:
                        return None  # 16-bit tables: not baseline-8
                    tbl = np.frombuffer(
                        seg[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.int64)
                    dezig = np.zeros(64, dtype=np.int64)
                    dezig[ZIGZAG] = tbl
                    qt[tid] = dezig.reshape(8, 8)
                    p += 65
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    cls, tid = seg[p] >> 4, seg[p] & 0xF
                    bits = list(seg[p + 1 : p + 17])
                    n = sum(bits)
                    values = list(seg[p + 17 : p + 17 + n])
                    (huff_dc if cls == 0 else huff_ac)[tid] = _build_huffman(
                        bits, values
                    )
                    p += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                frame = {"h": h, "w": w, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/progressive/lossless/arithmetic
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                if ns != len(frame["comps"]):
                    # Non-interleaved multi-scan baseline (ns < nc):
                    # decoding only the first scan would silently
                    # return zero-filled remaining planes — keep the
                    # auditable-NULL contract instead.
                    return None
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(
                        x for x in frame["comps"] if x["id"] == cs
                    )
                    scan.append(
                        {"comp": comp, "dc": tt >> 4, "ac": tt & 0xF}
                    )
                data_start = pos + 2 + seg_len
                return _decode_scan(
                    blob[data_start:], frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            pos += 2 + seg_len
        return None
    except (EOFError, ValueError, IndexError, StopIteration, struct.error):
        return None


def _decode_scan(data, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in frame["comps"]:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    reader = _BitReader(data)
    pred = {s["comp"]["id"]: 0 for s in scan}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.align()
                pred = {k: 0 for k in pred}
            for s in scan:
                c = s["comp"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huff(huff_dc[s["dc"]])
                        diff = reader.receive_extend(t)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[s["ac"]])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            coef[k] = reader.receive_extend(sz)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[ZIGZAG] = coef
                        dq = block.reshape(8, 8) * qt[c["tq"]]
                        px = _idct2(dq.astype(np.float64)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1
    # upsample each component to full resolution and crop
    comps = frame["comps"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _magnitude(v: int):
    """(size, appended-bits value) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(wtr, block, q, dc_codes, ac_codes, pred):
    coef = np.round(_fdct2(block.astype(np.float64) - 128.0) / q).astype(
        np.int64
    )
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    ln, code = dc_codes[size]
    wtr.write(code, ln)
    if size:
        wtr.write(bits, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        ln, code = ac_codes[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(bits, size)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]  # EOB
        wtr.write(code, ln)
    return int(zz[0])


def _qt_segment(tid: int, q: np.ndarray) -> bytes:
    zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()


def _dht_segment(cls: int, tid: int, bits, values) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(img, *, quality: int = 90) -> bytes:
    """(H, W) or (H, W, 3) uint8 → baseline JPEG bytes (grayscale or
    4:4:4 YCbCr, Annex-K tables scaled by ``quality``)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scale_qt(K1_LUMA_QT.reshape(8, 8), quality)
    qc = _scale_qt(K2_CHROMA_QT.reshape(8, 8), quality)
    out = bytearray(b"\xff\xd8")
    out += _qt_segment(0, qy)
    if not gray:
        out += _qt_segment(1, qc)
    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        for cid, tq in ((1, 0), (2, 1), (3, 1)):
            sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + sof
    out += _dht_segment(0, 0, *K3_DC_LUMA)
    out += _dht_segment(1, 0, *K3_AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, *K3_DC_CHROMA)
        out += _dht_segment(1, 1, *K3_AC_CHROMA)
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    if gray:
        sos += bytes([1, 0x00])
    else:
        sos += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    if gray:
        planes = [(img.astype(np.float64), qy, _huff_codes(*K3_DC_LUMA),
                   _huff_codes(*K3_AC_LUMA))]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
        dcl, acl = _huff_codes(*K3_DC_LUMA), _huff_codes(*K3_AC_LUMA)
        dcc, acc = _huff_codes(*K3_DC_CHROMA), _huff_codes(*K3_AC_CHROMA)
        planes = [(y, qy, dcl, acl), (cb, qc, dcc, acc), (cr, qc, dcc, acc)]

    # pad each plane to multiples of 8 by edge replication
    padded = []
    for p, q, dc, ac in planes:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        if pw > w:
            pp[:h, w:] = p[:, -1:]
        if ph > h:
            pp[h:, :] = pp[h - 1 : h, :]
        padded.append((pp, q, dc, ac))

    wtr = _BitWriter()
    preds = [0] * len(padded)
    ph, pw = padded[0][0].shape
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci, (pp, q, dc, ac) in enumerate(padded):
                block = pp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _encode_block(wtr, block, q, dc, ac, preds[ci])
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
