"""VP8L — WebP lossless bitstream codec (round 9), zero dependencies.

Decoder implements the WebP lossless spec's core pipeline: LSB-first
bit reading, canonical DEFLATE-style prefix codes (simple 1-/2-symbol
AND complex code-length-coded forms with 16/17/18 repeats and the
max_symbol early-out), the 5-code group (green+length+cache, red,
blue, alpha, distance), LZ77 backward references with the prefix-
coded length/distance scheme and the +120 direct-distance mapping,
the color cache (0x1e35a7bd multiplicative hash), and the
subtract-green transform. Predictor / color / color-indexing
transforms and meta prefix codes (entropy images) refuse with
ValueError — the documented plug-in point, same contract as
arithmetic JPEG.

Encoder is the bit-exact write partner over the same subset: complete
canonical codes built from explicit length assignments (n8 = 512 - A
symbols at 8 bits + the rest at 9 bits satisfies Kraft exactly for
any alphabet A <= 512), optional subtract-green, optional color
cache, and optional distance-1 run backreferences — enough to
exercise every decoder path deterministically.

The certified query (`multimodal_webp_lossless_ahash`) re-uses the
PPM aHash oracle verbatim: the synth pixel plane is the SAME md5
chain as synth_ppm_media, so one wrong bit anywhere in either codec
half flips the 64-bit hash.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
_HASH_MUL = 0x1E35A7BD


class _BitReader:
    """LSB-first bit reader (DEFLATE convention, per the spec)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            byte_idx = self.pos >> 3
            if byte_idx >= len(self.d):
                raise ValueError("VP8L bitstream overrun")
            v |= ((self.d[byte_idx] >> (self.pos & 7)) & 1) << k
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for k in range(n):
            self.bits.append((v >> k) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-of-code first (DEFLATE)."""
        for k in range(length - 1, -1, -1):
            self.bits.append((code >> k) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


class _PrefixCode:
    """Canonical prefix code: decode table (length, code)->symbol and
    encode table symbol->(code, length). A single-symbol code is the
    spec's 0-bit code."""

    def __init__(self, lengths: list[int]):
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty prefix code")
        self.single = used[0][1] if len(used) == 1 else None
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}
        self.max_len = max(ln for ln, _ in used)
        if self.single is not None:
            self.encode_map[self.single] = (0, 0)
            return
        count: dict[int, int] = {}
        for ln, _ in used:
            count[ln] = count.get(ln, 0) + 1
        if sum(c * 2 ** (self.max_len - ln) for ln, c in count.items()) > (
            1 << self.max_len
        ):
            raise ValueError("over-subscribed prefix code")
        code = 0
        next_code = {}
        for ln in range(1, self.max_len + 1):
            code = (code + count.get(ln - 1, 0)) << 1
            next_code[ln] = code
        for s, ln in enumerate(lengths):
            if ln > 0:
                c = next_code[ln]
                next_code[ln] += 1
                self.decode_map[(ln, c)] = s
                self.encode_map[s] = (c, ln)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            s = self.decode_map.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid prefix code in stream")

    def write(self, bw: _BitWriter, symbol: int) -> None:
        code, ln = self.encode_map[symbol]
        if ln:
            bw.write_code(code, ln)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """One prefix code: the simple (1-2 explicit symbols) or complex
    (code-length-coded) form per the spec."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[first] = 1  # becomes the 0-bit single code
        else:
            second = br.read(8)
            lengths[first] = 1
            lengths[second] = 1
        return _PrefixCode(lengths)
    # complex: code-length code first
    n = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # max_symbol early-out present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(min(rep, alphabet_size - i)):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """(code, extra bit count, extra bits) of a length/distance value
    ≥ 1 — the spec's PrefixEncode."""
    if v <= 4:
        return v - 1, 0, 0
    highest = (v - 1).bit_length() - 1
    second = ((v - 1) >> (highest - 1)) & 1
    extra = highest - 1
    return 2 * highest + second, extra, (v - 1) & ((1 << extra) - 1)


def _prefix_decode(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def decode_vp8l(payload: bytes):
    """(height, width, 4) uint8 RGBA of a VP8L chunk payload
    (starting at the 0x2F signature). Raises ValueError on malformed
    streams and on the unsupported-transform plug-in points."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.read(1):  # transforms
        ttype = br.read(2)
        if ttype == 2:
            subtract_green = True
        else:
            raise ValueError(f"unsupported VP8L transform {ttype}")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    if br.read(1):
        raise ValueError("meta prefix codes unsupported")
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_code = _read_prefix_code(br, 256 + 24 + cache_size)
    red_code = _read_prefix_code(br, 256)
    blue_code = _read_prefix_code(br, 256)
    alpha_code = _read_prefix_code(br, 256)
    dist_code = _read_prefix_code(br, 40)

    n_px = w * h
    pixels: list[int] = []  # packed ARGB ints
    cache = [0] * cache_size

    def emit(p: int) -> None:
        pixels.append(p)
        if cache_size:
            cache[_cache_index(p, cache_bits)] = p

    while len(pixels) < n_px:
        s = green_code.read(br)
        if s < 256:
            g = s
            r = red_code.read(br)
            b = blue_code.read(br)
            a = alpha_code.read(br)
            emit((a << 24) | (r << 16) | (g << 8) | b)
        elif s < 280:
            length = _prefix_decode(s - 256, br)
            dcode = _prefix_decode(dist_code.read(br), br)
            if dcode > 120:
                distance = dcode - 120
            else:
                # codes 1-120 are the spec's 2D near-pixel table; a
                # documented refusal point (same plug-in contract as
                # the unsupported transforms) — direct distances
                # (+120) cover every backref our encoder emits
                raise ValueError("near-pixel distance codes unsupported")
            if distance > len(pixels):
                raise ValueError("backref before start of image")
            for _ in range(length):
                if len(pixels) >= n_px:
                    raise ValueError("backref past end of image")
                emit(pixels[-distance])
        else:
            if s - 280 >= cache_size:
                raise ValueError("color cache index out of range")
            emit(cache[s - 280])

    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if subtract_green:
        r = (r.astype(np.uint16) + g).astype(np.uint8)
        b = (b.astype(np.uint16) + g).astype(np.uint8)
    return np.stack([r, g, b, a], axis=-1)


def decode_webp(blob: bytes):
    """(h, w, 3) uint8 RGB of a lossless WebP file (RIFF walk to the
    VP8L chunk), or None for non-WebP/lossy blobs; unsupported VP8L
    features raise ValueError (plug-in contract)."""
    if len(blob) < 20 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if cid == b"VP8L":
            rgba = decode_vp8l(blob[pos + 8 : pos + 8 + ln])
            return rgba[:, :, :3]
        pos += 8 + ln + (ln & 1)
    return None


def _flat_lengths(alphabet: int) -> list[int]:
    """A COMPLETE canonical length assignment over ``alphabet`` ≤ 512
    symbols: 512 - alphabet symbols at 8 bits, the rest at 9 (Kraft
    sums to exactly 1). Every symbol gets a code, so any literal is
    encodable regardless of its frequency."""
    if alphabet > 512:
        raise ValueError("flat code only defined for alphabet <= 512")
    n8 = 512 - alphabet
    return [8 if s < n8 else 9 for s in range(alphabet)]


def _write_complex_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Serialize a length assignment as the complex form: a tiny
    code-length code over the distinct lengths, then one CL symbol
    per entry (no repeats — simple and always valid)."""
    distinct = sorted({ln for ln in lengths})
    # CL code: complete by construction over the distinct values
    # (pad with an unused value if a single distinct length).
    if len(distinct) == 1:
        distinct = sorted(set(distinct) | {0 if distinct[0] != 0 else 1})
    cl_lengths = [0] * 19
    # assign 1 bit to the first, 2 bits to the next two, etc. —
    # only 2 or 3 distinct values occur with _flat_lengths
    if len(distinct) == 2:
        cl_lengths[distinct[0]] = 1
        cl_lengths[distinct[1]] = 1
    elif len(distinct) == 3:
        cl_lengths[distinct[0]] = 1
        cl_lengths[distinct[1]] = 2
        cl_lengths[distinct[2]] = 2
    else:
        raise ValueError("flat writer handles <= 3 distinct lengths")
    n = max(_CL_ORDER.index(s) for s in distinct if cl_lengths[s]) + 1
    n = max(n, 4)
    bw.write(0, 1)  # complex form
    bw.write(n - 4, 4)
    for i in range(n):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_code = _PrefixCode(cl_lengths)
    bw.write(0, 1)  # no max_symbol early-out
    for ln in lengths:
        cl_code.write(bw, ln)


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> None:
    bw.write(1, 1)  # simple form
    bw.write(len(symbols) - 1, 1)
    first = symbols[0]
    if first > 1:
        bw.write(1, 1)
        bw.write(first, 8)
    else:
        bw.write(0, 1)
        bw.write(first, 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def encode_vp8l(
    img,
    *,
    subtract_green: bool = False,
    cache_bits: int = 0,
    run_backrefs: bool = False,
) -> bytes:
    """VP8L chunk payload of an (h, w, 3|4) uint8 array — lossless by
    construction (round-trip asserted in tests). Options exercise the
    decoder paths: subtract-green transform, color cache, and
    distance-1 run backreferences for repeated pixels."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        alpha_plane = np.full((h, w), 255, np.uint8)
    else:
        alpha_plane = img[:, :, 3]
    r = img[:, :, 0].astype(np.int16)
    g = img[:, :, 1].astype(np.int16)
    b = img[:, :, 2].astype(np.int16)
    if subtract_green:
        r = (r - g) % 256
        b = (b - g) % 256
    argb = (
        (alpha_plane.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
    bw.write(0, 1)  # no more transforms
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes

    green = _PrefixCode(_flat_lengths(256 + 24 + cache_size))
    chan = _PrefixCode(_flat_lengths(256))
    alphas = sorted({int(v) for v in alpha_plane.reshape(-1)})
    if len(alphas) <= 2:
        alpha_simple = alphas
        alpha_code = None
    else:
        alpha_simple = None
        alpha_code = chan
    # codes are written green, red, blue, alpha, distance
    _write_complex_code(bw, _flat_lengths(256 + 24 + cache_size))
    _write_complex_code(bw, _flat_lengths(256))
    _write_complex_code(bw, _flat_lengths(256))
    if alpha_simple is not None:
        _write_simple_code(bw, alpha_simple)
        alpha_enc = _PrefixCode(
            [1 if s in alpha_simple else 0 for s in range(256)]
        )
    else:
        _write_complex_code(bw, _flat_lengths(256))
        alpha_enc = alpha_code
    # distance code: single-symbol simple form (0-bit code). Runs use
    # distance 1, whose transformed value 121 prefix-encodes to
    # symbol 13 with 5 extra bits; literal-only streams never read
    # the distance code at all, so symbol 0 suffices.
    dist_symbol = _prefix_encode(121)[0] if run_backrefs else 0
    _write_simple_code(bw, [dist_symbol])
    dist_enc = _PrefixCode(
        [1 if s == dist_symbol else 0 for s in range(40)]
    )

    cache = [0] * cache_size
    i = 0
    n = len(argb)
    while i < n:
        p = int(argb[i])
        if run_backrefs and i > 0 and p == int(argb[i - 1]):
            run = 1
            while (
                i + run < n
                and run < 4096  # length codes top out at 4096
                and int(argb[i + run]) == int(argb[i - 1])
            ):
                run += 1
            lcode, lextra, lbits = _prefix_encode(run)
            green.write(bw, 256 + lcode)
            bw.write(lbits, lextra)
            _dsym, dextra, dbits = _prefix_encode(121)  # distance 1
            dist_enc.write(bw, _dsym)
            bw.write(dbits, dextra)
            if cache_size:
                for k in range(run):
                    q = int(argb[i + k])
                    cache[_cache_index(q, cache_bits)] = q
            i += run
            continue
        if cache_size:
            idx = _cache_index(p, cache_bits)
            if cache[idx] == p:
                green.write(bw, 280 + idx)
                i += 1
                continue
            cache[idx] = p
        green.write(bw, (p >> 8) & 0xFF)
        chan.write(bw, (p >> 16) & 0xFF)
        chan.write(bw, p & 0xFF)
        alpha_enc.write(bw, (p >> 24) & 0xFF)
        i += 1
    return b"\x2f" + bw.tobytes()


def encode_webp_lossless(img, **opts) -> bytes:
    """Full lossless WebP file bytes (RIFF + VP8L) of an (h, w, 3|4)
    uint8 array."""
    payload = encode_vp8l(img, **opts)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def synth_webp_lossless_media(docs: DataFrame, *, side: int = 8) -> DataFrame:
    """Deterministic lossless WebP per document over the SAME md5
    pixel plane as multimodal.synth_ppm_media (byte j of chunk k =
    hex pair j of md5('{doc_id}:{k}')) — so the shared PPM aHash
    oracle applies verbatim to the full VP8L encode→decode→hash
    chain. Subtract-green rotates by doc parity; one wrong bit in
    either codec half flips the 64-bit hash."""
    import hashlib

    n_bytes = side * side * 3
    n_chunks = (n_bytes + 15) // 16

    @F.pandas_udf("binary")
    def _webp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                plane = b"".join(
                    hashlib.md5(f"{i}:{k}".encode()).digest()
                    for k in range(n_chunks)
                )[:n_bytes]
                img = np.frombuffer(plane, np.uint8).reshape(side, side, 3)
                out.append(
                    encode_webp_lossless(
                        img, subtract_green=bool(int(i) % 2)
                    )
                )
            yield pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        _webp("doc_id").alias("content"),
    )
