"""VP8L — WebP lossless bitstream codec (round 9), zero dependencies.

Decoder implements the WebP lossless spec's pipeline: LSB-first bit
reading, canonical DEFLATE-style prefix codes (simple 1-/2-symbol AND
complex code-length-coded forms with 16/17/18 repeats and the
max_symbol early-out), the 5-code group (green+length+cache, red,
blue, alpha, distance), META PREFIX CODES (spatial entropy
segmentation: an entropy image selects the code group per block —
r10), LZ77 backward references with the prefix-coded length/distance
scheme and the +120 direct-distance mapping, the color cache
(0x1e35a7bd multiplicative hash), and ALL FOUR transforms:
subtract-green, predictor (14 modes), color (cross-color), and
color-indexing (delta-coded palette with pixel bundling). Only the
2D near-pixel distance table (codes 1-120) remains a refusal point —
the documented plug-in contract, same as arithmetic JPEG.

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


def _read_code_group(br: _BitReader, cache_size: int) -> tuple:
    """One 5-code group (green+length+cache, red, blue, alpha,
    distance) — the unit meta prefix codes select between."""
    return (
        _read_prefix_code(br, 256 + 24 + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    )


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, *, top_level: bool = False
) -> list[int]:
    """Packed-ARGB pixel list of one entropy-coded image: optional
    color cache, prefix-code group(s), LZ77 backrefs. The top-level
    ARGB image additionally carries META PREFIX CODES (r10): an
    entropy image whose (red<<8|green) selects, per 2^bits block,
    which of several 5-code groups decodes the pixels there — the
    spec's spatial entropy segmentation. Transform sub-images never
    carry the meta bit, per the image-data layering."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        group_of = [
            (p >> 8) & 0xFFFF for p in _decode_entropy_image(br, mw, mh)
        ]
        meta = (meta_bits, mw, group_of)
        n_groups = max(group_of) + 1
    else:
        n_groups = 1
    groups = [_read_code_group(br, cache_size) for _ in range(n_groups)]

    n_px = w * h
    pixels: list[int] = []  # packed ARGB ints
    cache = [0] * cache_size

    def emit(p: int) -> None:
        pixels.append(p)
        if cache_size:
            cache[_cache_index(p, cache_bits)] = p

    while len(pixels) < n_px:
        if meta is None:
            green_code, red_code, blue_code, alpha_code, dist_code = (
                groups[0]
            )
        else:
            mb, mw, group_of = meta
            i = len(pixels)
            gi = group_of[((i // w) >> mb) * mw + ((i % w) >> mb)]
            green_code, red_code, blue_code, alpha_code, dist_code = (
                groups[gi]
            )
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
    return pixels


def _unpack(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(p: tuple, q: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(p, q))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _tdiv2(v: int) -> int:
    """C-semantics (a)/2 — truncation toward ZERO, the spec
    pseudocode's integer division (Python // floors negatives)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _predict(mode: int, L: tuple, T: tuple, TL: tuple, TR: tuple) -> tuple:
    """One predictor-mode value per the spec's table (modes 0-13) —
    Average2 floors, Select is the Manhattan-distance pick, the
    ClampAddSubtract pair clamps to [0, 255] with C truncation."""
    if mode == 0:
        return (255, 0, 0, 0)  # 0xff000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        est = tuple(lc + tc - tlc for lc, tc, tlc in zip(L, T, TL))
        p_l = sum(abs(e - lc) for e, lc in zip(est, L))
        p_t = sum(abs(e - tc) for e, tc in zip(est, T))
        return L if p_l < p_t else T
    if mode == 12:
        return tuple(
            _clamp(lc + tc - tlc) for lc, tc, tlc in zip(L, T, TL)
        )
    if mode == 13:
        ave = _avg2(L, T)
        return tuple(
            _clamp(ac + _tdiv2(ac - tlc)) for ac, tlc in zip(ave, TL)
        )
    raise ValueError(f"bad predictor mode {mode}")


def _inverse_predictor(
    pixels: list[int], w: int, h: int, modes: list[int],
    tw: int, size_bits: int,
) -> None:
    """In-place inverse predictor transform: residual + predicted
    value mod 256 per channel, predictors computed from the already-
    RECONSTRUCTED neighbors in scan order. Border rules per spec:
    top-left predicts black, top row L, left column T; the TR pixel
    of the rightmost column is the current row's leftmost pixel (the
    spec's linear-memory addressing, index i-w+1 = y*w)."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = _unpack(pixels[i - 1])
            elif x == 0:
                pred = _unpack(pixels[i - w])
            else:
                mode = (
                    modes[(y >> size_bits) * tw + (x >> size_bits)] >> 8
                ) & 0xFF
                pred = _predict(
                    mode,
                    _unpack(pixels[i - 1]),
                    _unpack(pixels[i - w]),
                    _unpack(pixels[i - w - 1]),
                    _unpack(pixels[i - w + 1]),
                )
            res = _unpack(pixels[i])
            pixels[i] = _pack(*((rc + pc) & 255 for rc, pc in
                                zip(res, pred)))


def _s8(v: int) -> int:
    """uint8 bits reinterpreted as signed int8 — the spec's cast for
    every ColorTransformDelta operand."""
    return v - 256 if v >= 128 else v


def _inverse_cross_color(
    pixels: list[int], w: int, h: int, ctes: list[int],
    tw: int, size_bits: int,
) -> None:
    """In-place inverse color (cross-color) transform: per block the
    ColorTransformElement lives in a sub-image pixel (BLUE=green_to_
    red, GREEN=green_to_blue, RED=red_to_blue); deltas are
    (int8*int8)>>5 with the red delta applied to blue using the
    ALREADY-RESTORED red, per the spec's InverseTransform."""
    for y in range(h):
        base = (y >> size_bits) * tw
        for x in range(w):
            c = ctes[base + (x >> size_bits)]
            g2r = _s8(c & 255)
            g2b = _s8((c >> 8) & 255)
            r2b = _s8((c >> 16) & 255)
            a, r, g, b = _unpack(pixels[y * w + x])
            sg = _s8(g)
            tmp_red = r + ((g2r * sg) >> 5)
            tmp_blue = b + ((g2b * sg) >> 5)
            tmp_blue += (r2b * _s8(tmp_red & 255)) >> 5
            pixels[y * w + x] = _pack(a, tmp_red & 255, g, tmp_blue & 255)


def _palette_width_bits(n_colors: int) -> int:
    """Pixel-bundling width_bits for a palette size (spec §4.4.4):
    <=2 colors pack 8 indices per coded pixel, <=4 pack 4, <=16 pack
    2, larger palettes stay unbundled."""
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    pixels: list[int], w: int, h: int, palette: list[int], xbits: int
) -> list[int]:
    """Inverse color-indexing: each coded pixel's GREEN channel holds
    2**xbits palette indices packed LSB-first; output pixel (x, y)
    looks up index (green(coded[x >> xbits]) >> (x % k)*bits) &
    mask. Out-of-range indices refuse (a corrupt stream must not
    alias a wrong color)."""
    bits = 8 >> xbits
    per = 1 << xbits
    mask = (1 << bits) - 1
    cw = (w + per - 1) >> xbits
    out = []
    for y in range(h):
        for x in range(w):
            coded = pixels[y * cw + (x >> xbits)]
            idx = ((coded >> 8) >> ((x % per) * bits)) & mask
            if idx >= len(palette):
                raise ValueError("palette index out of range")
            out.append(palette[idx])
    return out


def decode_vp8l(payload: bytes):
    """(height, width, 4) uint8 RGBA of a VP8L chunk payload
    (starting at the 0x2F signature). Transforms: subtract-green,
    PREDICTOR (all 14 modes, block-level mode sub-image), COLOR
    (cross-color, block-level ColorTransformElement sub-image), and
    COLOR-INDEXING (delta-coded palette sub-image, pixel bundling for
    palettes <=16 — the icon/graphics layout) — inverses applied in
    reverse read order per the spec; meta prefix codes and the 2D
    near-pixel distance table remain documented refusal points.
    Raises ValueError on malformed streams."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list[tuple] = []
    decode_w = w  # color-indexing SHRINKS the coded image width
    while br.read(1):  # transforms, each at most once
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("duplicate VP8L transform")
        if ttype == 2:
            transforms.append((2,))
        elif ttype in (0, 1):
            size_bits = br.read(3) + 2
            tw = (w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, tw, th)
            transforms.append((ttype, size_bits, sub, tw))
        else:  # color-indexing: delta-coded palette row
            n_colors = br.read(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1)
            palette = []
            prev = 0
            for d in deltas:
                pa, pr, pg, pb = _unpack(prev)
                da, dr, dg, db = _unpack(d)
                prev = _pack(
                    (pa + da) & 255, (pr + dr) & 255,
                    (pg + dg) & 255, (pb + db) & 255,
                )
                palette.append(prev)
            xbits = _palette_width_bits(n_colors)
            decode_w = (w + (1 << xbits) - 1) >> xbits
            transforms.append((3, xbits, palette))
    if any(t[0] == 3 for t in transforms) and len(transforms) > 1:
        # bundling changes the coded width the OTHER transforms would
        # see — a combination real palette files don't use; refuse
        # rather than reconstruct at the wrong dimensions
        raise ValueError("color-indexing combined with other transforms")
    pixels = _decode_entropy_image(br, decode_w, h, top_level=True)
    for t in reversed(transforms):
        if t[0] == 0:
            _inverse_predictor(pixels, w, h, t[2], t[3], t[1])
        elif t[0] == 1:
            _inverse_cross_color(pixels, w, h, t[2], t[3], t[1])
        elif t[0] == 3:
            pixels = _inverse_color_indexing(pixels, w, h, t[2], t[1])
        else:  # subtract-green: add green back to red/blue
            for i, p in enumerate(pixels):
                a, r, g, b = _unpack(p)
                pixels[i] = _pack(a, (r + g) & 255, g, (b + g) & 255)
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
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


def _write_entropy_image(
    bw: _BitWriter,
    argb,
    *,
    cache_bits: int = 0,
    run_backrefs: bool = False,
    top_level: bool = False,
    meta_bits: int | None = None,
    w: int | None = None,
    h: int | None = None,
) -> None:
    """Serialize one entropy-coded image (cache header, prefix-code
    group(s), LZ77-coded pixels) — shared by the main ARGB image and
    the transform sub-images; only the top level writes the
    meta-prefix section. With ``meta_bits`` (r10), blocks alternate
    between TWO code groups whose canonical length assignments differ
    (8-bit-first vs 9-bit-first flat codes), so decoding with the
    wrong group misparses — the round-trip proves group selection."""
    argb = [int(v) for v in argb]
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    meta = None
    if top_level:
        if meta_bits is None:
            bw.write(0, 1)  # no meta prefix codes
        else:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            group_of = [
                (bx + by) % 2 for by in range(mh) for bx in range(mw)
            ]
            _write_entropy_image(
                bw, [(255 << 24) | (gi << 8) for gi in group_of]
            )
            meta = (meta_bits, mw, group_of)
    # the decoder sizes the group list from the meta image's max
    # index, so write exactly that many groups (a one-block image
    # uses only group 0)
    n_groups = 1 if meta is None else max(meta[2]) + 1

    # distance code: single-symbol simple form (0-bit code). Runs use
    # distance 1, whose transformed value 121 prefix-encodes to
    # symbol 13 with 5 extra bits; literal-only streams never read
    # the distance code at all, so symbol 0 suffices.
    dist_symbol = _prefix_encode(121)[0] if run_backrefs else 0
    alphas = sorted({(v >> 24) & 0xFF for v in argb})
    groups = []
    for v in range(n_groups):
        glen = _flat_lengths(256 + 24 + cache_size)
        clen = _flat_lengths(256)
        if v % 2 == 1:  # distinct canonical assignment per group
            glen = list(reversed(glen))
            clen = list(reversed(clen))
        green = _PrefixCode(glen)
        chan = _PrefixCode(clen)
        # codes are written green, red, blue, alpha, distance
        _write_complex_code(bw, glen)
        _write_complex_code(bw, clen)
        _write_complex_code(bw, clen)
        if n_groups == 1 and len(alphas) <= 2:
            _write_simple_code(bw, alphas)
            alpha_enc = _PrefixCode(
                [1 if s in alphas else 0 for s in range(256)]
            )
        else:
            _write_complex_code(bw, clen)
            alpha_enc = chan
        _write_simple_code(bw, [dist_symbol])
        dist_enc = _PrefixCode(
            [1 if s == dist_symbol else 0 for s in range(40)]
        )
        groups.append((green, chan, alpha_enc, dist_enc))

    cache = [0] * cache_size
    i = 0
    n = len(argb)
    while i < n:
        if meta is None:
            green, chan, alpha_enc, dist_enc = groups[0]
        else:
            mb, mw, group_of = meta
            gi = group_of[((i // w) >> mb) * mw + ((i % w) >> mb)]
            green, chan, alpha_enc, dist_enc = groups[gi]
        p = argb[i]
        if run_backrefs and i > 0 and p == argb[i - 1]:
            run = 1
            while (
                i + run < n
                and run < 4096  # length codes top out at 4096
                and argb[i + run] == argb[i - 1]
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
                    q = argb[i + k]
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


def _cte_for_block(bx: int, by: int, salt: int) -> tuple[int, int, int]:
    """Deterministic nonzero (green_to_red, green_to_blue, red_to_blue)
    per block — signed int8 bit patterns covering both signs."""
    return (
        (17 + 37 * bx + 11 * by + salt) % 256,
        (101 + 23 * bx + 41 * by + 3 * salt) % 256,
        (203 + 13 * bx + 7 * by + 5 * salt) % 256,
    )


def encode_vp8l(
    img,
    *,
    subtract_green: bool = False,
    cache_bits: int = 0,
    run_backrefs: bool = False,
    predictor_bits: int | None = None,
    cross_color_bits: int | None = None,
    palette: bool = False,
    meta_bits: int | None = None,
    mode_salt: int = 0,
) -> bytes:
    """VP8L chunk payload of an (h, w, 3|4) uint8 array — lossless by
    construction (round-trip asserted in tests). Options exercise the
    decoder paths: subtract-green, the COLOR (cross-color) transform
    with per-block ColorTransformElements (``cross_color_bits`` =
    size_bits), the PREDICTOR transform with per-block modes cycling
    (bx + by + mode_salt) % 14 (``predictor_bits``), color cache, and
    distance-1 run backreferences. Forward transforms apply in stream
    order (subtract-green, cross-color, predictor) so the decoder's
    reverse-read inverse order restores exactly."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        alpha_plane = np.full((h, w), 255, np.uint8)
    else:
        alpha_plane = img[:, :, 3]
    a = alpha_plane.astype(np.int32)
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if palette:
        if subtract_green or predictor_bits or cross_color_bits:
            raise ValueError("palette combines with no other transform")
        argb_full = [
            _pack(int(a[y, x]), int(r[y, x]), int(g[y, x]), int(b[y, x]))
            for y in range(h) for x in range(w)
        ]
        colors = sorted(set(argb_full))
        if len(colors) > 256:
            raise ValueError("palette needs <= 256 distinct colors")
        index_of = {c: k for k, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:  # delta-coded per channel, mod 256
            pa, pr, pg, pb = _unpack(prev)
            ca, cr, cg, cb = _unpack(c)
            deltas.append(_pack(
                (ca - pa) % 256, (cr - pr) % 256,
                (cg - pg) % 256, (cb - pb) % 256,
            ))
            prev = c
        _write_entropy_image(bw, deltas)
        xbits = _palette_width_bits(len(colors))
        bits = 8 >> xbits
        per = 1 << xbits
        cw = (w + per - 1) >> xbits
        coded = []
        for y in range(h):
            for cx in range(cw):
                green = 0
                for j in range(per):
                    x = (cx << xbits) + j
                    if x < w:
                        green |= index_of[argb_full[y * w + x]] << (
                            j * bits
                        )
                coded.append((255 << 24) | (green << 8))
        bw.write(0, 1)  # no more transforms
        _write_entropy_image(
            bw, coded, cache_bits=cache_bits, run_backrefs=run_backrefs,
            top_level=True,
        )
        return b"\x2f" + bw.tobytes()
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        r = (r - g) % 256
        b = (b - g) % 256
    if cross_color_bits is not None:
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(cross_color_bits - 2, 3)
        bs = 1 << cross_color_bits
        tw, th = (w + bs - 1) // bs, (h + bs - 1) // bs
        ctes = [
            _cte_for_block(bx, by, mode_salt)
            for by in range(th) for bx in range(tw)
        ]
        _write_entropy_image(
            bw,
            [(255 << 24) | (r2b << 16) | (g2b << 8) | g2r
             for g2r, g2b, r2b in ctes],
        )
        for y in range(h):
            for x in range(w):
                g2r, g2b, r2b = ctes[
                    (y >> cross_color_bits) * tw + (x >> cross_color_bits)
                ]
                sg = _s8(int(g[y, x]))
                rr = int(r[y, x])
                r[y, x] = (rr - ((_s8(g2r) * sg) >> 5)) % 256
                b[y, x] = (
                    int(b[y, x]) - ((_s8(g2b) * sg) >> 5)
                    - ((_s8(r2b) * _s8(rr)) >> 5)
                ) % 256
    if predictor_bits is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_bits - 2, 3)
        bs = 1 << predictor_bits
        tw, th = (w + bs - 1) // bs, (h + bs - 1) // bs
        modes = [
            (bx + by + mode_salt) % 14
            for by in range(th) for bx in range(tw)
        ]
        _write_entropy_image(
            bw, [(255 << 24) | (m << 8) for m in modes]
        )
        # residuals from the CURRENT (post-previous-transforms) plane;
        # predictors see exactly what the decoder will reconstruct
        orig = [
            _pack(int(a[y, x]), int(r[y, x]), int(g[y, x]), int(b[y, x]))
            for y in range(h) for x in range(w)
        ]
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = _unpack(orig[i - 1])
                elif x == 0:
                    pred = _unpack(orig[i - w])
                else:
                    mode = modes[
                        (y >> predictor_bits) * tw + (x >> predictor_bits)
                    ]
                    pred = _predict(
                        mode,
                        _unpack(orig[i - 1]),
                        _unpack(orig[i - w]),
                        _unpack(orig[i - w - 1]),
                        _unpack(orig[i - w + 1]),
                    )
                oa, orr, og, ob = _unpack(orig[i])
                a[y, x] = (oa - pred[0]) % 256
                r[y, x] = (orr - pred[1]) % 256
                g[y, x] = (og - pred[2]) % 256
                b[y, x] = (ob - pred[3]) % 256
    bw.write(0, 1)  # no more transforms
    argb = (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    ).reshape(-1)
    _write_entropy_image(
        bw, argb, cache_bits=cache_bits, run_backrefs=run_backrefs,
        top_level=True, meta_bits=meta_bits, w=w, h=h,
    )
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
    chain. The TRANSFORM STACK rotates by doc_id%6 (r10): plain /
    subtract-green / PREDICTOR (4-px blocks, modes cycling by doc so
    all 14 occur across the corpus) / COLOR + subtract-green /
    COLOR-INDEXING (the 8x8 plane's <=64 distinct colors as a
    delta-coded palette; bundling tiers live in the unit matrix) /
    META PREFIX CODES (two block-alternating code groups with
    distinct canonical assignments) — one wrong bit in either codec
    half, any predictor mode, any ColorTransformElement delta, any
    palette delta, or a wrong group selection flips the 64-bit
    hash."""
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
                arm = int(i) % 6
                opts = {}
                if arm == 1:
                    opts = {"subtract_green": True}
                elif arm == 2:
                    opts = {"predictor_bits": 2, "mode_salt": int(i) // 6}
                elif arm == 3:
                    opts = {
                        "cross_color_bits": 2,
                        "subtract_green": True,
                        "mode_salt": int(i) // 6,
                    }
                elif arm == 4:
                    opts = {"palette": True}
                elif arm == 5:
                    opts = {"meta_bits": 2, "cache_bits": 3}
                out.append(encode_webp_lossless(img, **opts))
            yield pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        _webp("doc_id").alias("content"),
    )
