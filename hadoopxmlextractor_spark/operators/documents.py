"""Crawled DOCUMENT formats — ZIP archives, DOCX/PPTX/EPUB/PDF text
extraction, XLSX cell tables, SRT/WebVTT subtitles, RSS/Atom feeds
(round 9).

After HTML, the bulk of text in a real crawl arrives inside document
containers: PDF is the single largest non-HTML text source on the web,
DOCX and EPUB are ZIP-of-XML containers (the reference repo's XML
heritage applied to office/ebook payloads), subtitles carry the
transcript side of crawled video, and RSS/Atom feeds are the crawl
frontier's change-discovery source. Everything here parses NATIVELY on
the stdlib (zlib inflate, ElementTree over well-formed member XML,
html-free regex tokenizers for the PDF content-stream subset) — no
Pillow/ffmpeg-class dependency, same zero-dependency contract as the
media codec tier in :mod:`operators.multimodal`.

Spark shape: every operator is ONE Arrow ``mapInPandas`` pass over an
opaque binary column — zero shuffle, scan-bandwidth, embarrassingly
parallel per blob at 100 TB (SCALE.md: the per-blob kernels are
CPU-bound and independent, so throughput scales with executor cores
and the only data movement is the parquet scan itself). Malformed or
unrecognized blobs degrade to a NULL-marker row, never an error, so
auditing stays total (the same contract as ``audio_container_meta``).

Synthesizers are md5-parameterized per document (the established
``md5(doc_id:salt)`` byte chain) so a DuckDB oracle replays every
extracted field — member names, decompressed sizes, cue timestamps,
entry epochs, and the PLANTED text itself — with pure integer/string
arithmetic; no float ever crosses the engine boundary.

Reference parity note: the reference extracts fields from XML records
inside Hadoop containers (XmlExtractor.java:150-175 walks fragments
inside SequenceFiles); this module is the same decomposition —
container walk, then member-XML field extraction — applied to the
document containers a 2020s crawl actually carries.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib
from bisect import bisect_left
from typing import Iterator
from xml.etree import ElementTree

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ZIP container — EOCD scan-back + central-directory walk + inflate
# ---------------------------------------------------------------------------

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"

# Hard ceiling on any single inflate whose container declares no
# uncompressed size (gzip'd tar, PDF FlateDecode). DEFLATE's intrinsic
# max ratio is ~1032:1, so a crafted small blob bombs by depth/size,
# not ratio — a per-stream absolute cap keeps one hostile member from
# OOMing an executor; legitimate members beyond it refuse to the
# NULL-marker row like any other malformed blob.
_MAX_INFLATE = 256 * 1024 * 1024


def _bounded_inflate(raw: bytes, wbits: int, cap: int = _MAX_INFLATE) -> bytes:
    """zlib inflate in 1 MiB steps with a hard output bound — refuses
    (ValueError) instead of materializing a decompression bomb."""
    d = zlib.decompressobj(wbits)
    chunks: list[bytes] = []
    total = 0
    buf = raw
    while True:
        out = d.decompress(buf, 1 << 20)
        if out:
            chunks.append(out)
            total += len(out)
            if total > cap:
                raise ValueError("inflated output exceeds bound")
        buf = d.unconsumed_tail
        if not buf:
            break
    chunks.append(d.flush())
    if not d.eof:
        # flush() never raises on a cut-off stream; a capture truncated
        # mid-stream (or mid-trailer) must refuse, not emit a prefix
        raise ValueError("truncated compressed stream")
    return b"".join(chunks)


def _zip_eocd_pos(blob: bytes) -> int:
    """Offset of the VALIDATED end-of-central-directory record.
    APPNOTE's contract: the EOCD is found by scanning BACKWARD from
    EOF (a trailing archive comment of up to 64 KiB may follow it),
    and a candidate is real only if its comment-length field reaches
    exactly to EOF — a comment that happens to contain the 4-byte
    signature must not shadow the real record. Shared by _zip_eocd
    and zip_has_eocd64 so the attribution bit and the parser always
    agree on WHICH record is the EOCD (r12 advice fix)."""
    lo = max(0, len(blob) - 65536 - 22)
    pos = blob.rfind(_EOCD_SIG, lo)
    while pos != -1:
        if pos + 22 <= len(blob):
            (clen,) = struct.unpack("<H", blob[pos + 20 : pos + 22])
            if pos + 22 + clen == len(blob):
                return pos
        pos = blob.rfind(_EOCD_SIG, lo, pos)
    raise ValueError("no EOCD record")


def _zip_eocd(blob: bytes) -> tuple[int, int, int]:
    """(entry count, central-directory offset, cd size) from the
    end-of-central-directory record (validated scan: _zip_eocd_pos).
    ZIP64 (r11): an EOCD64 LOCATOR (PK\\x06\\x07) immediately
    preceding the EOCD redirects to the 64-bit record — required for
    any archive >4 GiB or >65,535 members, routine at crawl scale; a
    classic EOCD whose fields carry the 0xFFFF/0xFFFFFFFF sentinels
    WITHOUT a locator is corrupt and refuses."""
    pos = _zip_eocd_pos(blob)
    if pos >= 20 and blob[pos - 20 : pos - 16] == _EOCD64_LOC_SIG:
        (e64_off,) = struct.unpack("<Q", blob[pos - 12 : pos - 4])
        if not 0 <= e64_off <= len(blob) - 56:
            raise ValueError("EOCD64 offset out of range")
        rec = blob[e64_off : e64_off + 56]
        if rec[:4] != _EOCD64_SIG:
            raise ValueError("EOCD64 locator points at junk")
        n, cd_size, cd_off = struct.unpack("<QQQ", rec[32:56])
        if cd_off + cd_size > len(blob):
            raise ValueError("EOCD64 directory out of range")
        return n, cd_off, cd_size
    n, cd_size, cd_off = struct.unpack("<HII", blob[pos + 10 : pos + 20])
    if n == 0xFFFF or 0xFFFFFFFF in (cd_size, cd_off):
        raise ValueError("zip64 sentinel without EOCD64 locator")
    return n, cd_off, cd_size


def _zip64_promote(
    extra: bytes, usize: int, csize: int, loc_off: int
) -> tuple[int, int, int]:
    """0xFFFFFFFF sentinel promotion from the 0x0001 zip64 extended-
    information extra field (APPNOTE 4.5.3: only the sentineled fields
    appear, in the fixed order usize, csize, loc_off, disk)."""
    p = 0
    while p + 4 <= len(extra):
        hid, sz = struct.unpack("<HH", extra[p : p + 4])
        body = extra[p + 4 : p + 4 + sz]
        if hid == 0x0001:
            if len(body) < sz:
                raise ValueError("zip64 extra field truncated")
            q = 0
            out = []
            for v in (usize, csize, loc_off):
                if v == 0xFFFFFFFF:
                    if q + 8 > len(body):
                        raise ValueError("zip64 extra field too short")
                    (v,) = struct.unpack("<Q", body[q : q + 8])
                    q += 8
                out.append(v)
            return out[0], out[1], out[2]
        p += 4 + sz
    raise ValueError("zip64 sentinel without 0x0001 extra field")


def zip_has_eocd64(blob: bytes) -> bool:
    """True when the archive's EOCD is preceded by the ZIP64 locator —
    the per-archive attribution bit ``archive_zip64_meta`` reports, so
    the fixture rotation provably exercises BOTH layouts (r11). Uses
    the same validated scan as _zip_eocd — an archive comment (or
    trailing junk) containing the raw signature bytes cannot make the
    attribution bit disagree with the parser's EOCD choice (r12)."""
    pos = _zip_eocd_pos(blob)
    return pos >= 20 and blob[pos - 20 : pos - 16] == _EOCD64_LOC_SIG


def zip_member_list(blob: bytes) -> list[dict]:
    """Central-directory walk: one dict per member with name, method,
    crc, compressed/uncompressed sizes, and the local-header offset.
    The central directory is authoritative (local headers may carry
    zeros under the bit-3 data-descriptor convention)."""
    if not blob.startswith(_LOC_SIG) and not blob.startswith(_EOCD_SIG):
        raise ValueError("not a zip")
    n, cd_off, _cd_size = _zip_eocd(blob)
    out = []
    pos = cd_off
    for _ in range(n):
        if blob[pos : pos + 4] != _CEN_SIG:
            raise ValueError("bad central-directory entry")
        (method,) = struct.unpack("<H", blob[pos + 10 : pos + 12])
        crc, csize, usize = struct.unpack("<III", blob[pos + 16 : pos + 28])
        nlen, elen, clen = struct.unpack("<HHH", blob[pos + 28 : pos + 34])
        (loc_off,) = struct.unpack("<I", blob[pos + 42 : pos + 46])
        (flags,) = struct.unpack("<H", blob[pos + 8 : pos + 10])
        raw_name = blob[pos + 46 : pos + 46 + nlen]
        # APPNOTE D.2: names are cp437 unless general-purpose bit 11
        # (the language-encoding flag) declares UTF-8 — real
        # InfoZIP-era archives in this container carry 0x91-style
        # cp437 bytes (r14 sweep find); stdlib zipfile agrees
        if flags & 0x800:
            name = raw_name.decode("utf-8")
        else:
            try:
                name = raw_name.decode("ascii")
            except UnicodeDecodeError:
                name = raw_name.decode("cp437")
        if 0xFFFFFFFF in (csize, usize, loc_off):
            usize, csize, loc_off = _zip64_promote(
                blob[pos + 46 + nlen : pos + 46 + nlen + elen],
                usize, csize, loc_off,
            )
        out.append(
            {
                "name": name,
                "method": method,
                "crc": crc,
                "csize": csize,
                "usize": usize,
                "offset": loc_off,
                "flags": flags,
            }
        )
        pos += 46 + nlen + elen + clen
    return out


# standard CRC-32 table (poly 0xEDB88320) — generated, not transcribed
_ZC_CRC_TABLE = []
for _c in range(256):
    _k = _c
    for _ in range(8):
        _k = (_k >> 1) ^ 0xEDB88320 if _k & 1 else _k >> 1
    _ZC_CRC_TABLE.append(_k)


class _ZipCrypto:
    """Traditional PKWARE ("ZipCrypto") stream cipher (APPNOTE 6.1):
    three rolling keys seeded from the password — CRC-32 feedback on
    key0/key2, the 134775813 LCG on key1 — with one keystream byte
    per data byte. Weak by modern standards, but it is what the
    majority of password-protected zips in public dumps actually
    use; WinZip AES (method 99 / AE-x) stays a refusal."""

    def __init__(self, password: bytes):
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for c in password:
            self._update(c)

    @staticmethod
    def _crc(k: int, c: int) -> int:
        return (k >> 8) ^ _ZC_CRC_TABLE[(k ^ c) & 0xFF]

    def _update(self, c: int) -> None:
        self.k0 = self._crc(self.k0, c)
        self.k1 = ((self.k1 + (self.k0 & 0xFF)) * 134775813 + 1) \
            & 0xFFFFFFFF
        self.k2 = self._crc(self.k2, self.k1 >> 24)

    def _ks(self) -> int:
        t = (self.k2 | 2) & 0xFFFF
        return ((t * (t ^ 1)) >> 8) & 0xFF

    def decrypt(self, data: bytes) -> bytes:
        out = bytearray()
        for c in data:
            c ^= self._ks()
            self._update(c)  # keys roll on the PLAINTEXT byte
            out.append(c)
        return bytes(out)

    def encrypt(self, data: bytes) -> bytes:
        out = bytearray()
        for c in data:
            out.append(c ^ self._ks())
            self._update(c)
        return bytes(out)


def zip_read_member(blob: bytes, entry: dict,
                    password: str | None = None) -> bytes:
    """Decompress one member (stored or deflate) via its local header,
    taking sizes/CRC from the central-directory entry. Raises on CRC
    or length mismatch — corruption is a refusal, never silent.
    ZipCrypto-protected members (general-purpose bit 0) decrypt when
    ``password`` is given — the 12-byte encryption header's check
    byte gates the password BEFORE any inflate (APPNOTE: byte 11
    echoes the CRC's high byte); AES-encrypted members (method 99)
    and passwordless encrypted reads refuse (r13)."""
    pos = entry["offset"]
    if blob[pos : pos + 4] != _LOC_SIG:
        raise ValueError("bad local header")
    nlen, elen = struct.unpack("<HH", blob[pos + 26 : pos + 30])
    start = pos + 30 + nlen + elen
    raw = blob[start : start + entry["csize"]]
    method = entry["method"]
    if method == 99:  # WinZip AES (AE-1/AE-2), r13
        import hashlib as _hl
        import hmac as _hmac

        from hadoopxmlextractor_spark.operators import aes as A

        if password is None:
            raise ValueError("encrypted zip member (no password)")
        extras = blob[pos + 30 + nlen : pos + 30 + nlen + elen]
        ae = None
        at = 0
        while at + 4 <= len(extras):
            hid, hsz = struct.unpack_from("<HH", extras, at)
            if hid == 0x9901:
                ae = extras[at + 4 : at + 4 + hsz]
                break
            at += 4 + hsz
        if ae is None or len(ae) < 7:
            raise ValueError("AES zip member missing AE-x extra")
        ver, vendor, strength = struct.unpack_from("<H2sB", ae, 0)
        (method,) = struct.unpack_from("<H", ae, 5)
        if vendor != b"AE" or ver not in (1, 2) or strength not in (
            1, 2, 3,
        ):
            raise ValueError("malformed AE-x extra field")
        keylen = 8 * (strength + 1)
        salt_len = 4 * (strength + 1)
        if len(raw) < salt_len + 2 + 10:
            raise ValueError("AES member shorter than framing")
        salt = raw[:salt_len]
        dk = _hl.pbkdf2_hmac(
            "sha1", password.encode("utf-8"), salt, 1000,
            2 * keylen + 2,
        )
        if raw[salt_len : salt_len + 2] != dk[2 * keylen :]:
            raise ValueError("zip password check failed")
        ct = raw[salt_len + 2 : -10]
        mac = _hmac.new(dk[keylen : 2 * keylen], ct, _hl.sha1)
        if mac.digest()[:10] != raw[-10:]:
            raise ValueError("zip AES authentication failed")
        raw = A.ctr_winzip(dk[:keylen], ct)
        # AE-2 stores CRC 0 — the HMAC above replaces it; AE-1
        # keeps the real CRC and the tail check still applies
        ae2 = ver == 2
    else:
        ae2 = False
    if entry["method"] != 99 and entry.get("flags", 0) & 0x0001:
        if password is None:
            raise ValueError("encrypted zip member (no password)")
        if len(raw) < 12:
            raise ValueError("encrypted member shorter than header")
        zc = _ZipCrypto(password.encode("latin-1"))
        dec = zc.decrypt(raw)
        if entry.get("flags", 0) & 0x0008 == 0 and \
                dec[11] != (entry["crc"] >> 24) & 0xFF:
            raise ValueError("zip password check failed")
        raw = dec[12:]
    if method == 0:
        data = raw
    elif method == 8:
        # Inflate at most usize+1 bytes: the central directory's
        # declared size bounds the allocation, so a member claiming
        # 10 bytes can't materialize megabytes before the check below.
        d = zlib.decompressobj(-15)
        data = d.decompress(raw, entry["usize"] + 1)
        if d.unconsumed_tail:
            raise ValueError("zip member inflates past declared size")
    else:
        raise ValueError(f"unsupported zip method {method}")
    if len(data) != entry["usize"] or (
        not ae2 and zlib.crc32(data) != entry["crc"]
    ):
        raise ValueError("zip member corrupt (crc/length mismatch)")
    return data


def _zip_open_map(blob: bytes) -> dict[str, bytes]:
    return {e["name"]: zip_read_member(blob, e) for e in zip_member_list(blob)}


def build_zip(
    members: list[tuple[str, bytes, int, bool]],
    comment: bytes = b"",
    *,
    zip64: bool = False,
    passwords: dict[str, str] | None = None,
    aes_passwords: dict[str, tuple[str, int]] | None = None,
) -> bytes:
    """Write a ZIP from (name, data, method 0|8, use data descriptor)
    tuples — the synth-side partner of :func:`zip_member_list`.
    Data-descriptor members (general-purpose bit 3) write zero
    crc/sizes in the local header and a PK\\x07\\x08 trailer, the way
    streaming zippers (and most crawled archives) do. ``zip64=True``
    writes the full ZIP64 layout regardless of size (the APPNOTE
    "version needed 4.5" form big archivers emit): every central
    entry carries 0xFFFFFFFF sentinels plus the 0x0001 extended-
    information extra, and the EOCD64 record + locator precede a
    sentineled classic EOCD — so readers MUST take the 64-bit path
    (cross-validated against stdlib ``zipfile`` both directions)."""
    out = bytearray()
    cen = bytearray()
    ver = 45 if zip64 else 20
    for name, data, method, desc in members:
        nameb = name.encode("utf-8")
        crc = zlib.crc32(data)
        if method == 8:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = c.compress(data) + c.flush()
        else:
            comp = data
        flags = 0x0008 if desc else 0
        if not name.isascii():
            # APPNOTE bit 11: declare UTF-8 names, as real tools do
            # (readers fall back to cp437 otherwise; r14)
            flags |= 0x0800
        extra_loc = b""
        if aes_passwords and name in aes_passwords:
            # WinZip AE-2 ([WinZip AES spec]): method 99, the 0x9901
            # extra carrying the ACTUAL method, PBKDF2-SHA1 keys,
            # AES-CTR payload framed salt ‖ verifier ‖ ct ‖ HMAC[:10],
            # CRC stored 0 (authentication replaces it)
            import hashlib as _hl
            import hmac as _hmac

            from hadoopxmlextractor_spark.operators import aes as A

            if desc:
                raise ValueError(
                    "descriptor + AES not supported by build_zip"
                )
            pw, strength = aes_passwords[name]
            keylen = 8 * (strength + 1)
            salt = _hl.md5(nameb + b":aesalt").digest()[
                : 4 * (strength + 1)
            ]
            dk = _hl.pbkdf2_hmac(
                "sha1", pw.encode("utf-8"), salt, 1000, 2 * keylen + 2
            )
            ct = A.ctr_winzip(dk[:keylen], comp)
            mac = _hmac.new(dk[keylen : 2 * keylen], ct, _hl.sha1)
            comp = salt + dk[2 * keylen :] + ct + mac.digest()[:10]
            flags |= 0x0001
            extra_loc = struct.pack(
                "<HHH2sBH", 0x9901, 7, 2, b"AE", strength, method
            )
            method = 99
            crc = 0  # AE-2
        if passwords and name in passwords:
            # ZipCrypto: 12-byte header (11 deterministic bytes + the
            # CRC-high check byte) + payload through the stream
            # cipher; csize grows by 12. Incompatible with the
            # data-descriptor arm here (the check byte would switch
            # to the DOS-time convention — not emitted by this synth)
            if desc:
                raise ValueError(
                    "descriptor + ZipCrypto not supported by build_zip"
                )
            flags |= 0x0001
            ehdr = hashlib.md5(nameb + b":zchdr").digest()[:11] \
                + bytes([(crc >> 24) & 0xFF])
            zc = _ZipCrypto(passwords[name].encode("latin-1"))
            comp = zc.encrypt(ehdr + comp)
        loc_off = len(out)
        hdr_crc, hdr_cs, hdr_us = (0, 0, 0) if desc else (crc, len(comp), len(data))
        out += _LOC_SIG + struct.pack(
            "<HHHHHIIIHH", ver, flags, method, 0x6020, 0x5A21,
            hdr_crc, hdr_cs, hdr_us, len(nameb), len(extra_loc),
        )
        out += nameb + extra_loc + comp
        if desc:
            out += b"PK\x07\x08" + struct.pack("<III", crc, len(comp), len(data))
        if zip64:
            extra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(comp), loc_off
            )
            cen += _CEN_SIG + struct.pack(
                "<HHHHHHIIIHHHHHII", ver, ver, flags, method, 0x6020,
                0x5A21, crc, 0xFFFFFFFF, 0xFFFFFFFF, len(nameb),
                len(extra), 0, 0, 0, 0, 0xFFFFFFFF,
            )
            cen += nameb + extra
        else:
            cen += _CEN_SIG + struct.pack(
                "<HHHHHHIIIHHHHHII", ver, ver, flags, method, 0x6020,
                0x5A21, crc, len(comp), len(data), len(nameb),
                len(extra_loc), 0, 0, 0, 0, loc_off,
            )
            cen += nameb + extra_loc
    cd_off = len(out)
    out += cen
    if zip64:
        e64_off = len(out)
        out += _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ", 44, ver, ver, 0, 0,
            len(members), len(members), len(cen), cd_off,
        )
        out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, e64_off, 1)
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
            len(comment),
        )
    else:
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, len(members), len(members), len(cen), cd_off,
            len(comment),
        )
    out += comment
    return bytes(out)


# ---------------------------------------------------------------------------
# DOCX — word/document.xml paragraph walk
# ---------------------------------------------------------------------------


def _local(tag: str) -> str:
    return tag.rpartition("}")[2]


def _docx_extract(blob: bytes) -> tuple[int, str]:
    """(paragraph count, text) of a DOCX: parse word/document.xml,
    walk <w:p> paragraphs in body order, concatenating <w:t> runs with
    <w:tab/> as a tab and <w:br/> as a newline; run/paragraph
    FORMATTING properties (rPr/pPr) are transparent. Paragraphs join
    with newlines — the same visible-text contract as html_text."""
    members = _zip_open_map(blob)
    doc = members.get("word/document.xml")
    if doc is None:
        raise ValueError("no word/document.xml")
    root = ElementTree.fromstring(doc)
    paras = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        parts: list[str] = []
        for el in p.iter():
            loc = _local(el.tag)
            if loc == "t":
                parts.append(el.text or "")
            elif loc == "tab":
                parts.append("\t")
            elif loc == "br":
                parts.append("\n")
        paras.append("".join(parts))
    return len(paras), "\n".join(paras)


# ---------------------------------------------------------------------------
# EPUB — container.xml -> OPF manifest/spine -> XHTML chapters
# ---------------------------------------------------------------------------


def _xhtml_body_text(data: bytes) -> str:
    """Visible text of one XHTML chapter: every text chunk under
    <body> in document order (head/title dropped), whitespace-joined."""
    root = ElementTree.fromstring(data)
    body = None
    for el in root.iter():
        if _local(el.tag) == "body":
            body = el
            break
    if body is None:
        return ""
    chunks = []
    for el in body.iter():
        for t in (el.text, el.tail):
            if t and t.strip():
                chunks.append(" ".join(t.split()))
    return " ".join(chunks)


def _epub_extract(blob: bytes) -> tuple[int, str]:
    """(chapter count, text) of an EPUB: META-INF/container.xml names
    the OPF package; the OPF's <spine> itemref order (resolved through
    the <manifest> id->href map, hrefs relative to the OPF directory)
    is the READING order — manifest members outside the spine (nav,
    cover) are never emitted. Chapters join with newlines."""
    members = _zip_open_map(blob)
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("no META-INF/container.xml")
    croot = ElementTree.fromstring(container)
    opf_path = None
    for el in croot.iter():
        if _local(el.tag) == "rootfile":
            opf_path = el.get("full-path")
            break
    if not opf_path or opf_path not in members:
        raise ValueError("no OPF package")
    opf_dir = opf_path.rpartition("/")[0]
    oroot = ElementTree.fromstring(members[opf_path])
    hrefs: dict[str, str] = {}
    spine: list[str] = []
    for el in oroot.iter():
        loc = _local(el.tag)
        if loc == "item":
            hrefs[el.get("id", "")] = el.get("href", "")
        elif loc == "itemref":
            spine.append(el.get("idref", ""))
    texts = []
    for idref in spine:
        href = hrefs.get(idref)
        if not href:
            raise ValueError(f"spine idref {idref!r} not in manifest")
        path = f"{opf_dir}/{href}" if opf_dir else href
        if path not in members:
            raise ValueError(f"spine chapter {path!r} missing")
        texts.append(_xhtml_body_text(members[path]))
    return len(texts), "\n".join(texts)


# ---------------------------------------------------------------------------
# XLSX — workbook rels -> sheet XML -> typed cells (+ shared strings)
# ---------------------------------------------------------------------------


def _ooxml_rels(members: dict[str, bytes], part: str) -> dict[str, str]:
    """rId -> target map of one part's .rels file, targets resolved
    relative to the part's directory (OPC §9.3)."""
    d, _, base = part.rpartition("/")
    rels_path = f"{d}/_rels/{base}.rels" if d else f"_rels/{base}.rels"
    data = members.get(rels_path)
    if data is None:
        raise ValueError(f"missing rels {rels_path}")
    out = {}
    for el in ElementTree.fromstring(data).iter():
        if _local(el.tag) == "Relationship":
            tgt = el.get("Target", "")
            out[el.get("Id", "")] = f"{d}/{tgt}" if d else tgt
    return out


_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _cell_ref(ref: str) -> tuple[str, int]:
    m = _COL_RE.fullmatch(ref)
    if m is None:
        raise ValueError(f"bad cell ref {ref!r}")
    return m.group(1), int(m.group(2))


def _xlsx_extract(blob: bytes) -> list[dict]:
    """Typed cells of every sheet: workbook.xml's <sheet> order
    resolved through the workbook rels (never the zip member order),
    shared-string cells (t="s") looked up in xl/sharedStrings.xml,
    inline strings (t="inlineStr") from <is><t>, numbers from <v>
    verbatim (no float parse — the raw token is the fact)."""
    members = _zip_open_map(blob)
    wb = members.get("xl/workbook.xml")
    if wb is None:
        raise ValueError("no xl/workbook.xml")
    rels = _ooxml_rels(members, "xl/workbook.xml")
    sst: list[str] = []
    if "xl/sharedStrings.xml" in members:
        for si in ElementTree.fromstring(members["xl/sharedStrings.xml"]):
            sst.append(
                "".join(
                    t.text or ""
                    for t in si.iter()
                    if _local(t.tag) == "t"
                )
            )
    out = []
    for el in ElementTree.fromstring(wb).iter():
        if _local(el.tag) != "sheet":
            continue
        name = el.get("name", "")
        rid = next(
            (v for k, v in el.attrib.items()
             if _local(k) == "id" and k.startswith("{")), ""
        )
        path = rels.get(rid)
        if path is None or path not in members:
            raise ValueError(f"sheet rel {rid!r} unresolved")
        for row in ElementTree.fromstring(members[path]).iter():
            if _local(row.tag) != "c":
                continue
            col, rnum = _cell_ref(row.get("r", ""))
            ctype = row.get("t", "n")
            value = None
            if ctype == "inlineStr":
                value = "".join(
                    t.text or ""
                    for t in row.iter()
                    if _local(t.tag) == "t"
                )
            else:
                v = next(
                    (c for c in row if _local(c.tag) == "v"), None
                )
                raw = v.text if v is not None else None
                value = (
                    sst[int(raw)] if ctype == "s" and raw is not None
                    else raw
                )
            out.append({
                "sheet": name, "row": rnum, "col": col,
                "kind": ctype, "value": value,
            })
    if not out:
        raise ValueError("workbook with no cells")
    return out


# ---------------------------------------------------------------------------
# PPTX — presentation rels -> slide order -> a:t text runs
# ---------------------------------------------------------------------------


def _pptx_extract(blob: bytes) -> list[tuple[int, str]]:
    """(slide index, text) per slide in PRESENTATION order: the
    <p:sldIdLst> sequence resolved through the presentation rels —
    never the numeric member names, which real decks reorder freely.
    Slide text = a:t runs concatenated per a:p paragraph, paragraphs
    joined with newlines."""
    members = _zip_open_map(blob)
    pres = members.get("ppt/presentation.xml")
    if pres is None:
        raise ValueError("no ppt/presentation.xml")
    rels = _ooxml_rels(members, "ppt/presentation.xml")
    slides = []
    for el in ElementTree.fromstring(pres).iter():
        if _local(el.tag) != "sldId":
            continue
        rid = next(
            (v for k, v in el.attrib.items() if _local(k) == "id"
             and k.startswith("{")), ""
        )
        path = rels.get(rid)
        if path is None or path not in members:
            raise ValueError(f"slide rel {rid!r} unresolved")
        slides.append(path)
    out = []
    for k, path in enumerate(slides):
        root = ElementTree.fromstring(members[path])
        paras = []
        for p in root.iter():
            if _local(p.tag) != "p" or not p.tag.startswith(
                "{http://schemas.openxmlformats.org/drawingml"
            ):
                continue
            paras.append(
                "".join(
                    t.text or ""
                    for t in p.iter()
                    if _local(t.tag) == "t"
                )
            )
        out.append((k, "\n".join(paras)))
    if not out:
        raise ValueError("deck with no slides")
    return out


# ---------------------------------------------------------------------------
# PDF — object walk -> page tree -> content-stream text operators
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_REF_RE_T = rb"/%s\s+(\d+)\s+0\s+R"
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_OCT_RE = re.compile(r"\\([0-7]{1,3})")

_PDF_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "(": "(", ")": ")", "\\": "\\",
}


def _pdf_dict_span(blob: bytes, pos: int) -> bytes:
    """Bytes of the balanced ``<< ... >>`` dictionary starting at or
    after ``pos`` (nested dicts counted, per §7.3.7)."""
    start = blob.index(b"<<", pos)
    depth = 0
    i = start
    while i < len(blob) - 1:
        if blob[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif blob[i : i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return blob[start:i]
        else:
            i += 1
    raise ValueError("unterminated PDF dictionary")


def _pdf_object_at(blob: bytes, off: int) -> tuple[int, bytes]:
    """(objnum, body) of the indirect object starting at byte ``off``.
    A stream object with a DIRECT /Length is skipped BY LENGTH, not by
    searching for ``endobj`` — compressed stream bytes may contain the
    keyword (the reason xref-driven loading beats the flat scan on
    real files)."""
    m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", blob[off : off + 64])
    if m is None:
        raise ValueError(f"no object at xref offset {off}")
    bstart = off + m.end()
    sm = re.compile(rb"stream(\r\n|\n)").search(blob, bstart)
    endpos = None
    if sm is not None:
        head = blob[bstart : sm.start()]
        if b"endobj" not in head:  # the stream belongs to THIS object
            lm = (
                None
                if re.search(rb"/Length\s+\d+\s+\d+\s+R", head)
                else re.search(rb"/Length\s+(\d+)", head)
            )
            if lm is not None:
                endpos = blob.index(b"endobj", sm.end() + int(lm.group(1)))
    if endpos is None:
        endpos = blob.index(b"endobj", bstart)
    return int(m.group(1)), blob[bstart:endpos]


def _pdf_unpredict(data: bytes, parms: bytes) -> bytes:
    """Undo the /DecodeParms PNG row predictor (/Predictor >= 10) on a
    decoded xref stream — virtually every writer predicts xref rows
    with PNG Up. Reuses the full five-filter PNG unfilter from the
    image tier (bpp 1: xref rows are byte columns)."""
    m = re.search(rb"/Predictor\s+(\d+)", parms)
    pred = int(m.group(1)) if m else 1
    if pred == 1:
        return data
    if pred < 10:
        raise ValueError("TIFF predictor unsupported")
    cm = re.search(rb"/Columns\s+(\d+)", parms)
    cols = int(cm.group(1)) if cm else 1
    if cols <= 0 or len(data) % (cols + 1):
        raise ValueError("xref stream predictor rows misaligned")
    from hadoopxmlextractor_spark.operators.multimodal import _png_unfilter

    rows, _ = _png_unfilter(data, 0, cols, len(data) // (cols + 1), 1)
    return rows.tobytes()


def _pdf_xref_stream_entries(body: bytes) -> tuple[dict[int, tuple], bytes]:
    """Entries of one ``/Type /XRef`` cross-reference STREAM (PDF
    1.5+, §7.5.8): /W field widths (a zero width means the default —
    type 1), /Index subsections (default [0 /Size]), /DecodeParms
    predictor undone. Returns ({objnum: ('n', offset) | ('c', objstm,
    idx)}, head dict bytes) — free (type 0) entries are skipped."""
    head = body.split(b"stream", 1)[0]
    wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", head)
    sm = re.search(rb"/Size\s+(\d+)", head)
    if wm is None or sm is None:
        raise ValueError("xref stream without /W or /Size")
    w = [int(wm.group(k)) for k in (1, 2, 3)]
    data = _pdf_stream_data(body)
    pm = re.search(rb"/DecodeParms\s*<<(.*?)>>", head, re.S)
    if pm is not None:
        data = _pdf_unpredict(data, pm.group(1))
    im = re.search(rb"/Index\s*\[((?:\s*\d+)+)\s*\]", head)
    idx = (
        [int(x) for x in im.group(1).split()]
        if im
        else [0, int(sm.group(1))]
    )
    rowlen = sum(w)
    entries: dict[int, tuple] = {}
    pos = 0
    for s in range(0, len(idx) - 1, 2):
        for k in range(idx[s + 1]):
            row = data[pos : pos + rowlen]
            if len(row) < rowlen:
                raise ValueError("truncated xref stream data")
            pos += rowlen
            t = int.from_bytes(row[: w[0]], "big") if w[0] else 1
            f2 = int.from_bytes(row[w[0] : w[0] + w[1]], "big")
            f3 = int.from_bytes(row[w[0] + w[1] : rowlen], "big")
            num = idx[s] + k
            if t == 1:
                entries[num] = ("n", f2)
            elif t == 2:
                entries[num] = ("c", f2, f3)
    return entries, head


def _pdf_xref_chain(blob: bytes) -> tuple[dict[int, tuple], bytes]:
    """Cross-reference chain from the LAST ``startxref``: classic
    ``xref`` tables and /XRef streams both handled, incremental
    updates followed through /Prev with newest-first precedence (an
    updated object's newer entry wins). Returns (entries, concatenated
    trailer/dict bytes for /Root-class lookups)."""
    sx = blob.rindex(b"startxref")
    off: int | None = int(blob[sx + 9 :].split()[0])
    entries: dict[int, tuple] = {}
    trailers: list[bytes] = []
    seen: set[int] = set()
    while off is not None and off not in seen:
        if not 0 <= off < len(blob):
            raise ValueError("xref offset out of range")
        seen.add(off)
        if blob[off : off + 4] == b"xref":
            tpos = blob.index(b"trailer", off)
            toks = blob[off + 4 : tpos].split()
            ti = 0
            while ti + 1 < len(toks):
                start, count = int(toks[ti]), int(toks[ti + 1])
                ti += 2
                for k in range(count):
                    o, _gen, kw = toks[ti : ti + 3]
                    ti += 3
                    if kw == b"n":
                        entries.setdefault(start + k, ("n", int(o)))
                    elif kw != b"f":
                        raise ValueError("bad xref entry keyword")
            tdict = _pdf_dict_span(blob, tpos)
        else:
            _num, body = _pdf_object_at(blob, off)
            head = body.split(b"stream", 1)[0]
            if b"/XRef" not in head:
                raise ValueError("startxref does not point at xref data")
            es, tdict = _pdf_xref_stream_entries(body)
            for num, e in es.items():
                entries.setdefault(num, e)
        trailers.append(tdict)
        pm = re.search(rb"/Prev\s+(\d+)", tdict)
        off = int(pm.group(1)) if pm else None
    return entries, b"".join(trailers)


def _pdf_objstm_objects(body: bytes) -> dict[int, bytes]:
    """Contained objects of one ``/Type /ObjStm`` object stream
    (§7.5.7): decompressed data starts with /N (objnum, offset) integer
    pairs; object k runs from /First + offset_k to the next offset."""
    head = body.split(b"stream", 1)[0]
    nm = re.search(rb"/N\s+(\d+)", head)
    fm = re.search(rb"/First\s+(\d+)", head)
    if b"/ObjStm" not in head or nm is None or fm is None:
        raise ValueError("not an object stream")
    n, first = int(nm.group(1)), int(fm.group(1))
    data = _pdf_stream_data(body)
    toks = data[:first].split()
    if len(toks) < 2 * n:
        raise ValueError("short ObjStm header")
    pairs = [(int(toks[2 * k]), int(toks[2 * k + 1])) for k in range(n)]
    out: dict[int, bytes] = {}
    for k, (num, o) in enumerate(pairs):
        end = pairs[k + 1][1] if k + 1 < n else len(data) - first
        if not 0 <= o <= end <= len(data) - first:
            raise ValueError("ObjStm offsets out of order")
        out[num] = data[first + o : first + end]
    return out


# PDF standard security handler (ISO 32000 §7.6.3), V1/R2 RC4-40:
# the 32-byte password pad every PDF implementation shares
_PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pdf_enc_string(body: bytes, key: bytes,
                    length: int = 32) -> bytes | None:
    """The ``length``-byte /O /U /OE /UE /Perms value after ``/key``
    in an encrypt dict — hex-string form (how the synth and many
    writers emit it, escape-free) or a raw literal."""
    m = re.search(rb"/" + key + rb"\s*<([0-9A-Fa-f\s]+)>", body)
    if m:
        return bytes.fromhex(re.sub(rb"\s", b"", m.group(1)).decode())
    m = re.search(
        rb"/" + key + rb"\s*\((.{" + str(length).encode() + rb"})\)",
        body, re.S,
    )
    return m.group(1) if m else None


def _pdf_hash_2b(password: bytes, salt: bytes,
                 udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 hardened hash: an iterated
    AES-CBC/SHA-2 loop (round key/IV from the running hash, digest
    family chosen by the first cipher block mod 3) that runs at least
    64 rounds and stops when the last cipher byte permits. R5 files
    use plain SHA-256 instead; both feed the same /U check and
    /UE unwrap."""
    from hadoopxmlextractor_spark.operators import aes as A

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = A.cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _pdf_map_stream(body: bytes, fn, resolve_len=None) -> bytes:
    """Body with its stream payload (direct-/Length framed, the same
    contract as _pdf_stream_data) transformed by ``fn``; bodies
    without a stream pass through. An INDIRECT '/Length n 0 R' is
    resolved through ``resolve_len`` (obj num → byte count) when
    given — required on the decrypt path, where an unframed stream
    would otherwise flow downstream as ciphertext — and raises when
    the stream cannot be framed exactly (never transform a guess)."""
    sm = re.search(rb"stream(?:\r\n|\n)", body)
    if sm is None:
        return body
    head = body[: sm.start()]
    im = re.search(rb"/Length\s+(\d+)\s+\d+\s+R", head)
    if im is not None:
        if resolve_len is None:
            return body
        n = resolve_len(int(im.group(1)))
    else:
        lm = re.search(rb"/Length\s+(\d+)", head)
        if lm is None:
            if resolve_len is None:
                return body
            raise ValueError("stream without /Length")
        n = int(lm.group(1))
    start = sm.end()
    if start + n > len(body):
        raise ValueError("/Length exceeds object body")
    return body[:start] + fn(body[start : start + n]) + body[start + n :]


def _pdf_map_strings(head: bytes, fn) -> bytes:
    """``head`` (an object body up to its stream keyword) with every
    literal ``(…)`` and hex ``<…>`` string's RAW BYTES transformed by
    ``fn`` and re-emitted in hex form (escape-free, always-legal PDF).
    ``<<``/``>>`` dict delimiters pass through. This is how encrypted
    STRINGS (ISO 32000 §7.6.2: strings and streams are the two
    encrypted payload classes) get the same per-object decrypt as
    stream payloads — an /Info walk over an encrypted file must never
    surface RC4/AES ciphertext as a field value."""
    s = head.decode("latin-1")
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "(":
            lit, j = _pdf_literal(s, i)
            out.append(
                "<" + fn(lit.encode("latin-1")).hex() + ">"
            )
            i = j
        elif c == "<" and i + 1 < n and s[i + 1] == "<":
            out.append("<<")
            i += 2
        elif c == "<":
            j = s.index(">", i)
            hx = re.sub(r"\s", "", s[i + 1 : j])
            if len(hx) % 2:
                hx += "0"
            out.append("<" + fn(bytes.fromhex(hx)).hex() + ">")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out).encode("latin-1")


def _pdf_blank_cf(enc: bytes) -> bytes:
    """``enc`` with the /CF crypt-filter subtree replaced by spaces —
    scans the balanced ``<< >>`` nesting after ``/CF`` so fields that
    must come from the TOP-LEVEL encrypt dict (/Length bit counts)
    never match the per-filter byte counts inside it."""
    m = re.search(rb"/CF\s*<<", enc)
    if m is None:
        return enc
    depth = 1
    i = m.end()
    n = len(enc)
    while i < n and depth:
        if enc[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif enc[i : i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return enc[: m.start()] + b" " * (i - m.start()) + enc[i:]


def _pdf_decrypt_objects(
    blob: bytes, objs: dict[int, bytes], trailer: bytes
) -> None:
    """Attempt the EMPTY-USER-PASSWORD standard-handler decrypt (the
    owner-restricted files that make up most 'encrypted' PDFs in the
    wild), ISO 32000 §7.6.3 — all three shipping generations:

    - V1/R2: RC4-40, key MD5(pad ‖ O ‖ P(le32) ‖ ID0)[:5];
    - V2/R3: RC4 with /Length-bit keys (the wild's default, usually
      128), the SAME hash then 50× iterated MD5(h[:keylen]);
    - V4/R4: /CF crypt filters — /StdCF with /CFM /V2 (RC4) or
      /AESV2 (AES-128-CBC, IV = first 16 stream bytes, PKCS#7
      padding validated), applied to BOTH streams and strings
      (/StmF and /StrF must name /StdCF).

    The matching /U check (R2: RC4(fkey, pad); R3/R4: the 19-round
    re-keyed RC4 over MD5(pad ‖ ID0), first 16 bytes compared)
    AUTHENTICATES the empty password before any byte is trusted. A
    failed check (a REAL user password), any other handler, or the
    R5/R6 AESV3 generation refuses — the certified marker-row
    contract (r11)."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", trailer)
    enc = objs.get(int(em.group(1))) if em else None
    if enc is None:
        raise ValueError("encrypted PDF")
    ver = re.search(rb"/V\s+(\d+)", enc)
    rev = re.search(rb"/R\s+(\d+)", enc)
    if b"/Standard" not in enc or ver is None or rev is None:
        raise ValueError("encrypted PDF")  # unsupported handler
    v, r = int(ver.group(1)), int(rev.group(1))
    # the key-length /Length is the TOP-LEVEL bit count: a V4 file's
    # crypt-filter dict may carry its own BYTE-count '/Length 16'
    # inside /CF << ... >> and may precede the top-level entry —
    # blank the (balanced) /CF subtree before matching (r12 ADVICE)
    lm = re.search(rb"/Length\s+(\d+)", _pdf_blank_cf(enc))
    nbits = int(lm.group(1)) if lm else 40
    aes = False
    if (v, r) == (1, 2):
        keylen = 5
    elif (v, r) == (2, 3):
        keylen = nbits // 8
        if not 5 <= keylen <= 16 or nbits % 8:
            raise ValueError("encrypted PDF")
    elif (v, r) == (4, 4):
        cfm = re.search(rb"/CFM\s*/(AESV2|V2)\b", enc)
        if (
            cfm is None
            or re.search(rb"/StmF\s*/StdCF", enc) is None
            or re.search(rb"/StrF\s*/StdCF", enc) is None
        ):
            raise ValueError("encrypted PDF")
        aes = cfm.group(1) == b"AESV2"
        if not aes and lm is None:
            # no top-level /Length: fall back to the crypt filter's
            # own entry, which writers emit as a BYTE count (≤ 40 ⇒
            # bytes, the pdf.js/poppler heuristic) or a bit count
            cfl = re.search(rb"/Length\s+(\d+)", enc)
            if cfl is not None:
                cfv = int(cfl.group(1))
                nbits = cfv * 8 if cfv <= 40 else cfv
        keylen = 16 if aes else nbits // 8
        if not aes and (not 5 <= keylen <= 16 or nbits % 8):
            raise ValueError("encrypted PDF")
    elif (v, r) in ((5, 5), (5, 6)):
        # AES-256 generation (r13): R5 (Adobe ExtensionLevel 3) and
        # R6 (PDF 2.0) — SHA-256-family key derivation, the file key
        # unwrapped from /UE, data AES-256-CBC under ONE file key
        # (no per-object derivation in V5)
        from hadoopxmlextractor_spark.operators import aes as A

        if (
            re.search(rb"/CFM\s*/AESV3\b", enc) is None
            or re.search(rb"/StmF\s*/StdCF", enc) is None
            or re.search(rb"/StrF\s*/StdCF", enc) is None
        ):
            raise ValueError("encrypted PDF")
        u = _pdf_enc_string(enc, b"U", 48)
        ue = _pdf_enc_string(enc, b"UE", 32)
        perms_ct = _pdf_enc_string(enc, b"Perms", 16)
        pm5 = re.search(rb"/P\s+(-?\d+)", enc)
        if (
            u is None or ue is None or perms_ct is None or pm5 is None
            or len(u) != 48 or len(ue) != 32 or len(perms_ct) != 16
        ):
            raise ValueError("encrypted PDF")
        pw = b""  # the empty-user-password flow, as in R2-R4
        if r == 5:
            h = hashlib.sha256(pw + u[32:40]).digest()
            ik = hashlib.sha256(pw + u[40:48]).digest()
        else:
            h = _pdf_hash_2b(pw, u[32:40])
            ik = _pdf_hash_2b(pw, u[40:48])
        if h != u[:32]:
            raise ValueError("encrypted PDF")  # a real user password
        fkey = A.cbc_decrypt_nopad(ik, bytes(16), ue)
        # /Perms integrity check (Algorithm 13): AES-256-ECB decrypt
        # must reveal the 'adb' marker and echo /P — a wrong or
        # tampered key refuses before any payload byte is trusted
        dec = A.ecb_decrypt(fkey, perms_ct)  # one block; AES-NI path
        p5 = int(pm5.group(1)) & 0xFFFFFFFF
        if (
            dec[9:12] != b"adb"
            or dec[0:4] != p5.to_bytes(4, "little")
            or dec[8:9] not in (b"T", b"F")
        ):
            raise ValueError("encrypted PDF")
        _pdf_apply_decrypt(
            objs, int(em.group(1)), fkey, aes=True, v5=True
        )
        return
    else:
        raise ValueError("encrypted PDF")  # custom handlers, …
    o = _pdf_enc_string(enc, b"O")
    u = _pdf_enc_string(enc, b"U")
    pm = re.search(rb"/P\s+(-?\d+)", enc)
    im = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", trailer)
    if o is None or u is None or pm is None or im is None:
        raise ValueError("encrypted PDF")
    id0 = bytes.fromhex(im.group(1).decode())
    p = int(pm.group(1)) & 0xFFFFFFFF
    nometa = v == 4 and re.search(rb"/EncryptMetadata\s+false", enc)
    h = hashlib.md5(
        _PDF_PAD + o + p.to_bytes(4, "little") + id0
        + (b"\xff\xff\xff\xff" if nometa else b"")
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    fkey = h[:keylen]
    if r == 2:
        ok = _rc4(fkey, _PDF_PAD) == u
    else:
        x = _rc4(fkey, hashlib.md5(_PDF_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in fkey), x)
        ok = x == u[:16]
    if not ok:
        raise ValueError("encrypted PDF")  # a real user password
    _pdf_apply_decrypt(objs, int(em.group(1)), fkey, aes=aes)


def _pdf_apply_decrypt(
    objs: dict[int, bytes], enc_num: int, fkey: bytes,
    aes: bool = False, v5: bool = False,
) -> None:
    """Per-object decrypt of every stream payload AND every string in
    the non-stream portion (both encrypted payload classes, §7.6.2),
    key MD5(fkey ‖ num(le24) ‖ gen(le16) [‖ sAlT for AESV2])
    [:min(len+5,16)]; generation 0 — the only generation this
    engine's writers and fixtures emit. The V5 (/AESV3) generation
    uses the 32-byte FILE key directly on every object — ISO 32000-2
    dropped per-object derivation. An indirect '/Length n 0 R'
    resolves through the (plaintext — numbers are never encrypted)
    referenced integer object; a stream that cannot be framed exactly
    refuses rather than transforming a guess. The /Encrypt dict
    itself is exempt (its /O and /U are stored unencrypted)."""

    def _resolve_len(ref: int) -> int:
        body = objs.get(ref)
        m = re.match(rb"\s*(\d+)\s*$", body or b"")
        if m is None:
            raise ValueError("unresolvable indirect /Length")
        return int(m.group(1))

    def _aes_decrypt(key: bytes, data: bytes) -> bytes:
        from hadoopxmlextractor_spark.operators import aes as A

        if len(data) < 32:  # IV + at least one (padding) block
            raise ValueError("AESV2 payload too short")
        return A.cbc_decrypt(key, data[:16], data[16:])

    fn = _aes_decrypt if aes else _rc4
    for num in list(objs):
        if num == enc_num:
            continue
        okey = fkey if v5 else hashlib.md5(
            fkey + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
            + (b"sAlT" if aes else b"")
        ).digest()[: min(len(fkey) + 5, 16)]
        body = objs[num]
        sm = re.search(rb"stream(?:\r\n|\n)", body)
        cut = sm.start() if sm is not None else len(body)
        body = (
            _pdf_map_strings(body[:cut], lambda d, k=okey: fn(k, d))
            + body[cut:]
        )
        objs[num] = _pdf_map_stream(
            body, lambda data, k=okey: fn(k, data), _resolve_len
        )


def _pdf_objects(blob: bytes) -> dict[int, bytes]:
    """Object map of a PDF. Files carrying a ``startxref`` load
    XREF-DRIVEN: classic tables AND the PDF 1.5+ machinery most files
    written in the last 15 years use — /XRef cross-reference streams
    (W-array decode, PNG predictor) with objects packed in /ObjStm
    object streams — so compressed-object files parse instead of
    falling to the marker row, and a PRESENT-but-corrupt xref raises
    (a modern file whose xref machinery is broken cannot be trusted:
    marker row, per the r9 verdict). Files with NO startxref at all
    fall back to the flat ``obj..endobj`` scan — the classic salvage
    path real readers use for legacy/truncated files."""
    if not blob.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    # /Encrypt refusal is scoped to TRAILER dictionaries only (the
    # only place the spec puts it) — a page whose text happens to
    # contain "/Encrypt 12 0 R" must not poison an unencrypted file
    _encrypt_re = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")
    if b"startxref" not in blob:
        tpos = blob.rfind(b"trailer")
        if tpos >= 0 and _encrypt_re.search(blob, tpos):
            # encrypted file: strings/streams are RC4/AES ciphertext —
            # extraction would emit garbage; refuse to the marker row
            raise ValueError("encrypted PDF")
        return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(blob)}
    entries, _trailer = _pdf_xref_chain(blob)
    encrypted = _encrypt_re.search(_trailer) is not None
    objs: dict[int, bytes] = {}
    for num, e in entries.items():
        if e[0] == "n":
            got_num, body = _pdf_object_at(blob, e[1])
            objs[got_num] = body
    if encrypted:
        # empty-user-password standard-handler decrypt (r11); any
        # other handler / a REAL password still refuses to the
        # marker row — extraction must never emit ciphertext
        _pdf_decrypt_objects(blob, objs, _trailer)
    stm_cache: dict[int, dict[int, bytes]] = {}
    for num, e in entries.items():
        if e[0] == "c":
            stm = e[1]
            if stm not in stm_cache:
                if stm not in objs:
                    raise ValueError("ObjStm object missing from xref")
                stm_cache[stm] = _pdf_objstm_objects(objs[stm])
            body = stm_cache[stm].get(num)
            if body is None:
                raise ValueError("object missing from its ObjStm")
            objs[num] = body
    return objs


def _pdf_stream_data(body: bytes) -> bytes:
    """Stream payload of one object body, inflated if the dict names
    /FlateDecode. A DIRECT /Length is authoritative (ISO 32000 §7.3.8
    — mandatory, and the only safe bound: compressed data may end in
    bytes that look like the EOL before ``endstream``, so the keyword
    heuristic can eat real stream bytes); only an indirect-reference
    /Length falls back to the endstream-keyword heuristic."""
    head, _, rest = body.partition(b"stream")
    if rest.startswith(b"\r\n"):
        rest = rest[2:]
    elif rest.startswith(b"\n"):
        rest = rest[1:]
    indirect = re.search(rb"/Length\s+\d+\s+\d+\s+R", head)
    m = None if indirect else re.search(rb"/Length\s+(\d+)", head)
    if m is not None:
        data = rest[: int(m.group(1))]
    else:
        end = rest.rfind(b"endstream")
        data = rest[:end]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
    if b"/FlateDecode" in head:
        data = _bounded_inflate(data, zlib.MAX_WBITS)
    return data


def _pdf_literal(s: str, pos: int) -> tuple[str, int]:
    """Decode one PDF literal string starting at the '(' — backslash
    escapes, 1-3 digit octal codes, and BALANCED unescaped parens
    (legal inside literals per §7.3.4.2). Returns (text, index past
    the closing paren)."""
    out = []
    depth = 1
    i = pos + 1
    while i < len(s):
        c = s[i]
        if c == "\\":
            m = _OCT_RE.match(s, i)
            if m:
                out.append(chr(int(m.group(1), 8)))
                i = m.end()
                continue
            nxt = s[i + 1] if i + 1 < len(s) else ""
            out.append(_PDF_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if c == "(":
            depth += 1
            out.append(c)
        elif c == ")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    raise ValueError("unterminated PDF string")


def _pdf_cmap(stream: bytes) -> dict[int, str]:
    """code → text map of a /ToUnicode CMap (§9.10.3) — how every
    non-trivial real PDF encodes text: ``bfchar`` pairs plus BOTH
    ``bfrange`` forms (consecutive destination, and the array form
    mapping each code to its own destination). Destination hex decodes
    as UTF-16BE (possibly multi-code-unit, e.g. ligature
    expansions)."""
    s = stream.decode("latin-1")

    def _dst(hx: str) -> str:
        return bytes.fromhex(hx).decode("utf-16-be")

    out: dict[int, str] = {}
    for m in re.finditer(r"beginbfchar(.*?)endbfchar", s, re.S):
        hx = re.findall(r"<([0-9A-Fa-f]+)>", m.group(1))
        for src, dst in zip(hx[0::2], hx[1::2]):
            out[int(src, 16)] = _dst(dst)
    for m in re.finditer(r"beginbfrange(.*?)endbfrange", s, re.S):
        for e in re.finditer(
            r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            r"(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            m.group(1),
            re.S,
        ):
            lo, hi = int(e.group(1), 16), int(e.group(2), 16)
            dst = e.group(3)
            if dst.startswith("["):
                vals = re.findall(r"<([0-9A-Fa-f]+)>", dst)
                if len(vals) < hi - lo + 1:
                    raise ValueError("short bfrange array")
                for k in range(hi - lo + 1):
                    out[lo + k] = _dst(vals[k])
            else:
                base = bytes.fromhex(dst[1:-1])
                basev = int.from_bytes(base, "big")
                for k in range(hi - lo + 1):
                    out[lo + k] = (basev + k).to_bytes(
                        len(base), "big"
                    ).decode("utf-16-be")
    return out


# --- simple-font encodings (r11; verdict item 2) --------------------------
# WinAnsiEncoding ≈ cp1252 with the undefined slots as notdef;
# MacRomanEncoding = Mac OS Roman except 0xDB, which Adobe's table
# (pre-Euro) keeps as /currency. These are the majority non-CID
# real-PDF text path: fonts without a /ToUnicode CMap that name a
# base encoding and/or remap codes via an /Encoding /Differences
# array (ISO 32000 §9.6.6).

_WINANSI_UNDEF = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _winansi_map() -> dict[int, str]:
    return {
        b: ("�" if b in _WINANSI_UNDEF else bytes([b]).decode("cp1252"))
        for b in range(256)
    }


def _macroman_map() -> dict[int, str]:
    m = {b: bytes([b]).decode("mac_roman") for b in range(256)}
    m[0xDB] = "¤"  # Adobe MacRomanEncoding: /currency, not the Euro
    return m


# Adobe Glyph List subset: the names WinAnsi/MacRoman sets (and real
# /Differences arrays) actually use. Letters/digits resolve
# programmatically; /uniXXXX resolves by code point.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê", "edieresis": "ë",
    "aacute": "á", "agrave": "à", "acircumflex": "â", "adieresis": "ä",
    "aring": "å", "atilde": "ã", "ccedilla": "ç", "ntilde": "ñ",
    "iacute": "í", "igrave": "ì", "icircumflex": "î", "idieresis": "ï",
    "oacute": "ó", "ograve": "ò", "ocircumflex": "ô", "odieresis": "ö",
    "otilde": "õ", "oslash": "ø", "uacute": "ú", "ugrave": "ù",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "ydieresis": "ÿ", "germandbls": "ß", "ae": "æ", "oe": "œ",
    "AE": "Æ", "OE": "Œ", "Eacute": "É", "Agrave": "À",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "Ccedilla": "Ç", "Ntilde": "Ñ", "Aring": "Å", "Oslash": "Ø",
    "euro": "€", "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "emdash": "—", "endash": "–", "ellipsis": "…", "trademark": "™",
    "copyright": "©", "registered": "®", "degree": "°",
    "plusminus": "±", "sterling": "£", "yen": "¥", "cent": "¢",
    "currency": "¤", "section": "§", "paragraph": "¶",
    "questiondown": "¿", "exclamdown": "¡", "florin": "ƒ",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "guillemotleft": "«", "guillemotright": "»", "guilsinglleft": "‹",
    "guilsinglright": "›", "perthousand": "‰", "fraction": "⁄",
    "circumflex": "ˆ", "tilde": "˜", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "Ydieresis": "Ÿ", "mu": "µ",
    "multiply": "×", "divide": "÷", "logicalnot": "¬", "macron": "¯",
    "brokenbar": "¦", "middot": "·", "periodcentered": "·",
    "nbspace": " ", "dotlessi": "ı", "fi": "ﬁ", "fl": "ﬂ",
}


def _glyph_char(name: str) -> str:
    """Unicode text of one glyph name: single-character names are
    themselves (letters, digits-as-chars), ``uniXXXX`` decodes by code
    point, the AGL subset covers the Latin repertoire; unknown names
    show as the viewer's notdef."""
    if len(name) == 1:
        return name
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return "�"
    return "�"


def _base_encoding_map(name: bytes) -> dict[int, str] | None:
    if name == b"WinAnsiEncoding":
        return _winansi_map()
    if name == b"MacRomanEncoding":
        return _macroman_map()
    return None


def _pdf_differences(edict: bytes, base: dict[int, str]) -> dict[int, str]:
    """Base map updated by an /Encoding dict's /Differences array
    (§9.6.6.1: an integer sets the next code, each following name
    takes successive codes)."""
    m = re.search(rb"/Differences\s*\[(.*?)\]", edict, re.S)
    if m is None:
        return base
    bmap = dict(base)
    code = 0
    for tok in re.finditer(rb"/([^\s/\[\]<>()]+)|(\d+)", m.group(1)):
        if tok.group(2) is not None:
            code = int(tok.group(2))
        else:
            if not 0 <= code <= 255:
                raise ValueError("Differences code out of byte range")
            bmap[code] = _glyph_char(tok.group(1).decode("latin-1"))
            code += 1
    return bmap


def _pdf_font_encoding(
    objs: dict[int, bytes], fobj: bytes
) -> tuple[str, dict[int, str]] | None:
    """('simple', byte→char map) for a font whose /Encoding is a base
    encoding name or a dict (inline or indirect) with /BaseEncoding +
    /Differences — the majority non-CID real-PDF text path. None when
    the font has no simple encoding (no /Encoding, or a CMap name like
    /Identity-H): callers keep latin-1 passthrough."""
    m = re.search(rb"/Encoding\s*(?:/([\w-]+)|(\d+)\s+0\s+R|(<<))", fobj)
    if m is None:
        return None
    if m.group(1):
        base = _base_encoding_map(m.group(1))
        return None if base is None else ("simple", base)
    if m.group(2):
        edict = objs.get(int(m.group(2)))
        if edict is None:
            raise ValueError("dangling /Encoding reference")
    else:
        edict = _pdf_dict_span(fobj, m.start())
    bm = re.search(rb"/BaseEncoding\s*/([\w-]+)", edict)
    base = _base_encoding_map(bm.group(1)) if bm else None
    if base is None:
        # no (or unknown) base: the font's built-in encoding — the
        # latin-1 passthrough this extractor always used
        base = {b: chr(b) for b in range(256)}
    return ("simple", _pdf_differences(edict, base))


def _content_text(
    stream: bytes, fonts: dict[str, dict[int, str] | None] | None = None
) -> str:
    """Shown text of one content stream: string literals emitted by
    Tj / ' / TJ in operator order. TJ's inter-string numbers are
    kerning adjustments, not glyphs — concatenated pieces join with
    nothing, exactly as a viewer lays them. ``fonts`` maps resource
    names to a /ToUnicode CMap (or None for simple fonts); under a
    CMap-carrying font — selected by the Tf operator — string bytes
    are 2-byte CIDs mapped through the CMap (unmapped codes show as
    U+FFFD, the viewer's notdef), otherwise latin-1 passthrough."""
    s = stream.decode("latin-1")
    out: list[str] = []
    pending: list[str] = []
    cmap: dict[int, str] | None = None
    last_name = ""
    i = 0

    def _shown(raw: bytes) -> str:
        if cmap is None:
            return raw.decode("latin-1")
        if isinstance(cmap, tuple):  # ('simple', byte→char map) (r11)
            bmap = cmap[1]
            return "".join(bmap.get(b, "�") for b in raw)
        if len(raw) % 2:
            raise ValueError("odd-length CID string")
        return "".join(
            cmap.get(int.from_bytes(raw[k : k + 2], "big"), "�")
            for k in range(0, len(raw), 2)
        )

    while i < len(s):
        c = s[i]
        if c == "(":
            lit, i = _pdf_literal(s, i)
            pending.append(_shown(lit.encode("latin-1")))
            continue
        if c == "<" and not s.startswith("<<", i):
            # hex string (§7.3.4.3): whitespace-tolerant, odd digit
            # count padded with a trailing 0
            j = s.index(">", i)
            hexs = re.sub(r"\s", "", s[i + 1 : j])
            if len(hexs) % 2:
                hexs += "0"
            pending.append(_shown(bytes.fromhex(hexs)))
            i = j + 1
            continue
        if s.startswith("<<", i):
            i += 2
            continue
        if c == "/":
            m = re.match(r"/(\w+)", s[i:])
            if m:
                last_name = m.group(1)
                i += m.end()
                continue
        if s.startswith("Tf", i):
            cmap = (fonts or {}).get(last_name)
            i += 2
            continue
        if s.startswith("Tj", i) or s.startswith("'", i):
            out.extend(pending)
            pending = []
            i += 2 if s.startswith("Tj", i) else 1
            continue
        if s.startswith("TJ", i):
            out.extend(pending)
            pending = []
            i += 2
            continue
        i += 1
    return "".join(out)


def _pdf_page_fonts(
    objs: dict[int, bytes], page: bytes
) -> dict[str, dict[int, str] | None]:
    """Font resources of one page: name → /ToUnicode CMap for CID
    fonts, ('simple', byte map) for fonts declaring a base encoding
    and/or /Differences (r11), None for fonts with neither (latin-1
    passthrough)."""
    fm = re.search(rb"/Font\s*<<(.*?)>>", page, re.S)
    fonts: dict[str, dict[int, str] | tuple | None] = {}
    if fm is None:
        return fonts
    for name, num in re.findall(rb"/(\w+)\s+(\d+)\s+0\s+R", fm.group(1)):
        fobj = objs.get(int(num))
        if fobj is None:
            raise ValueError("dangling font reference")
        tm = re.search(_REF_RE_T % b"ToUnicode", fobj)
        fonts[name.decode("latin-1")] = (
            _pdf_font_encoding(objs, fobj)
            if tm is None
            else _pdf_cmap(_pdf_stream_data(objs[int(tm.group(1))]))
        )
    return fonts


def _pdf_page_leaves(objs: dict, node: int, depth: int = 0) -> list[int]:
    """Leaf /Page object numbers under a page-tree node, in /Kids
    order — real PDFs NEST intermediate /Pages nodes (both container
    PDFs found in the r14 real-fixture sweep do), so the walk
    descends until a node has no /Kids."""
    if depth > 32:
        raise ValueError("PDF page tree too deep")
    if node not in objs:
        raise ValueError("page-tree kid missing")
    body = objs[node]
    kids_m = _KIDS_RE.search(body)
    if kids_m is None:
        return [node]
    out: list[int] = []
    for x in re.findall(rb"(\d+)\s+0\s+R", kids_m.group(1)):
        out += _pdf_page_leaves(objs, int(x), depth + 1)
    return out


def _pdf_extract(blob: bytes) -> tuple[int, str]:
    """(page count, text) of a PDF: catalog -> recursive /Pages tree
    -> per-page /Contents (single ref or ARRAY of refs, both real
    forms) -> content-stream text operators, with the page's
    /Resources /Font map resolved so CID-keyed text under a
    /ToUnicode CMap (the way every non-trivial real PDF encodes
    text) decodes to Unicode. A page without /Contents is an EMPTY
    page (legal), not a refusal. Pages join with newlines.
    Encrypted PDFs refuse."""
    objs = _pdf_objects(blob)
    catalog = next(
        (b for b in objs.values() if b"/Type" in b and b"/Catalog" in b), None
    )
    if catalog is None:
        raise ValueError("no /Catalog")
    m = re.search(_REF_RE_T % b"Pages", catalog)
    if m is None:
        raise ValueError("no /Pages")
    pages = _pdf_page_leaves(objs, int(m.group(1)))
    texts = []
    for pnum in pages:
        body = objs[pnum]
        cm = re.search(_REF_RE_T % b"Contents", body)
        if cm is not None:
            streams = [int(cm.group(1))]
        else:
            am = re.search(
                rb"/Contents\s*\[(.*?)\]", body, re.S
            )
            streams = ([int(x) for x in re.findall(
                rb"(\d+)\s+0\s+R", am.group(1)
            )] if am else [])
        fonts = _pdf_page_fonts(objs, body)
        texts.append("".join(
            _content_text(_pdf_stream_data(objs[sn]), fonts)
            for sn in streams
        ))
    return len(texts), "\n".join(texts)


# ---------------------------------------------------------------------------
# OpenDocument (ODF) — mimetype magic, content.xml text/pages/cells (r11)
# ---------------------------------------------------------------------------

_ODF_PREFIX = b"application/vnd.oasis.opendocument."


def _odf_kind(members: dict[str, bytes]) -> str | None:
    """'text' / 'presentation' / 'spreadsheet' from the ``mimetype``
    member — ODF's magic (the spec requires it stored FIRST and
    uncompressed, but real producers vary, so only the content
    matters here). None for non-ODF zips."""
    mt = members.get("mimetype")
    if mt is None or not mt.startswith(_ODF_PREFIX):
        return None
    return mt[len(_ODF_PREFIX) :].decode("ascii", "replace")


def _odf_para_text(p) -> str:
    """Text of one <text:p>/<text:h>: runs concatenated in document
    order with <text:tab/> as a tab, <text:line-break/> as a newline,
    and <text:s text:c="n"/> as n spaces (default 1) — the ODF
    whitespace elements that literal XML whitespace collapsing eats.
    <text:span> formatting is transparent (same contract as the DOCX
    rPr walk)."""
    parts: list[str] = []

    def walk(el) -> None:
        loc = _local(el.tag)
        if loc == "tab":
            parts.append("\t")
        elif loc == "line-break":
            parts.append("\n")
        elif loc == "s":
            n = next(
                (v for k, v in el.attrib.items() if _local(k) == "c"), "1"
            )
            parts.append(" " * int(n))
        if el.text and loc not in ("tab", "line-break", "s"):
            parts.append(el.text)
        for ch in el:
            walk(ch)
            if ch.tail:
                parts.append(ch.tail)

    if p.text:
        parts.append(p.text)
    for ch in p:
        walk(ch)
        if ch.tail:
            parts.append(ch.tail)
    return "".join(parts)


def _odt_extract(blob: bytes) -> tuple[int, str]:
    """(paragraph count, text) of an ODT: walk <text:p>/<text:h>
    under office:body/office:text in content.xml, paragraphs joined
    with newlines — the same visible-text contract as _docx_extract.
    Reference semantics parity: cites XmlExtractor.java:150-175 only
    for the fragment-walk shape; the ODF layout is public OASIS."""
    members = _zip_open_map(blob)
    if _odf_kind(members) != "text":
        raise ValueError("not an ODT")
    root = ElementTree.fromstring(members["content.xml"])
    paras = [
        _odf_para_text(p)
        for p in root.iter()
        if _local(p.tag) in ("p", "h")
    ]
    return len(paras), "\n".join(paras)


def _odp_extract(blob: bytes) -> list[tuple[int, str]]:
    """(slide index, text) per <draw:page> in document order — the
    ODP twin of _pptx_extract: paragraphs inside each page joined
    with newlines."""
    members = _zip_open_map(blob)
    if _odf_kind(members) != "presentation":
        raise ValueError("not an ODP")
    root = ElementTree.fromstring(members["content.xml"])
    slides = []
    for el in root.iter():
        if _local(el.tag) != "page":
            continue
        texts = [
            _odf_para_text(p)
            for p in el.iter()
            if _local(p.tag) == "p"
        ]
        slides.append((len(slides), "\n".join(texts)))
    if not slides:
        raise ValueError("presentation with no pages")
    return slides


def _col_letters(idx: int) -> str:
    """0-based column index → spreadsheet letters (A..Z, AA..)."""
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(65 + r) + s
    return s


def _ods_extract(blob: bytes) -> list[dict]:
    """Typed cells of every <table:table> in an ODS — the ODF twin of
    _xlsx_extract with the SAME output contract (sheet, 1-based row,
    column letters, kind, raw value token): office:value-type is the
    kind ('string' cells take their <text:p> content, valued kinds
    take the office:value/office:date-value/… attribute verbatim — no
    float parse), table:number-columns-repeated/-rows-repeated expand
    for NON-EMPTY cells and merely advance the cursor for empty ones
    (real sheets pad with million-wide empty repeats)."""
    members = _zip_open_map(blob)
    if _odf_kind(members) != "spreadsheet":
        raise ValueError("not an ODS")
    root = ElementTree.fromstring(members["content.xml"])
    out = []
    for table in root.iter():
        if _local(table.tag) != "table":
            continue
        sheet = next(
            (v for k, v in table.attrib.items() if _local(k) == "name"), ""
        )
        rnum = 0
        for row in table:
            if _local(row.tag) != "table-row":
                continue
            row_rep = int(next(
                (v for k, v in row.attrib.items()
                 if _local(k) == "number-rows-repeated"), "1"
            ))
            for _ in range(row_rep):
                rnum += 1
                cidx = 0
                for cell in row:
                    if _local(cell.tag) != "table-cell":
                        continue
                    col_rep = int(next(
                        (v for k, v in cell.attrib.items()
                         if _local(k) == "number-columns-repeated"), "1"
                    ))
                    kind = next(
                        (v for k, v in cell.attrib.items()
                         if _local(k) == "value-type"), None
                    )
                    if kind is None:
                        cidx += col_rep  # empty padding: advance only
                        continue
                    if kind == "string":
                        value = "\n".join(
                            _odf_para_text(p)
                            for p in cell
                            if _local(p.tag) == "p"
                        )
                    else:
                        value = next(
                            (v for k, v in cell.attrib.items()
                             if _local(k).endswith("value")), None
                        )
                    for j in range(col_rep):
                        out.append({
                            "sheet": sheet, "row": rnum,
                            "col": _col_letters(cidx + j),
                            "kind": kind, "value": value,
                        })
                    cidx += col_rep
    if not out:
        raise ValueError("spreadsheet with no cells")
    return out


def _odf_metadata(blob: bytes) -> dict:
    """Document metadata of any ODF package (meta.xml): kind from the
    mimetype member, Dublin-Core title/creator/date plus the
    meta:document-statistic counts (word/page) — the office twin of
    the PDF /Info and EPUB OPF metadata walks. Packages without
    meta.xml report NULL fields (kind still resolves)."""
    members = _zip_open_map(blob)
    kind = _odf_kind(members)
    if kind is None:
        raise ValueError("not an ODF package")
    out = {"kind": kind, "title": None, "creator": None, "date": None,
           "word_count": None, "page_count": None}
    meta = members.get("meta.xml")
    if meta is None:
        return out
    root = ElementTree.fromstring(meta)
    for el in root.iter():
        loc = _local(el.tag)
        if loc == "title":
            out["title"] = el.text
        elif loc == "creator":
            out["creator"] = el.text
        elif loc == "date":
            out["date"] = el.text
        elif loc == "document-statistic":
            for k, v in el.attrib.items():
                if _local(k) == "word-count":
                    out["word_count"] = int(v)
                elif _local(k) == "page-count":
                    out["page_count"] = int(v)
    return out


def odf_metadata(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One metadata row per ODF package in one Arrow pass; malformed
    packages yield the kind-NULL marker row."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "title", "creator", "date",
                "word_count", "page_count"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    rows.append(
                        {"doc_id": did, **_odf_metadata(bytes(blob))}
                    )
                except (ValueError, IndexError, KeyError, struct.error,
                        zlib.error, ElementTree.ParseError, TypeError):
                    rows.append({
                        "doc_id": did, "kind": None, "title": None,
                        "creator": None, "date": None,
                        "word_count": None, "page_count": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _meta,
        schema="doc_id bigint, kind string, title string, "
        "creator string, date string, word_count int, page_count int",
    )


def ods_cells(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One row per ODS cell in one Arrow pass — the ODF leg beside
    :func:`xlsx_cells`, same schema and marker contract."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "sheet", "row", "col", "kind", "value"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    for c in _ods_extract(bytes(blob)):
                        rows.append({"doc_id": did, **c})
                except (ValueError, IndexError, KeyError, struct.error,
                        zlib.error, ElementTree.ParseError, TypeError):
                    rows.append({
                        "doc_id": did, "sheet": None, "row": -1,
                        "col": None, "kind": None, "value": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _cells,
        schema="doc_id bigint, sheet string, row int, col string, "
        "kind string, value string",
    )


# ---------------------------------------------------------------------------
# Unified document-text operator (magic-byte dispatch, marker contract)
# ---------------------------------------------------------------------------


def document_text(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, format, n_units, text) in ONE Arrow pass: ZIP blobs
    route to DOCX (word/document.xml present), EPUB (container.xml),
    or ODF (mimetype member — ODT paragraphs / ODP draw:pages, r11),
    %PDF blobs to the PDF walk — the total-routing twin of
    ``audio_container_meta``. n_units = paragraphs / spine chapters /
    pages / slides. Unrecognized or malformed blobs yield the
    format-NULL marker row, never an error."""

    def _route_zip(b: bytes):
        names = {e["name"] for e in zip_member_list(b)}
        if "word/document.xml" in names:
            n, text = _docx_extract(b)
            return "docx", n, text
        if "ppt/presentation.xml" in names:
            slides = _pptx_extract(b)
            return "pptx", len(slides), "\n".join(t for _, t in slides)
        if "META-INF/container.xml" in names:
            n, text = _epub_extract(b)
            return "epub", n, text
        if "mimetype" in names:
            kind = _odf_kind(_zip_open_map(b))
            if kind == "text":
                n, text = _odt_extract(b)
                return "odt", n, text
            if kind == "presentation":
                slides = _odp_extract(b)
                return "odp", len(slides), "\n".join(
                    t for _, t in slides
                )
        return None, None, None

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "format", "n_units", "text"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                fmt = n = text = None
                if blob is not None:
                    b = bytes(blob)
                    try:
                        if b.startswith(b"%PDF-"):
                            fmt, (n, text) = "pdf", _pdf_extract(b)
                        elif b.startswith(b"{\\rtf"):
                            fmt, (n, text) = "rtf", rtf_to_text(b)
                        elif b.startswith(_CFB_MAGIC):
                            names = [
                                m["name"] for m in cfb_members(b)
                            ]
                            if "EncryptedPackage" in names:
                                # ECMA-376 encryption container: the
                                # modern password-protected form —
                                # silent default password, then the
                                # ordinary zip routing (r13)
                                fmt, n, text = _route_zip(
                                    ooxml_decrypt(b)
                                )
                            else:
                                kind = cfb_kind(names)
                                if kind == "doc":
                                    fmt, (n, text) = (
                                        "doc", doc_extract_text(b)
                                    )
                                elif kind == "ppt":
                                    fmt, (n, text) = (
                                        "ppt", ppt_extract_text(b)
                                    )
                                else:  # xls/unknown: not text
                                    raise ValueError(
                                        "unrouted compound file"
                                    )
                        elif b.startswith(_LOC_SIG):
                            fmt, n, text = _route_zip(b)
                    except (ValueError, IndexError, KeyError, struct.error,
                            zlib.error, ElementTree.ParseError):
                        fmt = n = text = None
                rows.append(
                    {"doc_id": did, "format": fmt, "n_units": n, "text": text}
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _extract,
        schema="doc_id bigint, format string, n_units int, text string",
    )


def archive_members(
    docs: DataFrame, content_col: str = "content", id_col: str = "archive_id"
) -> DataFrame:
    """One row per ZIP member in one Arrow pass: name, method, the
    central directory's uncompressed size, CRC verification over the
    ACTUALLY-inflated bytes (a flipped bit refuses the member, not the
    archive), and the first 16 decoded characters as proof the inflate
    really ran. Malformed archives yield the member_idx -1 marker."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["archive_id", "member_idx", "name", "method",
                "uncomp_bytes", "crc_ok", "head"]
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    entries = zip_member_list(bytes(blob))
                    for k, e in enumerate(entries):
                        try:
                            data = zip_read_member(bytes(blob), e)
                            ok = True
                            head = data[:16].decode("utf-8", "replace")
                        except ValueError:
                            ok, head = False, None
                        rows.append({
                            "archive_id": aid, "member_idx": k,
                            "name": e["name"],
                            "method": "stored" if e["method"] == 0
                            else "deflate" if e["method"] == 8
                            else f"method{e['method']}",
                            "uncomp_bytes": e["usize"], "crc_ok": ok,
                            "head": head,
                        })
                except (ValueError, IndexError, struct.error, TypeError):
                    rows.append({
                        "archive_id": aid, "member_idx": -1, "name": None,
                        "method": None, "uncomp_bytes": None,
                        "crc_ok": None, "head": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _walk,
        schema="archive_id bigint, member_idx int, name string, "
        "method string, uncomp_bytes bigint, crc_ok boolean, head string",
    )


def xlsx_cells(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One row per spreadsheet cell in one Arrow pass: sheet name (in
    WORKBOOK order, resolved through the rels — never zip layout),
    1-based row, column letters, cell kind (s / n / str / inlineStr),
    and the resolved value (shared strings looked up, numbers kept as
    their raw token — no float parse). Malformed workbooks yield the
    row -1 marker."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "sheet", "row", "col", "kind", "value"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    for c in _xlsx_extract(bytes(blob)):
                        rows.append({"doc_id": did, **c})
                except (ValueError, IndexError, KeyError, struct.error,
                        zlib.error, ElementTree.ParseError, TypeError):
                    rows.append({
                        "doc_id": did, "sheet": None, "row": -1,
                        "col": None, "kind": None, "value": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _cells,
        schema="doc_id bigint, sheet string, row int, col string, "
        "kind string, value string",
    )


# ---------------------------------------------------------------------------
# Subtitles — SRT + WebVTT cue tables
# ---------------------------------------------------------------------------

_TS_RE = re.compile(
    r"(?:(\d{1,2}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})"
)
_CUE_LINE_RE = re.compile(
    r"^\s*(?:(\d{1,2}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})(?:\s+(.*))?$"
)
_VTT_TAG_RE = re.compile(r"</?[^>]+>")


def _ts_ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _parse_ass_cues(text: str) -> list[tuple[int, int, str]]:
    """Cues of an ASS/SSA script (r11 — the third real subtitle
    family): the [Events] section's Format line maps field order,
    Dialogue lines carry H:MM:SS.cc CENTISECOND timestamps, the Text
    field keeps embedded commas, ``{\\...}`` override blocks strip,
    ``\\N``/``\\n`` are line breaks and ``\\h`` a hard space.
    Comment: lines are skipped."""
    fields: list[str] | None = None
    cues = []
    in_events = False
    for line in text.replace("\r\n", "\n").split("\n"):
        s = line.strip()
        if s.startswith("["):
            in_events = s.lower() == "[events]"
            continue
        if not in_events or not s:
            continue
        key, _, rest = s.partition(":")
        key = key.strip().lower()
        if key == "format":
            fields = [f.strip().lower() for f in rest.split(",")]
            continue
        if key == "comment":
            continue
        if key != "dialogue":
            continue
        if fields is None:
            raise ValueError("ASS Dialogue before Format")
        vals = rest.split(",", len(fields) - 1)  # Text keeps commas
        if len(vals) < len(fields):
            raise ValueError("short ASS Dialogue line")
        row = {f: v for f, v in zip(fields, vals)}

        def cs_ms(ts: str) -> int:
            m = re.match(r"\s*(\d+):(\d\d):(\d\d)\.(\d\d)\s*$", ts)
            if m is None:
                raise ValueError(f"bad ASS timestamp {ts!r}")
            h, mi, se, cc = (int(g) for g in m.groups())
            return ((h * 60 + mi) * 60 + se) * 1000 + cc * 10

        body = row["text"].strip()
        body = re.sub(r"\{[^}]*\}", "", body)  # override blocks
        body = body.replace("\\N", "\n").replace("\\n", "\n")
        body = body.replace("\\h", " ")
        cues.append((cs_ms(row["start"]), cs_ms(row["end"]), body))
    if not cues:
        raise ValueError("ASS script with no Dialogue events")
    return cues


def _parse_cues(text: str) -> tuple[str, list[tuple[int, int, str]]]:
    """(kind, [(start_ms, end_ms, text)]) of an SRT, WebVTT, or
    ASS/SSA payload. WebVTT: the WEBVTT signature line, NOTE/STYLE
    blocks skipped, optional cue identifiers, optional hours field,
    cue settings after the arrow ignored, <i>/<b>/<c>-style inline
    tags stripped. SRT: numeric index lines, comma millisecond
    separator. ASS: [Events] Format-driven Dialogue lines (r11)."""
    if "[Script Info]" in text[:256] or text.lstrip().startswith(
        "[Script Info]"
    ):
        return "ass", _parse_ass_cues(text)
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    is_vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    kind = "vtt" if is_vtt else "srt"
    cues = []
    i = 1 if is_vtt else 0
    while i < len(lines):
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        if is_vtt and (line.startswith("NOTE") or line.startswith("STYLE")):
            while i < len(lines) and lines[i].strip():
                i += 1
            continue
        m = _CUE_LINE_RE.match(line)
        if m is None:
            # cue identifier (VTT) or numeric index (SRT): the NEXT
            # line must be the timestamp line
            i += 1
            if i >= len(lines):
                break
            m = _CUE_LINE_RE.match(lines[i])
            if m is None:
                raise ValueError(f"bad cue header near line {i}")
        start = _ts_ms(m.group(1), m.group(2), m.group(3), m.group(4))
        end = _ts_ms(m.group(5), m.group(6), m.group(7), m.group(8))
        i += 1
        body: list[str] = []
        while i < len(lines) and lines[i].strip():
            body.append(lines[i])
            i += 1
        cue_text = "\n".join(body)
        if is_vtt:
            cue_text = _VTT_TAG_RE.sub("", cue_text)
        cues.append((start, end, cue_text))
    return kind, cues


def subtitle_cues(
    docs: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """One row per subtitle cue in one Arrow pass: format kind,
    cue index, start/end in integer milliseconds, tag-stripped text.
    Malformed payloads yield the cue_idx -1 marker row."""

    def _cues(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "cue_idx", "kind", "start_ms", "end_ms", "text"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    kind, cues = _parse_cues(str(payload))
                    if not cues:
                        raise ValueError("no cues")
                    for k, (s, e, t) in enumerate(cues):
                        rows.append({
                            "media_id": mid, "cue_idx": k, "kind": kind,
                            "start_ms": s, "end_ms": e, "text": t,
                        })
                except (ValueError, AttributeError):
                    rows.append({
                        "media_id": mid, "cue_idx": -1, "kind": None,
                        "start_ms": None, "end_ms": None, "text": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _cues,
        schema="media_id bigint, cue_idx int, kind string, "
        "start_ms bigint, end_ms bigint, text string",
    )


# ---------------------------------------------------------------------------
# RSS / Atom feeds
# ---------------------------------------------------------------------------

_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_RFC822_RE = re.compile(
    r"(?:\w{3},\s*)?(\d{1,2})\s+(\w{3})\s+(\d{4})\s+"
    r"(\d{2}):(\d{2}):(\d{2})\s+(?:GMT|UT|UTC|\+0000)"
)
_ISO_RE = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.\d+)?Z"
)


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 (Howard Hinnant's algorithm) — locale-free
    and libm-free, so the oracle can replay the same integers."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _epoch_from_civil(y, mo, d, h, mi, s) -> int:
    return _days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s


def _parse_feed_date(s: str) -> int | None:
    """Epoch seconds of an RFC 822 (RSS) or ISO 8601 Zulu (Atom)
    timestamp — manual parse: strptime's %b is locale-dependent."""
    m = _RFC822_RE.search(s)
    if m:
        return _epoch_from_civil(
            int(m.group(3)), _MONTHS.index(m.group(2)) + 1, int(m.group(1)),
            int(m.group(4)), int(m.group(5)), int(m.group(6)),
        )
    m = _ISO_RE.search(s)
    if m:
        return _epoch_from_civil(*(int(m.group(k)) for k in range(1, 7)))
    return None


def _rfc822(epoch: int) -> str:
    days, rem = divmod(epoch, 86400)
    h, rem = divmod(rem, 3600)
    mi, s = divmod(rem, 60)
    # civil date from days (inverse of _days_from_civil)
    z = days + 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    mo = mp + (3 if mp < 10 else -9)
    y += mo <= 2
    dow = (days + 4) % 7  # 1970-01-01 is a Thursday
    return (
        f"{_DAYS[(dow + 6) % 7]}, {d:02d} {_MONTHS[mo - 1]} {y} "
        f"{h:02d}:{mi:02d}:{s:02d} GMT"
    )


def _iso8601(epoch: int) -> str:
    rfc = _rfc822(epoch)  # reuse the civil conversion
    m = re.match(r"\w{3}, (\d{2}) (\w{3}) (\d{4}) (\d{2}):(\d{2}):(\d{2})", rfc)
    assert m is not None
    return (
        f"{m.group(3)}-{_MONTHS.index(m.group(2)) + 1:02d}-{m.group(1)}"
        f"T{m.group(4)}:{m.group(5)}:{m.group(6)}Z"
    )


def _feed_extract(data: bytes) -> list[dict]:
    """Entries of an RSS 2.0 or Atom feed: localname walk (Atom lives
    in its namespace, RSS usually none), title/link/timestamp/summary
    per entry. RSS <link> is element text; Atom <link> is @href."""
    root = ElementTree.fromstring(data)
    loc = _local(root.tag)
    out = []
    if loc == "rss":
        for item in (el for el in root.iter() if _local(el.tag) == "item"):
            row = {"title": None, "url": None, "published_s": None,
                   "summary": None}
            for ch in item:
                c = _local(ch.tag)
                if c == "title":
                    row["title"] = ch.text
                elif c == "link":
                    row["url"] = ch.text
                elif c == "pubDate":
                    row["published_s"] = _parse_feed_date(ch.text or "")
                elif c == "description":
                    row["summary"] = ch.text
            out.append(row)
    elif loc == "feed":
        for entry in (el for el in root.iter() if _local(el.tag) == "entry"):
            row = {"title": None, "url": None, "published_s": None,
                   "summary": None}
            for ch in entry:
                c = _local(ch.tag)
                if c == "title":
                    row["title"] = ch.text
                elif c == "link":
                    row["url"] = ch.get("href")
                elif c == "updated":
                    row["published_s"] = _parse_feed_date(ch.text or "")
                elif c == "summary":
                    row["summary"] = ch.text
            out.append(row)
    else:
        raise ValueError(f"not a feed root: {loc}")
    if not out:
        raise ValueError("feed with no entries")
    return out


def feed_entries(
    docs: DataFrame, content_col: str = "content", id_col: str = "feed_id"
) -> DataFrame:
    """One row per feed entry in one Arrow pass: feed kind (rss/atom),
    entry index in document order, title, url, published epoch
    MILLISECONDS (RFC 822 and ISO 8601 both normalized through the
    same integer civil-date arithmetic), summary. Malformed feeds
    yield the entry_idx -1 marker row."""

    def _entries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["feed_id", "entry_idx", "kind", "title", "url",
                "published_ms", "summary"]
        for pdf in batches:
            rows = []
            for fid, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    data = bytes(payload) if not isinstance(
                        payload, str
                    ) else payload.encode("utf-8")
                    kind = "rss" if b"<rss" in data[:256] else "atom"
                    for k, e in enumerate(_feed_extract(data)):
                        rows.append({
                            "feed_id": fid, "entry_idx": k, "kind": kind,
                            "title": e["title"], "url": e["url"],
                            "published_ms": None if e["published_s"] is None
                            else e["published_s"] * 1000,
                            "summary": e["summary"],
                        })
                except (ValueError, ElementTree.ParseError, TypeError):
                    rows.append({
                        "feed_id": fid, "entry_idx": -1, "kind": None,
                        "title": None, "url": None, "published_ms": None,
                        "summary": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _entries,
        schema="feed_id bigint, entry_idx int, kind string, title string, "
        "url string, published_ms bigint, summary string",
    )


# ---------------------------------------------------------------------------
# Deterministic synthesizers (md5 parameter chain — oracle-replayable)
# ---------------------------------------------------------------------------

_WORDS = ("alpha", "bravo", "charlie", "delta", "echo")


def _synth_docx_blob(i: int) -> bytes:
    """One deterministic DOCX from md5(doc:docx): 1+b0%3 paragraphs,
    paragraph p text WORDS[(b1+p)%5] + ' ' + p; paragraph 0 gains a
    tabbed second run when b2%2 (the w:tab element, not a literal
    character); one run wrapped in bold rPr the walk must ignore."""
    import hashlib

    b = hashlib.md5(f"{i}:docx".encode()).digest()
    n_para = 1 + b[0] % 3
    paras = []
    for p in range(n_para):
        runs = (
            f"<w:r><w:rPr><w:b/></w:rPr>"
            f"<w:t xml:space=\"preserve\">{_WORDS[(b[1] + p) % 5]} </w:t>"
            f"</w:r><w:r><w:t>{p}</w:t></w:r>"
        )
        if p == 0 and b[2] % 2 == 1:
            runs += "<w:r><w:tab/><w:t>tabbed</w:t></w:r>"
        paras.append(f"<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>{runs}</w:p>")
    document = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
        "wordprocessingml/2006/main\"><w:body>"
        + "".join(paras)
        + "<w:sectPr/></w:body></w:document>"
    )
    ct = (
        "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas."
        "openxmlformats.org/package/2006/content-types\">"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    )
    return build_zip([
        ("[Content_Types].xml", ct.encode(), 8, False),
        ("word/document.xml", document.encode(), 8, b[3] % 2 == 1),
    ])


def synth_docx(docs: DataFrame) -> DataFrame:
    """Deterministic DOCX per document (see :func:`_synth_docx_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_docx_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def _synth_epub_blob(i: int) -> bytes:
    """One deterministic EPUB from md5(doc:epub): 1+b1%3 chapters,
    chapter k body text WORDS[(b3+k)%5] + ' chapter ' + k; spine order
    REVERSED when b2%2 (reading order must follow the spine, not the
    zip layout); OPF directory rotates OEBPS/ vs bare; nav.xhtml in
    the manifest but NOT the spine must never be emitted."""
    import hashlib

    b = hashlib.md5(f"{i}:epub".encode()).digest()
    opf_dir = "OEBPS" if b[0] % 2 == 0 else ""
    prefix = f"{opf_dir}/" if opf_dir else ""
    n_ch = 1 + b[1] % 3
    order = list(range(n_ch))
    if b[2] % 2 == 1:
        order = order[::-1]
    container = (
        "<?xml version=\"1.0\"?><container version=\"1.0\" xmlns=\"urn:"
        "oasis:names:tc:opendocument:xmlns:container\"><rootfiles>"
        f"<rootfile full-path=\"{prefix}content.opf\" media-type="
        "\"application/oebps-package+xml\"/></rootfiles></container>"
    )
    items = "".join(
        f"<item id=\"c{k}\" href=\"ch{k}.xhtml\" "
        "media-type=\"application/xhtml+xml\"/>"
        for k in range(n_ch)
    ) + ("<item id=\"nav\" href=\"nav.xhtml\" properties=\"nav\" "
         "media-type=\"application/xhtml+xml\"/>")
    spine = "".join(f"<itemref idref=\"c{k}\"/>" for k in order)
    opf = (
        "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/2007"
        "/opf\" version=\"3.0\" unique-identifier=\"u\"><metadata/>"
        f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
    )
    members = [
        ("mimetype", b"application/epub+zip", 0, False),
        ("META-INF/container.xml", container.encode(), 8, False),
        (f"{prefix}content.opf", opf.encode(), 8, False),
        (
            f"{prefix}nav.xhtml",
            b"<html xmlns=\"http://www.w3.org/1999/xhtml\"><body>"
            b"<nav>DECOY table of contents</nav></body></html>",
            8, False,
        ),
    ]
    for k in range(n_ch):
        body = (
            "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head>"
            "<title>dropped head</title></head><body>"
            f"<p>{_WORDS[(b[3] + k) % 5]} chapter {k}</p></body></html>"
        )
        members.append((f"{prefix}ch{k}.xhtml", body.encode(), 8, False))
    return build_zip(members)


def synth_epub(docs: DataFrame) -> DataFrame:
    """Deterministic EPUB per document (see :func:`_synth_epub_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_epub_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def _pdf_page_stream(
    i: int, b: bytes, p: int
) -> tuple[bytes, str, str | None]:
    """(content-stream bytes, expected shown text, font kind) of synth
    page p; font kind is None / 'cid' / 'winansi' / 'diffs'. Rotations
    keep every tokenizer branch live: Tj vs TJ-with-kerning, escaped
    parens, an octal escape, a nested unescaped paren, a
    whitespace-split hex string, (r10) a CID-font page whose hex
    string is 2-byte codes the page's /ToUnicode CMap must map back
    to text, and (r11) the simple-font encodings — WinAnsi high bytes
    and a /Differences remap over MacRomanEncoding."""
    w1 = _WORDS[(b[2] + p) % 5]
    variant = (b[4] + p) % 8
    font = None
    if variant == 0:
        shown = f"{w1} page {p}"
        ops = f"({w1} ) Tj (page {p}) Tj"
    elif variant == 1:
        shown = f"{w1} (page) {p}"
        ops = f"[({w1} ) -120 (\\(page\\) ) 40 ({p})] TJ"
    elif variant == 2:
        shown = f"{w1} A{p}"  # \101 is octal 'A'
        ops = f"({w1} ) Tj (\\101{p}) Tj"
    elif variant == 3:
        # one literal containing BALANCED unescaped parens (§7.3.4.2)
        shown = f"{w1} (nested) {p}"
        ops = f"({w1} (nested) {p}) Tj"
    elif variant == 4:
        # hex string with interior whitespace (§7.3.4.3)
        shown = f"{w1} hex {p}"
        hx = shown.encode("latin-1").hex()
        ops = f"<{hx[:8]} {hx[8:]}> Tj"
    elif variant == 5:
        # CID hex string: char j encodes as code 0x0100+j, mapped by
        # the page's CMap (split with interior whitespace)
        shown = f"{w1} cid {p}"
        font = "cid"
        hx = "".join(f"{0x0100 + j:04x}" for j in range(len(shown)))
        ops = f"<{hx[:12]} {hx[12:]}> Tj"
    elif variant == 6:
        # WinAnsiEncoding: byte 0x92 is U+2019 — a latin-1
        # passthrough would emit a C1 control, so only the declared
        # base encoding produces the right apostrophe (r11)
        shown = f"{w1} don’t {p}"
        font = "winansi"
        ops = f"({w1} don\x92t {p}) Tj"
    else:
        # /Differences over MacRomanEncoding: 'A' (0x41) remapped to
        # /eacute, 0xE9 remapped to /bullet, while 0x87 stays the
        # BASE MacRoman aacute — both the remap and the base must
        # resolve (r11)
        shown = f"{w1} é•á {p}"
        font = "diffs"
        ops = f"({w1} A\xe9\x87 {p}) Tj"
    stream = f"BT /F1 12 Tf 72 720 Td {ops} ET"
    return stream.encode("latin-1"), shown, font


def _pdf_cmap_stream(shown: str) -> bytes:
    """A /ToUnicode CMap mapping code 0x0100+j → shown[j], written
    with BOTH a bfchar (first char) and an array-form bfrange (the
    rest) so each decode branch is live per fixture."""
    def u16(c: str) -> str:
        return c.encode("utf-16-be").hex()

    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
        "1 beginbfchar",
        f"<0100> <{u16(shown[0])}>",
        "endbfchar",
    ]
    if len(shown) > 1:
        dsts = " ".join(f"<{u16(c)}>" for c in shown[1:])
        lines += [
            "1 beginbfrange",
            f"<0101> <{0x0100 + len(shown) - 1:04x}> [{dsts}]",
            "endbfrange",
        ]
    lines += ["endcmap", "end", "end"]
    return "\n".join(lines).encode("latin-1")


def _synth_pdf_blob(i: int) -> bytes:
    """One deterministic PDF from md5(doc:pdf): 1+b0%3 pages, page p's
    content stream FlateDecode-compressed when (b1+p)%2, text-operator
    variant (b4+p)%8 (see :func:`_pdf_page_stream` — incl. the
    hex-string, CID/ToUnicode-CMap, and r11 simple-font-encoding
    arms). The FILE STRUCTURE
    rotates on b3%2 (r10): a classic xref table (free entries for the
    unused numbers), or the PDF 1.5+ layout — non-stream objects
    packed into a FlateDecode /ObjStm and a /Type /XRef
    cross-reference STREAM (W [1 2 1], PNG Up predictor /Predictor 12
    /Columns 4) — so both container generations stay live under the
    same text oracle."""
    import hashlib

    b = hashlib.md5(f"{i}:pdf".encode()).digest()
    n_pages = 1 + b[0] % 3
    objs: dict[int, bytes] = {}
    stream_nums: set[int] = set()
    kids = []
    for p in range(n_pages):
        page_num = 3 + 2 * p
        content_num = 4 + 2 * p
        kids.append(f"{page_num} 0 R")
        stream, shown, font = _pdf_page_stream(i, b, p)
        if (b[1] + p) % 2 == 1:
            data = zlib.compress(stream)
            sdict = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            data = stream
            sdict = f"<< /Length {len(data)} >>"
        res = ""
        if font == "cid":
            font_num, cmap_num = 20 + 2 * p, 21 + 2 * p
            cstream = _pdf_cmap_stream(shown)
            objs[font_num] = (
                f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
                f"/Encoding /Identity-H /ToUnicode {cmap_num} 0 R >>"
                .encode()
            )
            objs[cmap_num] = (
                f"<< /Length {len(cstream)} >>".encode()
                + b"\nstream\n" + cstream + b"\nendstream"
            )
            stream_nums.add(cmap_num)
            res = f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
        elif font == "winansi":
            # simple font, base-encoding NAME form (r11)
            font_num = 20 + 2 * p
            objs[font_num] = (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>"
            )
            res = f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
        elif font == "diffs":
            # simple font, INDIRECT /Encoding dict with /BaseEncoding
            # + /Differences (r11): 'A' → /eacute, 233 → /bullet
            font_num, enc_num = 20 + 2 * p, 21 + 2 * p
            objs[font_num] = (
                f"<< /Type /Font /Subtype /Type1 /BaseFont "
                f"/Times-Roman /Encoding {enc_num} 0 R >>".encode()
            )
            objs[enc_num] = (
                b"<< /Type /Encoding /BaseEncoding /MacRomanEncoding "
                b"/Differences [ 65 /eacute 233 /bullet ] >>"
            )
            res = f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            f"{res} /Contents {content_num} 0 R >>".encode()
        )
        objs[content_num] = (
            sdict.encode() + b"\nstream\n" + data + b"\nendstream"
        )
        stream_nums.add(content_num)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {n_pages} >>"
        .encode()
    )
    if b[3] % 2 == 0:
        # classic layout: flat objects + xref TABLE + trailer
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
        xref_off = len(out)
        n_obj = max(objs) + 1
        out += f"xref\n0 {n_obj}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, n_obj):
            if num in offsets:
                out += f"{offsets[num]:010d} 00000 n \n".encode()
            else:
                out += b"0000000000 65535 f \n"
        out += (
            f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\nstartxref\n"
            f"{xref_off}\n%%EOF\n".encode()
        )
        return bytes(out)
    # modern layout: dict objects packed in an ObjStm, xref STREAM
    objstm_num, xref_num = 30, 31
    packed = sorted(n for n in objs if n not in stream_nums)
    bodies = [objs[n] for n in packed]
    offs, acc = [], 0
    for bb in bodies:
        offs.append(acc)
        acc += len(bb) + 1
    header = " ".join(
        f"{n} {o}" for n, o in zip(packed, offs)
    ).encode() + b"\n"
    payload = header + b"\n".join(bodies)
    cdata = zlib.compress(payload)
    objs[objstm_num] = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(cdata)} >>".encode()
        + b"\nstream\n" + cdata + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(stream_nums) + [objstm_num]:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    size = xref_num + 1
    raw = bytearray()
    for num in range(size):
        if num in offsets:
            t, f2, f3 = 1, offsets[num], 0
        elif num in packed:
            t, f2, f3 = 2, objstm_num, packed.index(num)
        elif num == xref_num:
            t, f2, f3 = 1, xref_off, 0
        else:
            t, f2, f3 = 0, 0, 255 if num == 0 else 0
        raw += bytes([t]) + f2.to_bytes(2, "big") + bytes([f3])
    pred = bytearray()
    prev = bytes(4)
    for k in range(0, len(raw), 4):
        row = raw[k : k + 4]
        pred += b"\x02" + bytes((row[j] - prev[j]) & 0xFF for j in range(4))
        prev = row
    cxref = zlib.compress(bytes(pred))
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /Root 1 0 R "
        f"/W [1 2 1] /Index [0 {size}] /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 4 >> "
        f"/Length {len(cxref)} >>".encode()
        + b"\nstream\n" + cxref + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def synth_pdf(docs: DataFrame) -> DataFrame:
    """Deterministic PDF per document (see :func:`_synth_pdf_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_pdf_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def _synth_zip_blob(i: int) -> bytes:
    """One deterministic ZIP from md5(doc:zip): 1+b0%4 members, member
    k named STEM[(b1+k)%5]_{k}EXT[(b2+k)%3], payload 'name repeated-
    rows' text, deflate when (b4+k)%2, data descriptor when (b5+k)%3==0,
    EOCD comment (forcing the backward scan) when b6%2."""
    import hashlib

    b = hashlib.md5(f"{i}:zip".encode()).digest()
    stems = ("notes", "readme", "data", "img", "logs")
    exts = (".txt", ".csv", ".md")
    members = []
    for k in range(1 + b[0] % 4):
        name = f"{stems[(b[1] + k) % 5]}_{k}{exts[(b[2] + k) % 3]}"
        payload = (name + " " + f"row {k} " * (3 + (b[3] + k) % 5)).encode()
        method = 8 if (b[4] + k) % 2 == 1 else 0
        desc = (b[5] + k) % 3 == 0
        members.append((name, payload, method, desc))
    comment = b"synthetic archive" if b[6] % 2 == 1 else b""
    return build_zip(members, comment=comment)


def synth_zip_archives(docs: DataFrame) -> DataFrame:
    """Deterministic ZIP per document (see :func:`_synth_zip_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_zip_blob(int(i)) for i in ids])

    return docs.select(
        F.col("doc_id").alias("archive_id"), _blob("doc_id").alias("content")
    )


def _synth_subtitle_text(
    i: int,
    *,
    salt: str = "subs",
    gap_base: int = 3000,
    gap_step: int = 500,
    off_mod: int = 1000,
    dur_base: int = 800,
    dur_step: int = 250,
) -> str:
    """One deterministic SRT (even doc) / WebVTT (odd doc) payload
    from md5(doc:salt): 1+b0%4 cues on a (gap_base+gap_step·(b1%10))·c
    + b2%off_mod ms grid with dur_base+dur_step·((b3+c)%12) ms
    durations; VTT rotates <i> inline tags (stripped), MM:SS short
    timestamps, cue ids, settings after the arrow, and a NOTE block;
    SRT rotates two-line cues. The grid parameters let the alignment
    capstone synthesize cues on a video-length timeline while the
    default query keeps its certified constants."""
    import hashlib

    b = hashlib.md5(f"{i}:{salt}".encode()).digest()
    n_cues = 1 + b[0] % 4
    gap = gap_base + gap_step * (b[1] % 10)
    off = b[2] % off_mod
    is_vtt = i % 2 == 1
    lines = []
    if is_vtt:
        lines.append("WEBVTT")
        lines.append("")
        if b[6] % 2 == 1:
            lines += ["NOTE synthetic fixture", ""]
    for c in range(n_cues):
        start = gap * c + off
        end = start + dur_base + dur_step * ((b[3] + c) % 12)
        word = _WORDS[(b[4] + c) % 5]

        def _fmt(ms: int, short: bool) -> str:
            h, rem = divmod(ms, 3600000)
            m, rem = divmod(rem, 60000)
            s, milli = divmod(rem, 1000)
            sep = "." if is_vtt else ","
            if short and h == 0:
                return f"{m:02d}:{s:02d}{sep}{milli:03d}"
            return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"

        if is_vtt:
            short = (b[5] + c) % 2 == 1
            if (b[7] + c) % 2 == 1:
                lines.append(f"cue-{c}")
            settings = " align:start" if (b[8] + c) % 2 == 1 else ""
            lines.append(f"{_fmt(start, short)} --> {_fmt(end, short)}"
                         f"{settings}")
            if (b[5] + c) % 3 == 0:
                lines.append(f"<i>{word}</i> cue {c}")
            else:
                lines.append(f"{word} cue {c}")
        else:
            lines.append(str(c + 1))
            lines.append(f"{_fmt(start, False)} --> {_fmt(end, False)}")
            lines.append(f"{word} cue {c}")
            if (b[5] + c) % 2 == 1:
                lines.append(f"line two {c}")
        lines.append("")
    return "\n".join(lines)


def synth_subtitles(docs: DataFrame) -> DataFrame:
    """Deterministic subtitle payload per document (see
    :func:`_synth_subtitle_text`)."""

    @F.pandas_udf("string")
    def _payload(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_subtitle_text(int(i)) for i in ids])

    return docs.select(
        F.col("doc_id").alias("media_id"), _payload("doc_id").alias("content")
    )


def _synth_feed_blob(i: int) -> bytes:
    """One deterministic RSS 2.0 (even doc) / Atom (odd doc) feed from
    md5(doc:feed): 1+b0%4 entries, entry e titled WORDS[(b1+e)%5] +
    ' post ' + e at https://ex.org/{doc}/{e}, published at epoch
    1700000000 + 86400·b2 + 3600·e + 7·b3 seconds (RFC 822 for RSS,
    ISO 8601 Zulu for Atom — both round-trip the same integer);
    RSS descriptions rotate CDATA wrapping."""
    import hashlib

    b = hashlib.md5(f"{i}:feed".encode()).digest()
    n = 1 + b[0] % 4
    rows = []
    for e in range(n):
        epoch = 1700000000 + 86400 * b[2] + 3600 * e + 7 * b[3]
        rows.append((
            f"{_WORDS[(b[1] + e) % 5]} post {e}",
            f"https://ex.org/{i}/{e}",
            epoch,
            f"summary {_WORDS[(b[4] + e) % 5]} {e}",
            (b[5] + e) % 2 == 1,
        ))
    if i % 2 == 0:
        items = "".join(
            "<item>"
            f"<title>{t}</title><link>{u}</link>"
            f"<pubDate>{_rfc822(ep)}</pubDate>"
            + (f"<description><![CDATA[{s}]]></description>" if cdata
               else f"<description>{s}</description>")
            + "</item>"
            for t, u, ep, s, cdata in rows
        )
        xml = (
            "<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>"
            "<title>synthetic feed</title><link>https://ex.org/</link>"
            f"<description>fixture</description>{items}</channel></rss>"
        )
    else:
        entries = "".join(
            "<entry>"
            f"<title>{t}</title><link href=\"{u}\" rel=\"alternate\"/>"
            f"<updated>{_iso8601(ep)}</updated><summary>{s}</summary>"
            "</entry>"
            for t, u, ep, s, _ in rows
        )
        xml = (
            "<?xml version=\"1.0\"?><feed xmlns=\"http://www.w3.org/2005"
            "/Atom\"><title>synthetic feed</title><updated>"
            f"{_iso8601(rows[0][2])}</updated>{entries}</feed>"
        )
    return xml.encode("utf-8")


def synth_feeds(docs: DataFrame) -> DataFrame:
    """Deterministic feed XML per document (see
    :func:`_synth_feed_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_feed_blob(int(i)) for i in ids])

    return docs.select(
        F.col("doc_id").alias("feed_id"), _blob("doc_id").alias("content")
    )


_RELS_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _rels_xml(pairs: list[tuple[str, str]]) -> bytes:
    rels = "".join(
        f"<Relationship Id=\"{rid}\" Type=\"{_RELS_NS}/x\" "
        f"Target=\"{tgt}\"/>"
        for rid, tgt in pairs
    )
    return (
        "<?xml version=\"1.0\"?><Relationships xmlns=\"http://schemas."
        f"openxmlformats.org/package/2006/relationships\">{rels}"
        "</Relationships>"
    ).encode()


def _synth_xlsx_blob(i: int) -> bytes:
    """One deterministic XLSX from md5(doc:xlsx): 1+b0%2 sheets named
    S0[,S1] in workbook order; with two sheets, b5%2 SWAPS which
    physical worksheet member each name resolves to through the rels
    (content derives from the PHYSICAL index, so the oracle's
    name->content join proves rels resolution, not member naming).
    Physical sheet p has 1+(b1+p)%3 rows; row r0 carries a
    shared-string cell A (sst lookup), a raw-token number cell B, and
    a C cell rotating inlineStr vs cached-formula str on
    (b4+r0+p)%2."""
    import hashlib

    b = hashlib.md5(f"{i}:xlsx".encode()).digest()
    n_sheets = 1 + b[0] % 2
    swap = b[5] % 2 if n_sheets == 2 else 0
    sst: list[str] = []

    def _sst_idx(s: str) -> int:
        if s not in sst:
            sst.append(s)
        return sst.index(s)

    sheet_xmls = []
    for p in range(n_sheets):
        n_rows = 1 + (b[1] + p) % 3
        rows_xml = []
        for r0 in range(n_rows):
            r = r0 + 1
            a_val = _WORDS[(b[2] + p + r0) % 5]
            b_val = (b[3] + 17 * r0 + p) % 1000
            cells = (
                f"<c r=\"A{r}\" t=\"s\"><v>{_sst_idx(a_val)}</v></c>"
                f"<c r=\"B{r}\"><v>{b_val}</v></c>"
            )
            if (b[4] + r0 + p) % 2 == 1:
                cells += (
                    f"<c r=\"C{r}\" t=\"inlineStr\"><is><t>inline "
                    f"{_WORDS[(b[2] + r0) % 5]}</t></is></c>"
                )
            else:
                cells += (
                    f"<c r=\"C{r}\" t=\"str\"><f>CONCAT()</f>"
                    f"<v>calc {r0}</v></c>"
                )
            rows_xml.append(f"<row r=\"{r}\">{cells}</row>")
        sheet_xmls.append(
            "<?xml version=\"1.0\"?><worksheet xmlns=\"http://schemas."
            "openxmlformats.org/spreadsheetml/2006/main\"><sheetData>"
            + "".join(rows_xml) + "</sheetData></worksheet>"
        )
    sheets_decl = "".join(
        f"<sheet name=\"S{s}\" sheetId=\"{s + 1}\" r:id=\"rId{s + 1}\"/>"
        for s in range(n_sheets)
    )
    workbook = (
        "<?xml version=\"1.0\"?><workbook xmlns=\"http://schemas."
        "openxmlformats.org/spreadsheetml/2006/main\" xmlns:r=\""
        + _RELS_NS + f"\"><sheets>{sheets_decl}</sheets></workbook>"
    )
    # logical sheet s resolves to physical member (s + swap) % n_sheets
    rels = _rels_xml([
        (f"rId{s + 1}",
         f"worksheets/sheet{(s + swap) % n_sheets + 1}.xml")
        for s in range(n_sheets)
    ] + [("rIdS", "sharedStrings.xml")])
    sst_xml = (
        "<?xml version=\"1.0\"?><sst xmlns=\"http://schemas.openxmlformats"
        ".org/spreadsheetml/2006/main\">"
        + "".join(f"<si><t>{s}</t></si>" for s in sst)
        + "</sst>"
    )
    members = [
        ("[Content_Types].xml", b"<Types/>", 8, False),
        ("xl/workbook.xml", workbook.encode(), 8, False),
        ("xl/_rels/workbook.xml.rels", rels, 8, False),
        ("xl/sharedStrings.xml", sst_xml.encode(), 8, False),
    ]
    for p, xml in enumerate(sheet_xmls):
        members.append(
            (f"xl/worksheets/sheet{p + 1}.xml", xml.encode(), 8, False)
        )
    return build_zip(members)


def synth_xlsx(docs: DataFrame) -> DataFrame:
    """Deterministic XLSX per document (see :func:`_synth_xlsx_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_xlsx_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def _synth_pptx_blob(i: int) -> bytes:
    """One deterministic PPTX from md5(doc:pptx): 1+b0%3 slides whose
    sldIdLst order REVERSES the physical member numbering when b1%2
    (presentation order comes from the rels walk, never the member
    names); physical slide m shows a title run plus one or two body
    paragraphs rotating on (b3+m)%2."""
    import hashlib

    b = hashlib.md5(f"{i}:pptx".encode()).digest()
    n = 1 + b[0] % 3
    order = list(range(n))
    if b[1] % 2 == 1:
        order = order[::-1]
    a_ns = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p_ns = "http://schemas.openxmlformats.org/presentationml/2006/main"
    slide_xmls = []
    for m in range(n):
        paras = [
            f"<a:p><a:r><a:rPr b=\"1\"/><a:t>{_WORDS[(b[2] + m) % 5]}"
            f" slide {m}</a:t></a:r></a:p>",
            f"<a:p><a:r><a:t>point one {m}</a:t></a:r></a:p>",
        ]
        if (b[3] + m) % 2 == 1:
            paras.append(
                f"<a:p><a:r><a:t>point two {m}</a:t></a:r></a:p>"
            )
        slide_xmls.append((
            f"<?xml version=\"1.0\"?><p:sld xmlns:p=\"{p_ns}\" "
            f"xmlns:a=\"{a_ns}\"><p:cSld><p:spTree><p:sp><p:txBody>"
            + "".join(paras)
            + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
        ).encode())
    sld_ids = "".join(
        f"<p:sldId id=\"{256 + k}\" r:id=\"rId{m + 1}\"/>"
        for k, m in enumerate(order)
    )
    pres = (
        f"<?xml version=\"1.0\"?><p:presentation xmlns:p=\"{p_ns}\" "
        f"xmlns:r=\"{_RELS_NS}\"><p:sldIdLst>{sld_ids}</p:sldIdLst>"
        "</p:presentation>"
    )
    rels = _rels_xml([
        (f"rId{m + 1}", f"slides/slide{m + 1}.xml") for m in range(n)
    ])
    members = [
        ("[Content_Types].xml", b"<Types/>", 8, False),
        ("ppt/presentation.xml", pres.encode(), 8, False),
        ("ppt/_rels/presentation.xml.rels", rels, 8, False),
    ]
    for m, xml in enumerate(slide_xmls):
        members.append((f"ppt/slides/slide{m + 1}.xml", xml, 8, False))
    return build_zip(members)


def synth_pptx(docs: DataFrame) -> DataFrame:
    """Deterministic PPTX per document (see :func:`_synth_pptx_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_pptx_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def synth_text_document(fmt: str, units: list[str], flate: bool) -> bytes:
    """A minimal PDF / DOCX / EPUB carrying EXACTLY the given unit
    texts (one page / paragraph / chapter each) — the cross-format
    fixture builder behind ``pipeline_documents_to_corpus``: the same
    units through any of the three containers must extract to the
    identical newline-joined text. Unit strings must be literal-safe
    (no XML/PDF metacharacters)."""
    if fmt == "pdf":
        objs: dict[int, bytes] = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
        }
        kids = []
        for p, unit in enumerate(units):
            page_num, content_num = 3 + 2 * p, 4 + 2 * p
            kids.append(f"{page_num} 0 R")
            stream = f"BT /F1 12 Tf 72 720 Td ({unit}) Tj ET".encode()
            if flate:
                data = zlib.compress(stream)
                sdict = f"<< /Length {len(data)} /Filter /FlateDecode >>"
            else:
                data, sdict = stream, f"<< /Length {len(stream)} >>"
            objs[page_num] = (
                f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R "
                f">>".encode()
            )
            objs[content_num] = (
                sdict.encode() + b"\nstream\n" + data + b"\nendstream"
            )
        objs[2] = (
            f"<< /Type /Pages /Kids [{' '.join(kids)}] "
            f"/Count {len(units)} >>".encode()
        )
        out = bytearray(b"%PDF-1.4\n")
        for num in sorted(objs):
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
        out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        return bytes(out)
    if fmt == "docx":
        paras = "".join(
            f"<w:p><w:r><w:t xml:space=\"preserve\">{u}</w:t></w:r></w:p>"
            for u in units
        )
        doc = (
            "<?xml version=\"1.0\"?><w:document xmlns:w=\"http://schemas."
            "openxmlformats.org/wordprocessingml/2006/main\">"
            f"<w:body>{paras}</w:body></w:document>"
        )
        return build_zip([("word/document.xml", doc.encode(), 8, False)])
    if fmt == "epub":
        container = (
            "<?xml version=\"1.0\"?><container version=\"1.0\" xmlns=\"urn:"
            "oasis:names:tc:opendocument:xmlns:container\"><rootfiles>"
            "<rootfile full-path=\"content.opf\" media-type=\"application/"
            "oebps-package+xml\"/></rootfiles></container>"
        )
        items = "".join(
            f"<item id=\"c{k}\" href=\"ch{k}.xhtml\" media-type="
            "\"application/xhtml+xml\"/>"
            for k in range(len(units))
        )
        spine = "".join(
            f"<itemref idref=\"c{k}\"/>" for k in range(len(units))
        )
        opf = (
            "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/"
            "2007/opf\" version=\"3.0\"><metadata/>"
            f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
        )
        members = [
            ("META-INF/container.xml", container.encode(), 8, False),
            ("content.opf", opf.encode(), 8, False),
        ]
        for k, u in enumerate(units):
            ch = (
                "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head>"
                f"<title>x</title></head><body><p>{u}</p></body></html>"
            )
            members.append((f"ch{k}.xhtml", ch.encode(), 8, False))
        return build_zip(members)
    raise ValueError(f"unknown format {fmt!r}")


def stream_documents(spark, path: str) -> DataFrame:
    """CONTINUOUS document ingest: the streaming twin of
    :func:`document_text` — new PDF/DOCX/PPTX/EPUB blobs landing in
    ``path`` become (doc_id, format, n_units, text) rows exactly once
    (binaryFile file-source offsets track absorbed files; a crash
    replays only the unacknowledged batch). doc_id comes from the
    numeric file stem, the landing-dir convention shared with
    stream_warc. Extraction is the SAME stateless Arrow kernel as the
    batch operator, so streamed output equals the batch run over the
    union of all landed files row-for-row (E2E-asserted)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.\w+$", 1)
            .cast("bigint")
            .alias("doc_id"),
            "content",
        )
    )
    return document_text(files)


# ---------------------------------------------------------------------------
# TAR (ustar) — 512-byte header walk, checksum verify, GNU long names
# ---------------------------------------------------------------------------


def _tar_octal(field: bytes) -> int:
    s = field.split(b"\0")[0].strip()
    return int(s, 8) if s else 0


def _tar_checksum(header: bytes) -> tuple[int, int]:
    """(unsigned, signed) header checksums with the chksum field read
    as eight spaces. POSIX specifies the unsigned byte sum, but old
    HP-UX/V7 tars summed SIGNED chars — both must be accepted
    (CPython's testtar.tar carries both variants; r14 sweep find)."""
    body = header[:148] + b" " * 8 + header[156:512]
    unsigned = sum(body)
    signed = sum(b - 256 if b >= 0x80 else b for b in body)
    return unsigned, signed


def _bounded_unxz(raw: bytes, cap: int = _MAX_INFLATE) -> bytes:
    """xz decompress with the same hard output bound and truncation
    refusal as the zlib/bz2 walks."""
    import lzma

    d = lzma.LZMADecompressor()
    out: list[bytes] = []
    total = 0
    piece = d.decompress(raw, 1 << 20)
    while True:
        if piece:
            out.append(piece)
            total += len(piece)
            if total > cap:
                raise ValueError("inflated output exceeds bound")
        if d.eof:
            break
        if d.needs_input:
            raise ValueError("truncated xz stream")
        piece = d.decompress(b"", 1 << 20)
    return b"".join(out)


def _tar_pax_records(data: bytes) -> dict[str, str]:
    """Key→value records of a PAX extended header payload: each
    record is ``<len> <key>=<value>\\n`` where <len> counts the WHOLE
    record including its own digits and the newline (POSIX.1-2001)."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0 or not data[pos:sp].isdigit():
            raise ValueError("bad PAX record length")
        rlen = int(data[pos:sp])
        rec = data[pos : pos + rlen]
        if rlen <= 0 or not rec.endswith(b"\n"):
            raise ValueError("bad PAX record framing")
        k, _, v = rec[sp - pos + 1 : -1].partition(b"=")
        # values are UTF-8 per POSIX, but hdrcharset=BINARY (and
        # broken writers) carry raw locale bytes — latin-1 fallback,
        # the same repair as header names (r14 sweep find)
        out[k.decode("utf-8")] = _tar_name(v)
        pos += rlen
    return out


def _tar_size(field: bytes) -> int:
    """Size field: octal, or GNU base-256 (high bit of byte 0 set —
    how >8 GiB members encode) big-endian binary."""
    if field and field[0] & 0x80:
        return int.from_bytes(field, "big") - (0x80 << (8 * (len(field) - 1)))
    return _tar_octal(field)


def _tar_name(raw: bytes) -> str:
    """ustar/GNU header names carry LOCALE bytes with no declared
    encoding (POSIX leaves it open; only PAX 'path' records are
    UTF-8 by spec) — decode UTF-8 first, fall back to latin-1, the
    behavior stdlib tarfile effectively exhibits. Found via
    CPython's own testtar.tar (latin-1 umlaut member names) in the
    r14 real-fixture sweep."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def tar_members(blob: bytes) -> list[dict]:
    """(name, typeflag, size, head) per entry of a tar — gzip, bz2,
    and xz wrappers all transparent through the bounded decompression
    walks (r10: .tar.bz2/.tar.xz are how source-code corpora actually
    ship): the 512-byte ustar header walk with the POSIX checksum
    VERIFIED per header (a flipped byte refuses the entry stream),
    data runs of ceil(size/512) blocks, GNU 'L' long-name entries
    applied to the following header, PAX 'x' per-file and 'g' global
    extended headers (r11 — the DEFAULT format modern tars write:
    path/size overrides are authoritative, the records themselves are
    never member rows), GNU base-256 size fields (>8 GiB members),
    and the two-zero-block terminator honored."""
    if blob[:2] == b"\x1f\x8b":
        blob = _bounded_inflate(blob, 31)
    elif blob[:3] == b"BZh":
        blob = _bz2_decompress_streams(blob)
    elif blob[:6] == b"\xfd7zXZ\x00":
        blob = _bounded_unxz(blob)
    out = []
    pos = 0
    pending_name = None
    pax_next: dict[str, str] = {}
    pax_global: dict[str, str] = {}
    while pos + 512 <= len(blob):
        header = blob[pos : pos + 512]
        if header == b"\0" * 512:
            break
        stored = _tar_octal(header[148:156])
        if stored not in _tar_checksum(header):
            raise ValueError("tar header checksum mismatch")
        size = _tar_size(header[124:136])
        typeflag = chr(header[156]) if header[156] else "0"
        eff = {**pax_global, **pax_next}
        if typeflag not in ("x", "g", "L") and "size" in eff:
            size = int(eff["size"])  # PAX size is authoritative
        if typeflag in ("1", "2", "3", "4", "5", "6"):
            # links, devices, fifos, and DIRECTORIES store no data
            # blocks regardless of the size field (the classic
            # dirtype-with-size trap; r14 sweep find) — the size is
            # metadata only
            data = b""
            pos += 512
        elif typeflag == "S":
            # old-GNU sparse: the header SIZE field counts the bytes
            # actually stored, the logical size sits in the realsize
            # field (offset 483), and sparse-map continuation blocks
            # sit between header and data while isextended is set
            real = header[483:495]
            ext = header[482]
            dpos = pos + 512
            while ext:
                block = blob[dpos : dpos + 512]
                if len(block) < 512:
                    raise ValueError("tar sparse map past archive end")
                ext = block[504]
                dpos += 512
            data = blob[dpos : dpos + size]
            pos = dpos + ((size + 511) // 512) * 512
            if real.strip(b"\0 "):
                size = _tar_size(real)
        else:
            data = blob[pos + 512 : pos + 512 + size]
            pos += 512 + ((size + 511) // 512) * 512
        if typeflag in ("x", "X"):  # PAX / Solaris extended header
            pax_next = _tar_pax_records(data)
            continue
        if typeflag == "g":  # PAX global: applies until overridden
            pax_global.update(_tar_pax_records(data))
            continue
        if typeflag == "L":  # GNU long name: payload names the NEXT entry
            pending_name = _tar_name(data.rstrip(b"\0"))
            continue
        if typeflag == "K":  # GNU long LINKNAME: metadata, not a member
            continue
        name = (
            eff.get("path")
            or eff.get("GNU.sparse.name")  # PAX-sparse real name
            or pending_name
            or _tar_name(header[:100].split(b"\0")[0])
        )
        # the ustar PREFIX field (bytes 345-500) prepends to the name
        # when set (POSIX long paths without GNU 'L'); GNU magic
        # ('ustar  ') reuses those bytes for other fields
        if (not eff.get("path") and not pending_name
                and header[257:263] == b"ustar\0"):
            prefix = header[345:500].split(b"\0")[0]
            if prefix:
                name = _tar_name(prefix) + "/" + name
        # PAX-sparse logical sizes (0.0/0.1: GNU.sparse.size;
        # 1.0: GNU.sparse.realsize) — reported size, never the skip
        for k_ in ("GNU.sparse.size", "GNU.sparse.realsize"):
            if k_ in eff:
                size = int(eff[k_])
        if typeflag == "0" and name.endswith("/"):
            # pre-POSIX (V7) directories: regtype with a trailing
            # slash IS the directory marker
            typeflag = "5"
        name = name.rstrip("/") if typeflag == "5" else name
        pending_name = None
        pax_next = {}
        out.append({
            "name": name,
            "typeflag": typeflag,
            "size": size,
            "head": (
                data[:16].decode("utf-8", "replace") if data else None
            ),
        })
    if not out:
        raise ValueError("empty tar")
    return out


def archive_tar_members(
    docs: DataFrame, content_col: str = "content", id_col: str = "archive_id"
) -> DataFrame:
    """One row per tar entry in one Arrow pass — the tar twin of
    :func:`archive_members`, transparently gunzipping .tar.gz blobs.
    Malformed archives yield the member_idx -1 marker row."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["archive_id", "member_idx", "name", "typeflag",
                "uncomp_bytes", "head"]
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    for k, e in enumerate(tar_members(bytes(blob))):
                        rows.append({
                            "archive_id": aid, "member_idx": k,
                            "name": e["name"], "typeflag": e["typeflag"],
                            "uncomp_bytes": e["size"], "head": e["head"],
                        })
                except (ValueError, IndexError, zlib.error, TypeError):
                    rows.append({
                        "archive_id": aid, "member_idx": -1, "name": None,
                        "typeflag": None, "uncomp_bytes": None, "head": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _walk,
        schema="archive_id bigint, member_idx int, name string, "
        "typeflag string, uncomp_bytes bigint, head string",
    )


def build_tar(entries: list[tuple[str, bytes | None, str]]) -> bytes:
    """Write a ustar tar from (name, data, typeflag) tuples — the
    synth partner of :func:`tar_members`. Names over 100 bytes emit a
    GNU 'L' long-name entry first, the convention GNU/BSD tar uses."""

    def _header(name: str, size: int, typeflag: str) -> bytes:
        h = bytearray(512)
        nb = name.encode("utf-8")
        h[0:len(nb)] = nb
        h[100:108] = b"0000644\0"
        h[108:116] = b"0000000\0"
        h[116:124] = b"0000000\0"
        h[124:136] = f"{size:011o}\0".encode()
        h[136:148] = b"00000000000\0"
        h[148:156] = b" " * 8
        h[156] = ord(typeflag)
        h[257:263] = b"ustar\0"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = f"{chk:06o}\0 ".encode()
        return bytes(h)

    out = bytearray()
    for name, data, typeflag in entries:
        data = data or b""
        if len(name.encode()) > 100:
            nb = name.encode("utf-8") + b"\0"
            out += _header("././@LongLink", len(nb), "L")
            out += nb + b"\0" * ((512 - len(nb) % 512) % 512)
            hdr_name = name[:100]
        else:
            hdr_name = name
        out += _header(hdr_name, len(data), typeflag)
        out += data + b"\0" * ((512 - len(data) % 512) % 512)
    out += b"\0" * 1024
    return bytes(out)


def _synth_tar_blob(i: int) -> bytes:
    """One deterministic tar from md5(doc:tar): 1+b0%4 file entries
    under a leading directory entry, member k named
    STEM[(b1+k)%5]_{k}.txt with 'name + repeated rows' payloads;
    entry (b3%  count) gets a >100-char GNU long name (nested dirs);
    the COMPRESSION wrapper rotates i%4: plain / gzip / bz2 / xz
    (r10 — the wrappers source-code corpora actually ship)."""
    import hashlib

    b = hashlib.md5(f"{i}:tar".encode()).digest()
    stems = ("notes", "readme", "data", "img", "logs")
    n = 1 + b[0] % 4
    entries: list[tuple[str, bytes | None, str]] = [("top/", None, "5")]
    long_k = b[3] % n
    for k in range(n):
        name = f"top/{stems[(b[1] + k) % 5]}_{k}.txt"
        if k == long_k:
            name = "top/" + "deep_directory_level/" * 5 + f"leaf_{k}.txt"
        payload = (name.rpartition("/")[2] + " "
                   + f"row {k} " * (3 + (b[2] + k) % 5)).encode()
        entries.append((name, payload, "0"))
    tar = build_tar(entries)
    wrap = int(i) % 4
    if wrap == 1:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        tar = c.compress(tar) + c.flush()
    elif wrap == 2:
        import bz2 as _bz2

        tar = _bz2.compress(tar)
    elif wrap == 3:
        import lzma

        tar = lzma.compress(tar)
    return tar


def synth_tar_archives(docs: DataFrame) -> DataFrame:
    """Deterministic tar/tar.gz per document (see
    :func:`_synth_tar_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_tar_blob(int(i)) for i in ids])

    return docs.select(
        F.col("doc_id").alias("archive_id"), _blob("doc_id").alias("content")
    )


def _messy_frontier_url(i: int, e: int) -> str:
    """The crawl-frontier fixture URL for feed i, entry e: every
    cosmetic variation canonical_url must collapse — uppercase scheme
    and host, the scheme's default port, trailing slash, tracking
    params, fragment — derived from m = i + 7e. Entries m and m+300
    produce the SAME canonical URL (pid = m %% 300 with matching
    scheme/query parity), so cross-feed duplicates occur organically."""
    m = i + 7 * e
    pid = m % 300
    is_https = m % 3 != 0
    scheme = (
        ("HTTPS" if is_https else "HTTP")
        if m % 11 == 0
        else ("https" if is_https else "http")
    )
    host = ("EXAMPLE" if m % 7 == 0 else "example") + str(pid % 4) + ".com"
    port = ((":443" if is_https else ":80") if m % 6 == 0 else "")
    path = f"/page/{pid}" + ("/" if m % 4 == 0 else "")
    if m % 2 == 0:
        q = f"?x={pid % 3}&utm_source=s{m % 9}"
    elif m % 10 == 1:
        q = "?utm_campaign=c"
    else:
        q = ""
    frag = f"#sec{m}" if m % 5 == 0 else ""
    return f"{scheme}://{host}{port}{path}{q}{frag}"


def _synth_frontier_feed_blob(i: int) -> bytes:
    """One deterministic feed (RSS even / Atom odd) from
    md5(doc:feedf) with 1+b0%3 entries whose links are MESSY frontier
    URLs (see :func:`_messy_frontier_url`); '&' in queries is
    XML-escaped, so the parser's charref decoding is on the hook."""
    import hashlib
    from xml.sax.saxutils import escape

    b = hashlib.md5(f"{i}:feedf".encode()).digest()
    n = 1 + b[0] % 3
    rows = [
        (f"entry {e}", _messy_frontier_url(i, e),
         1700000000 + 3600 * e)
        for e in range(n)
    ]
    if i % 2 == 0:
        items = "".join(
            f"<item><title>{t}</title><link>{escape(u)}</link>"
            f"<pubDate>{_rfc822(ep)}</pubDate></item>"
            for t, u, ep in rows
        )
        xml = (
            "<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>"
            "<title>frontier</title><link>https://ex.org/</link>"
            f"<description>f</description>{items}</channel></rss>"
        )
    else:
        entries = "".join(
            f"<entry><title>{t}</title><link href=\"{escape(u)}\"/>"
            f"<updated>{_iso8601(ep)}</updated></entry>"
            for t, u, ep in rows
        )
        xml = (
            "<?xml version=\"1.0\"?><feed xmlns=\"http://www.w3.org/2005"
            f"/Atom\"><title>frontier</title><updated>{_iso8601(rows[0][2])}"
            f"</updated>{entries}</feed>"
        )
    return xml.encode("utf-8")


def synth_frontier_feeds(docs: DataFrame) -> DataFrame:
    """Deterministic messy-URL feed per document (see
    :func:`_synth_frontier_feed_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_frontier_feed_blob(int(i)) for i in ids])

    return docs.select(
        F.col("doc_id").alias("feed_id"), _blob("doc_id").alias("content")
    )


# ---------------------------------------------------------------------------
# LaTeX — arXiv-style source to plain text
# ---------------------------------------------------------------------------

_TEX_ESCAPES = {
    r"\%": "\x00", r"\&": "\x01", r"\_": "\x02", r"\#": "\x03",
    r"\$": "\x04", r"\{": "\x05", r"\}": "\x06",
}
_TEX_DROP_ENVS = r"(?:equation|align|tabular|figure|table|verbatim)"
_TEX_UNWRAP = (
    r"\\(?:section|subsection|subsubsection|paragraph|title|author|"
    r"emph|textbf|textit|texttt|textsc|underline|mbox)\*?\{([^{}]*)\}"
)
_TEX_DROP_ARG = (
    r"\\(?:cite|citep|citet|ref|eqref|label|footnote|url|href|"
    r"usepackage|documentclass|bibliography|bibliographystyle|input|"
    r"include)\*?(?:\[[^\]]*\])?\{[^{}]*\}"
)


def latex_to_text(src: str) -> str:
    """arXiv-style LaTeX source → plain text, the deterministic rule
    subset corpus pipelines run: escaped specials preserved
    (\\% → %), comments stripped, display ($$/\\[ \\]) and inline ($)
    math dropped, math/table/figure/verbatim ENVIRONMENTS dropped
    whole while other \\begin/\\end markers vanish keeping their body,
    reference-like commands (\\cite/\\ref/\\label/\\url/preamble
    declarations) dropped WITH their argument, textual commands
    (\\section/\\emph/\\textbf/...) unwrapped to their argument
    (iterated, so nesting unwraps inside-out), \\item and \\\\ become
    breaks, remaining bare commands (\\alpha, \\LaTeX) dropped, braces
    erased, ~ a space, whitespace canonicalized to single spaces."""
    s = src
    for esc, mark in _TEX_ESCAPES.items():
        s = s.replace(esc, mark)
    s = re.sub(r"%[^\n]*", " ", s)
    s = re.sub(r"\\\[.*?\\\]", " ", s, flags=re.S)
    s = re.sub(r"\$\$.*?\$\$", " ", s, flags=re.S)
    s = re.sub(r"\$[^$]*\$", " ", s)
    s = re.sub(
        r"\\begin\{" + _TEX_DROP_ENVS + r"\*?\}.*?\\end\{"
        + _TEX_DROP_ENVS + r"\*?\}",
        " ", s, flags=re.S,
    )
    s = re.sub(r"\\(?:begin|end)\{[a-zA-Z*]+\}", " ", s)
    s = re.sub(_TEX_DROP_ARG, " ", s)
    prev = None
    while prev != s:
        prev = s
        s = re.sub(_TEX_UNWRAP, r"\1", s)
    s = re.sub(r"\\\\", " ", s)
    s = re.sub(r"\\item\b", " ", s)
    s = re.sub(r"\\[a-zA-Z]+\*?", " ", s)
    s = s.replace("~", " ").replace("{", "").replace("}", "")
    restore = {v: k[1] for k, v in _TEX_ESCAPES.items()}
    s = "".join(restore.get(ch, ch) for ch in s)
    return " ".join(s.split())


def latex_text(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, text, n_tokens) in one Arrow pass over LaTeX source —
    the arXiv leg of corpus text extraction."""

    def _tex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "text", "n_tokens"]
        for pdf in batches:
            rows = []
            for did, src in zip(pdf[id_col], pdf[content_col]):
                try:
                    text = latex_to_text(str(src))
                    rows.append({
                        "doc_id": did, "text": text,
                        "n_tokens": len(text.split()),
                    })
                except (ValueError, TypeError, re.error):
                    rows.append(
                        {"doc_id": did, "text": None, "n_tokens": None}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _tex, schema="doc_id bigint, text string, n_tokens int"
    )


def _synth_latex_source(i: int) -> str:
    """One deterministic LaTeX source from md5(doc:tex), exercising
    every kernel rule: preamble declarations (dropped with args),
    title/section unwrapping, a comment, nested \\emph{\\textbf{}},
    inline + display math, a dropped equation environment, an itemize
    whose markers vanish, escaped specials, ~ ties, \\\\ breaks, a
    \\cite, and a bare \\LaTeX command."""
    import hashlib

    b = hashlib.md5(f"{i}:tex".encode()).digest()
    w = [_WORDS[(b[k] + k) % 5] for k in range(8)]
    sec = 1 + b[8] % 9
    pct = b[9] % 100
    return (
        "\\documentclass[11pt]{article}\n"
        "\\usepackage[utf8]{inputenc}\n"
        f"\\title{{{w[0]} study {i}}}\n"
        "\\begin{document}\n"
        f"intro {w[1]}~{w[2]} % trailing comment {w[3]}\n"
        f"\\section{{part {sec}}}\n"
        f"\\emph{{nested \\textbf{{{w[3]} bold}}}} follows\n"
        f"math $x^{{{sec}}}$ inline and\n"
        "\\begin{equation}\nE = mc^2\n\\end{equation}\n"
        f"then \\[ {w[4]} = 0 \\] display\n"
        "\\begin{itemize}\n"
        f"\\item {w[5]} one\\\\{w[6]} two\n"
        "\\end{itemize}\n"
        f"{pct}\\% of \\&{w[7]} \\cite{{ref{i}}} cited \\LaTeX\n"
        "\\end{document}\n"
    )


def synth_latex(docs: DataFrame) -> DataFrame:
    """Deterministic LaTeX source per document (see
    :func:`_synth_latex_source`)."""

    @F.pandas_udf("string")
    def _src(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_latex_source(int(i)) for i in ids])

    return docs.select("doc_id", _src("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# HTML structured metadata — OpenGraph, canonical link, JSON-LD
# ---------------------------------------------------------------------------


def html_page_metadata(html: str) -> dict:
    """OpenGraph properties, the canonical link, and the first valid
    JSON-LD block of one HTML page — the structured-data triple a
    crawl pipeline extracts next to the visible text. Tolerant of tag
    soup (stdlib HTMLParser), attribute order, and quoting; a
    malformed JSON-LD block is skipped, not fatal."""
    import json as _json
    from html.parser import HTMLParser

    meta = {"og_title": None, "og_description": None, "og_image": None,
            "canonical_href": None, "jsonld_type": None,
            "jsonld_name": None, "jsonld_date": None}

    class _Meta(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.in_ldjson = False
            self.ld_chunks: list[str] = []

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "meta" and a.get("property", "").startswith("og:"):
                key = "og_" + a["property"][3:]
                if key in meta and meta[key] is None:
                    meta[key] = a.get("content")
            elif tag == "link" and a.get("rel") == "canonical":
                if meta["canonical_href"] is None:
                    meta["canonical_href"] = a.get("href")
            elif tag == "script" and a.get("type") == "application/ld+json":
                self.in_ldjson = True
                self.ld_chunks = []

        def handle_data(self, data):
            if self.in_ldjson:
                self.ld_chunks.append(data)

        def handle_endtag(self, tag):
            if tag == "script" and self.in_ldjson:
                self.in_ldjson = False
                if meta["jsonld_type"] is not None:
                    return
                try:
                    obj = _json.loads("".join(self.ld_chunks))
                except ValueError:
                    return
                if isinstance(obj, dict):
                    meta["jsonld_type"] = obj.get("@type")
                    meta["jsonld_name"] = obj.get("name")
                    meta["jsonld_date"] = obj.get("datePublished")

    p = _Meta()
    p.feed(html)
    return meta


def html_metadata(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One structured-metadata row per HTML page in one Arrow pass."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "og_title", "og_description", "og_image",
                "canonical_href", "jsonld_type", "jsonld_name",
                "jsonld_date"]
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[content_col]):
                try:
                    rows.append(
                        {"doc_id": did, **html_page_metadata(str(html))}
                    )
                except Exception:  # noqa: BLE001 — tag soup never kills a job
                    rows.append({"doc_id": did, **{c: None for c in cols[1:]}})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _meta,
        schema="doc_id bigint, og_title string, og_description string, "
        "og_image string, canonical_href string, jsonld_type string, "
        "jsonld_name string, jsonld_date string",
    )


def html_table_cells(html: str) -> list[dict]:
    """(table_idx, row_idx, col_idx, is_header, text) per cell of
    every <table> in an HTML page: th vs td tracked, inline markup
    (<b>, <span>) transparent, charrefs decoded, whitespace collapsed.
    The relational view of web tables a corpus pipeline mines."""
    from html.parser import HTMLParser

    out: list[dict] = []

    class _Tables(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.table = -1
            self.row = -1
            self.col = -1
            self.in_cell = False
            self.is_header = False
            self.chunks: list[str] = []

        def _flush(self) -> None:
            if self.in_cell:
                self.in_cell = False
                out.append({
                    "table_idx": self.table, "row_idx": self.row,
                    "col_idx": self.col, "is_header": self.is_header,
                    "text": " ".join("".join(self.chunks).split()),
                })

        def handle_starttag(self, tag, attrs):
            # real-web soup: a new td/th/tr/table IMPLICITLY closes an
            # open cell (the HTML content model, which tag-soup pages
            # rely on instead of writing </td>)
            if tag == "table":
                self._flush()
                self.table += 1
                self.row = -1
            elif tag == "tr" and self.table >= 0:
                self._flush()
                self.row += 1
                self.col = -1
            elif tag in ("td", "th") and self.row >= 0:
                self._flush()
                self.col += 1
                self.in_cell = True
                self.is_header = tag == "th"
                self.chunks = []

        def handle_data(self, data):
            if self.in_cell:
                self.chunks.append(data)

        def handle_endtag(self, tag):
            if tag in ("td", "th", "tr", "table"):
                self._flush()

    p = _Tables()
    p.feed(html)
    return out


def html_tables(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One row per table cell in one Arrow pass; pages without tables
    yield the table_idx -1 marker row so page accounting stays total."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "table_idx", "row_idx", "col_idx",
                "is_header", "text"]
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[content_col]):
                cells = []
                try:
                    cells = html_table_cells(str(html))
                except Exception:  # noqa: BLE001
                    cells = []
                if not cells:
                    # is_header pinned FALSE, not NULL: a NULL boolean
                    # stringifies differently across the engines
                    # (the canonicalizer trap documented in CLAUDE.md)
                    rows.append({
                        "doc_id": did, "table_idx": -1, "row_idx": None,
                        "col_idx": None, "is_header": False, "text": None,
                    })
                    continue
                for c in cells:
                    rows.append({"doc_id": did, **c})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _cells,
        schema="doc_id bigint, table_idx int, row_idx int, col_idx int, "
        "is_header boolean, text string",
    )


def _synth_metadata_html(i: int) -> str:
    """One deterministic HTML page from md5(doc:hmeta): og:title
    always present (attribute ORDER rotates content-first vs
    property-first), og:description only on b2%2, og:image with a
    charref the parser must decode, a canonical link, and a JSON-LD
    Article block on b3%3!=0 (absent branch live) preceded by a
    MALFORMED decoy block that must be skipped, not fatal."""
    import hashlib

    b = hashlib.md5(f"{i}:hmeta".encode()).digest()
    title = f"{_WORDS[b[1] % 5]} page {i}"
    desc = f"about {_WORDS[(b[2] + 1) % 5]}"
    img = f"https://img.ex.org/{i}?a=1&amp;b=2"
    canon = f"https://ex.org/page/{i % 300}"
    head = []
    if b[0] % 2 == 0:
        head.append(f'<meta property="og:title" content="{title}">')
    else:
        head.append(f'<meta content="{title}" property="og:title">')
    if b[2] % 2 == 1:
        head.append(f'<meta property="og:description" content="{desc}">')
    head.append(f'<meta property="og:image" content="{img}">')
    head.append(f'<link rel="canonical" href="{canon}">')
    if b[3] % 3 != 0:
        head.append(
            '<script type="application/ld+json">{broken json!}</script>'
        )
        date = f"20{10 + b[4] % 15:02d}-{1 + b[5] % 12:02d}-01"
        head.append(
            '<script type="application/ld+json">'
            '{"@context": "https://schema.org", "@type": "Article", '
            f'"name": "{title}", "datePublished": "{date}"}}'
            "</script>"
        )
    return (
        "<html><head><title>ignored</title>" + "".join(head)
        + f"</head><body><p>body {i}</p></body></html>"
    )


def synth_metadata_html(docs: DataFrame) -> DataFrame:
    """Deterministic metadata-bearing HTML per document (see
    :func:`_synth_metadata_html`)."""

    @F.pandas_udf("string")
    def _page(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_metadata_html(int(i)) for i in ids])

    return docs.select("doc_id", _page("doc_id").alias("content"))


def _synth_table_html(i: int) -> str:
    """One deterministic HTML page from md5(doc:htab): 1+b0%2 tables,
    table t with a <th> header row of 2+b1%2 columns and 1+(b2+t)%3
    body rows; cells carry inline <b>/<span> markup and an &amp;
    charref the extractor must normalize; b3%7==0 pages have NO table
    (the marker branch)."""
    import hashlib

    b = hashlib.md5(f"{i}:htab".encode()).digest()
    if b[3] % 7 == 0:
        return f"<html><body><p>tableless {i}</p></body></html>"
    n_tables = 1 + b[0] % 2
    n_cols = 2 + b[1] % 2
    parts = ["<html><body>"]
    for t in range(n_tables):
        parts.append("<table>")
        parts.append(
            "<tr>"
            + "".join(
                f"<th><b>col {c}</b></th>" for c in range(n_cols)
            )
            + "</tr>"
        )
        for r in range(1 + (b[2] + t) % 3):
            cells = []
            for c in range(n_cols):
                word = _WORDS[(b[4] + t + r + c) % 5]
                if c == 0:
                    cells.append(f"<td><span>{word}</span> &amp; {r}</td>")
                else:
                    cells.append(f"<td>{word} {t}{r}{c}</td>")
            parts.append("<tr>" + "".join(cells) + "</tr>")
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def synth_table_html(docs: DataFrame) -> DataFrame:
    """Deterministic table-bearing HTML per document (see
    :func:`_synth_table_html`)."""

    @F.pandas_udf("string")
    def _page(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_table_html(int(i)) for i in ids])

    return docs.select("doc_id", _page("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# mbox / RFC 5322 email — mailing-list corpora
# ---------------------------------------------------------------------------

_ENCWORD_RE = re.compile(r"=\?([^?]+)\?([qbQB])\?([^?]*)\?=")


def _decode_encoded_word(m: re.Match) -> str:
    charset, kind, payload = m.group(1), m.group(2).lower(), m.group(3)
    if kind == "q":
        raw = re.sub(
            rb"=([0-9A-Fa-f]{2})",
            lambda h: bytes([int(h.group(1), 16)]),
            payload.replace("_", " ").encode("latin-1", "replace"),
        )
    else:
        import base64

        raw = base64.b64decode(payload)
    return raw.decode(charset, "replace")


def _decode_header(value: str) -> str:
    """RFC 2047 encoded-words (Q and B, any charset) decoded in place;
    whitespace BETWEEN adjacent encoded words is dropped per §6.2."""
    value = re.sub(
        r"(=\?[^?]+\?[qbQB]\?[^?]*\?=)\s+(?==\?)", r"\1", value
    )
    return _ENCWORD_RE.sub(_decode_encoded_word, value)


def _decode_body(body: str, cte: str) -> str:
    cte = cte.lower().strip()
    if cte == "quoted-printable":
        b = re.sub(r"=\r?\n", "", body)  # soft breaks
        raw = re.sub(
            rb"=([0-9A-Fa-f]{2})",
            lambda h: bytes([int(h.group(1), 16)]),
            b.encode("ascii", "replace"),
        )
        return raw.decode("utf-8", "replace")
    if cte == "base64":
        import base64

        return base64.b64decode(body).decode("utf-8", "replace")
    return body


def _parse_headers(block: str) -> dict[str, str]:
    """Header block → dict, continuation lines UNFOLDED (RFC 5322
    §2.2.3: a line starting with whitespace continues the previous
    header), names case-folded."""
    headers: dict[str, str] = {}
    current = None
    for line in block.split("\n"):
        if line[:1] in (" ", "\t") and current:
            headers[current] += " " + line.strip()
            continue
        name, sep, val = line.partition(":")
        if sep:
            current = name.strip().lower()
            headers[current] = val.strip()
    return headers


def mbox_messages(text: str) -> list[dict]:
    """Messages of an mbox file: split on the ``From `` envelope
    lines, headers unfolded and RFC 2047-decoded, Date through the
    same civil-date arithmetic as the feed parser, and the body
    decoded through Content-Transfer-Encoding (7bit /
    quoted-printable / base64); multipart/alternative messages yield
    their text/plain part (the HTML part is NOT the corpus text)."""
    chunks = re.split(r"(?:^|\n)From [^\n]*\n", text)
    out = []
    for chunk in chunks:
        if not chunk.strip():
            continue
        head, _, body = chunk.partition("\n\n")
        headers = _parse_headers(head)
        if "message-id" not in headers and "from" not in headers:
            raise ValueError("mbox chunk without headers")
        ctype = headers.get("content-type", "text/plain")
        cte = headers.get("content-transfer-encoding", "7bit")
        if ctype.startswith("multipart/"):
            m = re.search(r'boundary="?([^";]+)"?', ctype)
            if m is None:
                raise ValueError("multipart without boundary")
            boundary = m.group(1)
            text_part = None
            for part in body.split(f"--{boundary}")[1:]:
                if part.strip() in ("", "--"):
                    continue
                phead, _, pbody = part.lstrip("\n").partition("\n\n")
                ph = _parse_headers(phead)
                if ph.get("content-type", "").startswith("text/plain"):
                    text_part = _decode_body(
                        pbody, ph.get("content-transfer-encoding", "7bit")
                    )
                    break
            body_text = text_part if text_part is not None else ""
        else:
            body_text = _decode_body(body, cte)
        date = headers.get("date")
        out.append({
            "from_addr": _decode_header(headers.get("from", "")),
            "subject": _decode_header(headers.get("subject", "")),
            "date_s": _parse_feed_date(date) if date else None,
            "body": body_text.strip(),
        })
    if not out:
        raise ValueError("empty mbox")
    return out


def mbox_attachments(text: str) -> list[dict]:
    """Attachment parts of every message in an mbox file: multipart
    bodies walked for parts carrying a Content-Disposition attachment
    (or any filename= / name= parameter — real mailers disagree),
    payload decoded through Content-Transfer-Encoding (base64 with
    RFC 2045 line wrapping, quoted-printable, 7bit/8bit pass-through).
    Returns (msg_idx, att_idx, filename, mime, payload) rows — the
    extraction step that feeds email-borne PDFs/DOCX/images into the
    document tier (r11). Messages without attachments contribute no
    rows; a multipart without a boundary raises (the same refusal as
    mbox_messages)."""
    import base64
    import quopri

    chunks = re.split(r"(?:^|\n)From [^\n]*\n", text)
    out = []
    msg_idx = -1
    for chunk in chunks:
        if not chunk.strip():
            continue
        msg_idx += 1
        head, _, body = chunk.partition("\n\n")
        headers = _parse_headers(head)
        ctype = headers.get("content-type", "text/plain")
        if not ctype.startswith("multipart/"):
            continue
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if m is None:
            raise ValueError("multipart without boundary")
        att_idx = 0
        for part in body.split(f"--{m.group(1)}")[1:]:
            if part.strip() in ("", "--"):
                continue
            phead, _, pbody = part.lstrip("\n").partition("\n\n")
            ph = _parse_headers(phead)
            disp = ph.get("content-disposition", "")
            pct = ph.get("content-type", "text/plain")
            # RFC 5987 extended form first (filename*=UTF-8''p%C3%A8…
            # — how real mailers ship non-ASCII names), then the plain
            # filename=/name= parameters
            fname = None
            em = re.search(r"filename\*\s*=\s*([^;\s]+)", disp)
            if em is not None and em.group(1).count("'") >= 2:
                # charset'lang'pct-encoded; a malformed ext-value
                # (continuation form filename*0*=, quoted value, an
                # unknown charset label) falls back to the plain
                # filename= path instead of killing the task (r12
                # advice fix)
                charset, _, enc = em.group(1).split("'", 2)
                from urllib.parse import unquote

                try:
                    fname = unquote(enc, encoding=charset or "utf-8")
                except LookupError:
                    fname = None
            if fname is None:
                fm = re.search(
                    r'(?:filename|name)="?([^";]+)"?', disp + ";" + pct
                )
                if fm is not None:
                    fname = fm.group(1)
            if not disp.startswith("attachment") and fname is None:
                continue
            cte = ph.get("content-transfer-encoding", "7bit").lower()
            if cte == "base64":
                payload = base64.b64decode(
                    re.sub(r"\s", "", pbody), validate=True
                )
            elif cte == "quoted-printable":
                payload = quopri.decodestring(pbody.encode("latin-1"))
            else:
                payload = pbody.encode("latin-1")
            out.append({
                "msg_idx": msg_idx,
                "att_idx": att_idx,
                "filename": fname,
                "mime": pct.split(";")[0].strip(),
                "payload": payload,
            })
            att_idx += 1
    return out


def mbox_emails(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One row per mbox message in one Arrow pass: sender, decoded
    subject, date in epoch ms, decoded text/plain body. Malformed
    payloads yield the msg_idx -1 marker row."""

    def _msgs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "msg_idx", "from_addr", "subject",
                "date_ms", "body"]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    for k, msg in enumerate(mbox_messages(str(payload))):
                        rows.append({
                            "doc_id": did, "msg_idx": k,
                            "from_addr": msg["from_addr"],
                            "subject": msg["subject"],
                            "date_ms": None if msg["date_s"] is None
                            else msg["date_s"] * 1000,
                            "body": msg["body"],
                        })
                except (ValueError, TypeError):
                    rows.append({
                        "doc_id": did, "msg_idx": -1, "from_addr": None,
                        "subject": None, "date_ms": None, "body": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _msgs,
        schema="doc_id bigint, msg_idx int, from_addr string, "
        "subject string, date_ms bigint, body string",
    )


_MBOX_PHRASES = ("café update", "naïve plan", "plain note")


def _q_encode(s: str) -> str:
    """RFC 2047 Q encoding of one UTF-8 string (synth side)."""
    out = []
    for byte in s.encode("utf-8"):
        ch = chr(byte)
        if ch == " ":
            out.append("_")
        elif byte < 33 or byte > 126 or ch in "=?_":
            out.append(f"={byte:02X}")
        else:
            out.append(ch)
    return "".join(out)


def _synth_mbox(i: int) -> str:
    """One deterministic mbox from md5(doc:mbox): 1+b0%3 messages;
    message m rotates body transport (7bit / quoted-printable with a
    non-ASCII phrase / base64 / multipart-alternative whose text/html
    decoy must NOT be chosen), subject rotates a plain form with a
    FOLDED continuation line vs an RFC 2047 Q-encoded word, and dates
    ride the shared civil-date epoch."""
    import base64
    import hashlib

    b = hashlib.md5(f"{i}:mbox".encode()).digest()
    n = 1 + b[0] % 3
    msgs = []
    for m in range(n):
        epoch = 1690000000 + 86400 * b[1] + 7200 * m + 13 * b[2]
        word = _WORDS[(b[3] + m) % 5]
        body_plain = f"{word} body {m} of doc {i}"
        variant = (b[4] + m) % 4
        subj_plain = f"re: {word} thread {m}"
        del subj_plain  # (the oracle reconstructs both branches)
        if (b[5] + m) % 2 == 1:
            subject = f"=?utf-8?Q?{_q_encode(_MBOX_PHRASES[(b[6] + m) % 3])}?="
        else:
            subject = f"re: {word}\n thread {m}"  # folded header
        headers = [
            f"From: dev{m}@lists.ex.org",
            f"To: all@lists.ex.org",
            f"Subject: {subject}",
            f"Date: {_rfc822(epoch)}",
            f"Message-ID: <{i}.{m}@ex.org>",
        ]
        if variant == 0:
            body = body_plain
        elif variant == 1:
            headers.append("Content-Transfer-Encoding: quoted-printable")
            body = f"caf=C3=A9 {body_plain} ends=\nhere"
        elif variant == 2:
            headers.append("Content-Transfer-Encoding: base64")
            body = base64.b64encode(body_plain.encode()).decode()
        else:
            headers.append(
                'Content-Type: multipart/alternative; boundary="B42"'
            )
            body = (
                f"--B42\nContent-Type: text/html\n\n<p>DECOY {m}</p>\n"
                f"--B42\nContent-Type: text/plain\n\n{body_plain}\n"
                f"--B42--\n"
            )
        msgs.append(
            f"From dev{m}@lists.ex.org Thu Jan  1 00:00:00 2026\n"
            + "\n".join(headers) + "\n\n" + body + "\n"
        )
    return "".join(msgs)


def synth_mbox(docs: DataFrame) -> DataFrame:
    """Deterministic mbox per document (see :func:`_synth_mbox`)."""

    @F.pandas_udf("string")
    def _payload(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_mbox(int(i)) for i in ids])

    return docs.select("doc_id", _payload("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# Source-code file features — The-Stack-style code-corpus triage
# ---------------------------------------------------------------------------

_CODE_EXT = {
    ".py": "python", ".js": "javascript", ".sql": "sql",
    ".sh": "shell", ".rs": "rust",
}
_CODE_MARKER = {
    "python": "#", "shell": "#", "javascript": "//", "rust": "//",
    "sql": "--",
}
_SHEBANG_LANG = (
    (re.compile(r"^#!.*\bpython"), "python"),
    (re.compile(r"^#!.*\b(?:bash|sh)\b"), "shell"),
    (re.compile(r"^#!.*\bnode\b"), "javascript"),
)
_LICENSE_RE = re.compile(
    r"Apache License|MIT License|GNU General Public License"
)


def code_file_features(path: str, src: str) -> dict:
    """Triage features of one source file — the pre-filter columns a
    code-corpus pipeline (The Stack-style) partitions and gates on:
    language from the extension map with a SHEBANG fallback for
    extensionless scripts, line count, per-language line-comment
    count, longest line, shebang and license-header flags (license
    scanned in the first 5 lines only — a LICENSE mention in the body
    is not a header)."""
    ext = "." + path.rpartition(".")[2] if "." in path.rpartition("/")[2] \
        else ""
    lang = _CODE_EXT.get(ext)
    lines = src.split("\n")
    if lines and not lines[-1]:
        lines = lines[:-1]
    has_shebang = bool(lines) and lines[0].startswith("#!")
    if lang is None and has_shebang:
        for rx, shl in _SHEBANG_LANG:
            if rx.search(lines[0]):
                lang = shl
                break
    marker = _CODE_MARKER.get(lang or "", None)
    n_comment = (
        sum(1 for ln in lines if marker and ln.lstrip().startswith(marker))
        if marker
        else 0
    )
    return {
        "lang": lang,
        "n_lines": len(lines),
        "n_comment_lines": n_comment,
        "max_line_len": max((len(ln) for ln in lines), default=0),
        "has_shebang": has_shebang,
        "has_license": bool(_LICENSE_RE.search("\n".join(lines[:5]))),
    }


def code_features(
    docs: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """One feature row per source file in one Arrow pass."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "lang", "n_lines", "n_comment_lines",
                "max_line_len", "has_shebang", "has_license"]
        for pdf in batches:
            rows = []
            for did, path, src in zip(
                pdf[id_col], pdf[path_col], pdf[content_col]
            ):
                rows.append(
                    {"doc_id": did,
                     **code_file_features(str(path), str(src))}
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, path_col, content_col).mapInPandas(
        _feat,
        schema="doc_id bigint, lang string, n_lines int, "
        "n_comment_lines int, max_line_len int, has_shebang boolean, "
        "has_license boolean",
    )


_CODE_LANGS = ("python", "javascript", "sql", "shell", "rust")
_CODE_EXT_BY_LANG = {v: k for k, v in _CODE_EXT.items()}


def _synth_code_file(i: int) -> tuple[str, str]:
    """(path, source) for one deterministic code file from
    md5(doc:code): language rotates over the 5-language map, except
    b5%4==0 files are EXTENSIONLESS with a python shebang (the
    fallback branch); an Apache-license comment header lands on
    b3%3==0, comment lines on (b2+j)%3==0, and one long string line
    of 56+b4%40 chars pins max_line_len."""
    import hashlib

    b = hashlib.md5(f"{i}:code".encode()).digest()
    shebang_file = b[5] % 4 == 0
    lang = "python" if shebang_file else _CODE_LANGS[b[0] % 5]
    marker = _CODE_MARKER[lang]
    lines = []
    if shebang_file:
        path = f"bin/tool_{i}"
        lines.append("#!/usr/bin/env python3")
    else:
        path = f"src/mod_{i}{_CODE_EXT_BY_LANG[lang]}"
    if b[3] % 3 == 0:
        lines.append(f"{marker} Apache License 2.0")
        lines.append(f"{marker} all rights reserved")
    n = 3 + b[1] % 5
    for j in range(n):
        if (b[2] + j) % 3 == 0:
            lines.append(f"{marker} note {j}")
        else:
            lines.append(f"x{j} = {j}")
    lines.append('y = "' + "a" * (50 + b[4] % 40) + '"')
    return path, "\n".join(lines) + "\n"


def synth_code_files(docs: DataFrame) -> DataFrame:
    """Deterministic source file per document (see
    :func:`_synth_code_file`)."""

    @F.pandas_udf("path string, content string")
    def _file(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for ids in it:
            rows = [_synth_code_file(int(i)) for i in ids]
            yield pd.DataFrame(rows, columns=["path", "content"])

    return docs.select(
        "doc_id", _file("doc_id").alias("f")
    ).select("doc_id", "f.path", "f.content")


def synth_aligned_subtitles(docs: DataFrame) -> DataFrame:
    """Subtitle payloads on a VIDEO-length timeline (the 8-frame,
    4 fps = 2000 ms synth_ppm_video clock): gaps 400-760 ms, offsets
    <200 ms, durations 150-480 ms — so cues genuinely straddle shot
    boundaries, and the later cues of 4-cue files can run PAST the
    video end (the unmatched branch of the alignment join)."""

    @F.pandas_udf("string")
    def _payload(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([
                _synth_subtitle_text(
                    int(i), salt="asub", gap_base=400, gap_step=40,
                    off_mod=200, dur_base=150, dur_step=30,
                )
                for i in ids
            ])

    return docs.select(
        F.col("doc_id").alias("media_id"), _payload("doc_id").alias("content")
    )


def mbox_threads(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Mailing-list THREAD assembly — the step that turns an mbox into
    dialogue training data: messages grouped by following In-Reply-To
    chains back to their root (References fallback: last id wins),
    with per-message depth. Resolution is per-file inside the Arrow
    pass (thread graphs never span mbox files), so the operator stays
    zero-shuffle. Output: (doc_id, msg_idx, thread_root_idx, depth);
    malformed payloads yield the msg_idx -1 marker."""

    def _threads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "msg_idx", "thread_root_idx", "depth"]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    chunks = re.split(
                        r"(?:^|\n)From [^\n]*\n", str(payload)
                    )
                    headers = []
                    for chunk in chunks:
                        if not chunk.strip():
                            continue
                        head, _, _body = chunk.partition("\n\n")
                        headers.append(_parse_headers(head))
                    if not headers:
                        raise ValueError("empty mbox")
                    by_id = {
                        h.get("message-id"): k
                        for k, h in enumerate(headers)
                        if h.get("message-id")
                    }
                    for k, h in enumerate(headers):
                        parent = h.get("in-reply-to")
                        if parent is None and "references" in h:
                            parent = h["references"].split()[-1]
                        depth = 0
                        node = k
                        seen = {k}
                        while parent is not None:
                            nxt = by_id.get(parent)
                            if nxt is None or nxt in seen:
                                break  # dangling or cyclic: stop here
                            seen.add(nxt)
                            depth += 1
                            node = nxt
                            ph = headers[nxt]
                            parent = ph.get("in-reply-to")
                            if parent is None and "references" in ph:
                                parent = ph["references"].split()[-1]
                        rows.append({
                            "doc_id": did, "msg_idx": k,
                            "thread_root_idx": node, "depth": depth,
                        })
                except (ValueError, TypeError):
                    rows.append({
                        "doc_id": did, "msg_idx": -1,
                        "thread_root_idx": None, "depth": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _threads,
        schema="doc_id bigint, msg_idx int, thread_root_idx int, depth int",
    )


def _synth_threaded_mbox(i: int) -> str:
    """One deterministic threaded mbox from md5(doc:thr): 2+b0%4
    messages; message m starts a NEW thread when m==0 or (b1+m)%3==0,
    otherwise replies to message m-1 (chains within threads — depth =
    m - root). Odd replies reference the parent via References
    instead of In-Reply-To (the fallback branch)."""
    import hashlib

    b = hashlib.md5(f"{i}:thr".encode()).digest()
    n = 2 + b[0] % 4
    msgs = []
    for m in range(n):
        headers = [
            f"From: dev{m}@lists.ex.org",
            f"Subject: msg {m}",
            f"Message-ID: <{i}.{m}@ex.org>",
        ]
        is_root = m == 0 or (b[1] + m) % 3 == 0
        if not is_root:
            if (b[2] + m) % 2 == 1:
                headers.append(
                    f"References: <{i}.0@ex.org> <{i}.{m - 1}@ex.org>"
                )
            else:
                headers.append(f"In-Reply-To: <{i}.{m - 1}@ex.org>")
        msgs.append(
            f"From dev{m}@lists.ex.org Thu Jan  1 00:00:00 2026\n"
            + "\n".join(headers) + f"\n\nbody {m}\n"
        )
    return "".join(msgs)


def synth_threaded_mbox(docs: DataFrame) -> DataFrame:
    """Deterministic threaded mbox per document (see
    :func:`_synth_threaded_mbox`)."""

    @F.pandas_udf("string")
    def _payload(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_threaded_mbox(int(i)) for i in ids])

    return docs.select("doc_id", _payload("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# Jupyter notebooks (.ipynb) — code-corpus cell extraction
# ---------------------------------------------------------------------------


def ipynb_cells(blob: bytes | str) -> list[dict]:
    """(cell_idx, cell_type, source, n_outputs) per notebook cell:
    nbformat-4 JSON, the ``source`` list-of-lines joined verbatim,
    outputs COUNTED but never inlined (training pipelines strip
    outputs — they carry execution artifacts, not authored text)."""
    import json as _json

    data = blob.decode("utf-8") if isinstance(blob, (bytes, bytearray)) \
        else str(blob)
    nb = _json.loads(data)
    cells = nb.get("cells")
    if not isinstance(cells, list):
        raise ValueError("not an nbformat-4 notebook")
    out = []
    for k, cell in enumerate(cells):
        src = cell.get("source", "")
        if isinstance(src, list):
            src = "".join(src)
        out.append({
            "cell_idx": k,
            "cell_type": cell.get("cell_type", ""),
            "source": src,
            "n_outputs": len(cell.get("outputs", []) or []),
        })
    if not out:
        raise ValueError("notebook with no cells")
    return out


def notebook_cells(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """One row per notebook cell in one Arrow pass; malformed
    notebooks yield the cell_idx -1 marker row."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        cols = ["doc_id", "cell_idx", "cell_type", "source", "n_outputs"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    for c in ipynb_cells(blob):
                        rows.append({"doc_id": did, **c})
                except (ValueError, TypeError, _json.JSONDecodeError,
                        AttributeError):
                    rows.append({
                        "doc_id": did, "cell_idx": -1, "cell_type": None,
                        "source": None, "n_outputs": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _cells,
        schema="doc_id bigint, cell_idx int, cell_type string, "
        "source string, n_outputs int",
    )


def _synth_ipynb(i: int) -> bytes:
    """One deterministic nbformat-4 notebook from md5(doc:nb):
    1+b0%4 cells alternating markdown/code by (b1+k)%2, code cells
    carrying 1+(b2+k)%3 execution outputs that must be COUNTED but
    never inlined, and multi-line list-form source the extractor
    joins verbatim."""
    import hashlib
    import json as _json

    b = hashlib.md5(f"{i}:nb".encode()).digest()
    cells = []
    for k in range(1 + b[0] % 4):
        word = _WORDS[(b[3] + k) % 5]
        if (b[1] + k) % 2 == 0:
            cells.append({
                "cell_type": "markdown",
                "metadata": {},
                "source": [f"# {word} section {k}\n", f"notes {k}"],
            })
        else:
            n_out = 1 + (b[2] + k) % 3
            cells.append({
                "cell_type": "code",
                "execution_count": k,
                "metadata": {},
                "source": [f"x_{k} = '{word}'\n", f"print(x_{k})"],
                "outputs": [
                    {"output_type": "stream", "name": "stdout",
                     "text": [f"DECOY output {j}\n"]}
                    for j in range(n_out)
                ],
            })
    nb = {"cells": cells, "metadata": {}, "nbformat": 4,
          "nbformat_minor": 5}
    return _json.dumps(nb).encode()


def synth_ipynb(docs: DataFrame) -> DataFrame:
    """Deterministic notebook per document (see :func:`_synth_ipynb`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_ipynb(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# Stack Exchange XML dumps — Posts.xml rows + Q&A assembly
# ---------------------------------------------------------------------------


def stackexchange_posts(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Posts.xml rows of a Stack Exchange data dump — the classic XML
    corpus source, and the reference's XML-extraction heritage on a
    real public dataset shape: one <row> element per post with the
    payload in ATTRIBUTES (Body is entity-escaped HTML; ElementTree
    decodes the entities, the html_text stage downstream strips the
    markup). Output: (doc_id, post_id, post_type, parent_id, score,
    created_ms, body_html). Malformed dumps yield the post_id -1
    marker row."""

    def _posts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "post_id", "post_type", "parent_id", "score",
                "created_ms", "body_html"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    data = bytes(blob) if not isinstance(blob, str) \
                        else blob.encode()
                    root = ElementTree.fromstring(data)
                    if _local(root.tag) != "posts":
                        raise ValueError("not a posts dump")
                    # All-or-marker: buffer this dump's rows and extend
                    # only after the whole walk parses, so a bad <row>
                    # late in the dump can't emit a partial prefix plus
                    # the marker (same contract as xlsx_cells).
                    doc_rows = []
                    for el in root:
                        if _local(el.tag) != "row":
                            continue
                        created = el.get("CreationDate")
                        doc_rows.append({
                            "doc_id": did,
                            "post_id": int(el.get("Id", "-1")),
                            "post_type": int(el.get("PostTypeId", "0")),
                            "parent_id": (
                                int(el.get("ParentId"))
                                if el.get("ParentId") is not None else None
                            ),
                            "score": int(el.get("Score", "0")),
                            "created_ms": (
                                _parse_feed_date(created + "Z") * 1000
                                if created else None
                            ),
                            "body_html": el.get("Body"),
                        })
                    if not doc_rows:
                        raise ValueError("dump with no rows")
                    rows.extend(doc_rows)
                except (ValueError, TypeError,
                        ElementTree.ParseError):
                    rows.append({
                        "doc_id": did, "post_id": -1, "post_type": None,
                        "parent_id": None, "score": None,
                        "created_ms": None, "body_html": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _posts,
        schema="doc_id bigint, post_id int, post_type int, "
        "parent_id int, score int, created_ms bigint, body_html string",
    )


def _synth_stackexchange_xml(i: int) -> bytes:
    """One deterministic Posts.xml fragment from md5(doc:se): one
    question (post 1) and 1+b0%3 answers (posts 2..) with scores
    (b2+a)%20 - 5 (ties live: duplicated score when b3%2), bodies as
    ENTITY-ESCAPED HTML (&lt;p&gt;...&lt;/p&gt; with an &amp;amp;
    double escape the two-layer decode chain must resolve), and ISO
    CreationDates on the shared civil-date clock."""
    import hashlib
    from xml.sax.saxutils import quoteattr

    b = hashlib.md5(f"{i}:se".encode()).digest()
    n_ans = 1 + b[0] % 3
    epoch0 = 1600000000 + 86400 * b[1]

    def iso(epoch: int) -> str:
        return _iso8601(epoch)[:-1]  # SE dumps carry no zone suffix

    q_body = (
        f"<p>how to {_WORDS[b[4] % 5]} &amp; why {i}?</p>"
        "<pre>code block</pre>"
    )
    rows = [
        f"  <row Id=\"1\" PostTypeId=\"1\" Score=\"{b[5] % 50}\" "
        f"CreationDate=\"{iso(epoch0)}\" Body={quoteattr(q_body)} />"
    ]
    scores = []
    for a in range(n_ans):
        score = (b[2] + a) % 20 - 5
        if a == 1 and b[3] % 2 == 1 and n_ans > 1:
            score = scores[0]  # planted TIE: min-id tiebreak is live
        scores.append(score)
        a_body = f"<p>{_WORDS[(b[4] + a + 1) % 5]} answer {a} &amp; done</p>"
        rows.append(
            f"  <row Id=\"{a + 2}\" PostTypeId=\"2\" ParentId=\"1\" "
            f"Score=\"{score}\" CreationDate=\"{iso(epoch0 + 3600 * (a + 1))}\" "
            f"Body={quoteattr(a_body)} />"
        )
    xml = (
        "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<posts>\n"
        + "\n".join(rows) + "\n</posts>\n"
    )
    return xml.encode()


def synth_stackexchange(docs: DataFrame) -> DataFrame:
    """Deterministic Posts.xml per document (see
    :func:`_synth_stackexchange_xml`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_stackexchange_xml(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# Wikipedia XML dumps — pages-articles.xml + wikitext cleaning
# ---------------------------------------------------------------------------

_WIKI_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}", re.S)
_WIKI_REF_RE = re.compile(r"<ref[^>/]*>.*?</ref>|<ref[^>]*/>", re.S)
_WIKI_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


def wikitext_to_text(src: str) -> str:
    """Wikitext → plain text, the deterministic rule subset corpus
    pipelines run over pages-articles dumps: HTML comments and
    <ref> footnotes dropped, {{templates}} dropped (innermost-out, so
    nesting collapses), [[File:]] / [[Category:]] links dropped whole,
    [[target|label]] → label and [[target]] → target, external
    [http://u label] → label, '''bold'''/''italic'' markers erased,
    == heading == markers erased keeping the heading text, whitespace
    canonicalized to single spaces."""
    s = _WIKI_COMMENT_RE.sub(" ", src)
    s = _WIKI_REF_RE.sub(" ", s)
    prev = None
    while prev != s:
        prev = s
        s = _WIKI_TEMPLATE_RE.sub(" ", s)
    s = re.sub(r"\[\[(?:File|Image|Category):[^\[\]]*\]\]", " ", s)
    s = re.sub(r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]", r"\1", s)
    s = re.sub(r"\[\[([^\[\]]*)\]\]", r"\1", s)
    s = re.sub(r"\[https?://\S+\s+([^\]]*)\]", r"\1", s)
    s = s.replace("'''", "").replace("''", "")
    s = re.sub(r"^=+\s*(.*?)\s*=+\s*$", r"\1", s, flags=re.M)
    return " ".join(s.split())


def _bz2_decompress_streams(raw: bytes, cap: int = _MAX_INFLATE) -> bytes:
    """Decompress a CONCATENATION of bz2 streams (the multistream dump
    layout) with the same hard output bound as :func:`_bounded_inflate`
    — refuses bombs and truncated streams."""
    import bz2 as _bz2

    out: list[bytes] = []
    total = 0
    pos = 0
    while pos < len(raw):
        if raw[pos : pos + 3] != b"BZh":
            raise ValueError("not a bz2 stream boundary")
        d = _bz2.BZ2Decompressor()
        piece = d.decompress(raw[pos:], 1 << 20)
        while True:
            if piece:
                out.append(piece)
                total += len(piece)
                if total > cap:
                    raise ValueError("inflated output exceeds bound")
            if d.eof:
                break
            if d.needs_input:
                raise ValueError("truncated bz2 stream")
            piece = d.decompress(b"", 1 << 20)
        pos = len(raw) - len(d.unused_data)
    return b"".join(out)


def _wikipedia_page_rows(did, data: bytes) -> list[dict]:
    """Rows of one <mediawiki> dump (the shared page walk): per <page>
    the title, namespace, FIRST <id> (revision ids must not shadow
    it), redirect target (attribute), and the CLEANED revision text.
    Raises on malformed/empty dumps — callers map that to the marker
    row. All-or-nothing: the caller extends only on full parse."""
    root = ElementTree.fromstring(data)
    if _local(root.tag) != "mediawiki":
        raise ValueError("not a mediawiki dump")
    doc_rows = []
    for page in root:
        if _local(page.tag) != "page":
            continue
        title = ns = pid = redirect = None
        text = ""
        for el in page.iter():
            loc = _local(el.tag)
            if loc == "title":
                title = el.text
            elif loc == "ns":
                ns = int(el.text or "0")
            elif loc == "id" and pid is None:
                pid = int(el.text or "-1")
            elif loc == "redirect":
                redirect = el.get("title")
            elif loc == "text":
                text = el.text or ""
        clean = wikitext_to_text(text)
        doc_rows.append({
            "doc_id": did, "page_id": pid, "title": title,
            "ns": ns, "redirect_to": redirect,
            "text_clean": clean,
            "n_tokens": len(clean.split()),
        })
    if not doc_rows:
        raise ValueError("dump with no pages")
    return doc_rows


_WIKI_COLS = ["doc_id", "page_id", "title", "ns", "redirect_to",
              "text_clean", "n_tokens"]
_WIKI_SCHEMA = (
    "doc_id bigint, page_id int, title string, ns int, "
    "redirect_to string, text_clean string, n_tokens int"
)


def wikipedia_pages(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Pages of a MediaWiki pages-articles dump fragment — the
    canonical XML corpus source, through the same localname-tolerant
    ElementTree walk as the sitemap/feed sources: per <page> the
    title, namespace, page id, redirect flag+target (attribute of the
    <redirect> element, not the wikitext), and the CLEANED revision
    text via :func:`wikitext_to_text`. ``.bz2`` dumps (single- or
    multi-stream — the real ``pages-articles-multistream.xml.bz2``
    layout) decompress transparently through the bounded bz2 walk
    (r10). Malformed dumps yield the page_id -1 marker row."""

    def _pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    data = bytes(blob) if not isinstance(blob, str) \
                        else blob.encode()
                    if data[:3] == b"BZh":
                        data = _bz2_decompress_streams(data)
                    rows.extend(_wikipedia_page_rows(did, data))
                except (ValueError, TypeError, OSError,
                        ElementTree.ParseError):
                    rows.append({
                        "doc_id": did, "page_id": -1, "title": None,
                        "ns": None, "redirect_to": None,
                        "text_clean": None, "n_tokens": None,
                    })
            yield pd.DataFrame(rows, columns=_WIKI_COLS)

    return docs.select(id_col, content_col).mapInPandas(
        _pages, schema=_WIKI_SCHEMA
    )


_WIKI_ROOT_OPEN = (
    "<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.10/\" "
    "xml:lang=\"en\">"
)


def _synth_wikipedia_page_list(i: int) -> list[tuple[int, str, str]]:
    """(page_id, title, page XML) list from md5(doc:wiki): an ARTICLE
    page exercising every cleaning rule plus, on b0%3==0, a REDIRECT
    page whose target lives in the <redirect> element attribute —
    shared by the whole-dump and multistream synthesizers."""
    import hashlib

    b = hashlib.md5(f"{i}:wiki".encode()).digest()
    w = [_WORDS[(b[k] + k) % 5] for k in range(6)]
    article_text = (
        f"== {w[0]} history ==\n"
        f"The '''{w[1]}''' {{{{Infobox thing|param={{{{nested|x}}}}}}}} "
        f"is ''really'' a [[{w[2]} concept|{w[2]} idea]] and a "
        f"[[plain {w[3]}]].<ref>dropped footnote</ref>\n"
        f"[[File:decoy_{i}.jpg|thumb|caption gone]]\n"
        f"<!-- hidden editor note -->\n"
        f"See [https://ex.org/{i} the {w[4]} site] for more."
    )
    ns_art = 0 if b[1] % 2 == 0 else 4
    pages = [(
        10 + i % 1000,
        f"Article {i}",
        "<page><title>Article {}</title><ns>{}</ns><id>{}</id>"
        "<revision><id>9{}</id><text xml:space=\"preserve\">{}</text>"
        "</revision></page>".format(
            i, ns_art, 10 + i % 1000,
            i % 100,
            article_text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"),
        ),
    )]
    if b[0] % 3 == 0:
        pages.append((
            5000 + i % 1000,
            f"Alias {i}",
            f"<page><title>Alias {i}</title><ns>0</ns><id>{5000 + i % 1000}"
            f"</id><redirect title=\"Article {i}\"/>"
            "<revision><id>1</id><text>#REDIRECT [[Article "
            f"{i}]]</text></revision></page>",
        ))
    return pages


def _synth_wikipedia_xml(i: int) -> bytes:
    """One deterministic pages-articles fragment (see
    :func:`_synth_wikipedia_page_list`)."""
    pages = _synth_wikipedia_page_list(i)
    return (
        _WIKI_ROOT_OPEN + "".join(x for _, _, x in pages) + "</mediawiki>"
    ).encode()


def synth_wikipedia(docs: DataFrame) -> DataFrame:
    """Deterministic dump fragment per document (see
    :func:`_synth_wikipedia_xml`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_wikipedia_xml(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# Wikipedia .bz2 MULTISTREAM dumps — index-driven intra-file splits (r10)
# ---------------------------------------------------------------------------
#
# The real `pages-articles-multistream.xml.bz2` is a CONCATENATION of
# bz2 streams (header stream with <mediawiki><siteinfo>, ~100 pages per
# stream, a closing-tag stream) shipped with a companion
# `...-multistream-index.txt.bz2` of `offset:page_id:title` lines —
# offset being the byte position of the stream holding that page. The
# offsets make the 20+ GB single file SPLITTABLE: exactly the shape
# `split_warc_file` solved for WARC (r8), so the split packing reuses
# the same record-aligned cut machinery, and ranged reads parallelize
# INSIDE the dump instead of one task per file.


def parse_multistream_index(raw: bytes) -> list[tuple[int, int, str]]:
    """(stream offset, page_id, title) rows of a multistream index
    file (bz2 or plain text) — title may itself contain ':', so only
    the first two fields split."""
    if raw[:3] == b"BZh":
        raw = _bz2_decompress_streams(raw)
    out = []
    for line in raw.decode("utf-8").splitlines():
        if not line:
            continue
        off, pid, title = line.split(":", 2)
        out.append((int(off), int(pid), title))
    if not out:
        raise ValueError("empty multistream index")
    return out


def wikipedia_multistream_cuts(
    index: list[tuple[int, int, str]], dump_len: int, target_bytes: int
) -> list[dict]:
    """Record-aligned (offset, length, first_rec=pages-so-far) splits
    of a multistream dump, packed to ~``target_bytes`` COMPRESSED
    bytes via the shared WARC cut packer: boundaries are the distinct
    index offsets (stream starts) plus end-of-file, so every split
    begins on a bz2 stream the ranged parser can decompress
    independently."""
    from hadoopxmlextractor_spark.sources.warc import _cuts_to_splits

    bounds = sorted({off for off, _, _ in index})
    if bounds and bounds[-1] >= dump_len:
        raise ValueError("index offset past end of dump")
    # every stream start ENDS the preceding range; EOF ends the last.
    # pages-so-far per boundary via ONE sorted pass + bisect — the real
    # pages-articles index is ~20M pages / ~200k streams, so the naive
    # per-boundary count is O(streams x pages) and unusable at scale.
    page_offsets = sorted(off for off, _, _ in index)
    cut_points = [(b, bisect_left(page_offsets, b)) for b in bounds]
    cut_points.append((dump_len, len(index)))
    if cut_points[0][0] == 0:  # no header stream before the first page
        cut_points.pop(0)
    return _cuts_to_splits(cut_points, dump_len, target_bytes)


def _wikipedia_range_rows(did, raw: bytes) -> list[dict]:
    """Page rows of one RANGED slice of a multistream dump (must start
    on a bz2 stream boundary): decompress the streams in range, drop
    any header prefix (everything before the first <page>) and the
    closing-tag suffix, wrap in a synthetic root, and run the shared
    page walk. A range holding only header/footer streams yields []."""
    text = _bz2_decompress_streams(raw).decode("utf-8")
    start = text.find("<page")
    if start < 0:
        return []
    end = text.rfind("</page>")
    if end < 0:
        raise ValueError("truncated page range")
    body = text[start : end + len("</page>")]
    data = (_WIKI_ROOT_OPEN + body + "</mediawiki>").encode()
    return _wikipedia_page_rows(did, data)


def wikipedia_split_index(
    files: DataFrame,
    *,
    target_bytes: int = 1 << 20,
    content_col: str = "content",
    index_col: str = "index",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dump, index) → split rows via
    :func:`wikipedia_multistream_cuts` — the in-memory twin of the
    file-based index pass in :func:`read_wikipedia_multistream`; a
    malformed dump/index degrades to the split_idx -1 marker row."""

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "split_idx", "offset", "length", "first_rec",
                "n_recs", "n_members"]
        for pdf in batches:
            rows = []
            for did, blob, idx in zip(
                pdf[id_col], pdf[content_col], pdf[index_col]
            ):
                try:
                    entries = parse_multistream_index(bytes(idx))
                    for s in wikipedia_multistream_cuts(
                        entries, len(bytes(blob)), target_bytes
                    ):
                        rows.append({"doc_id": did, **s})
                except (ValueError, IndexError, OSError):
                    rows.append({
                        "doc_id": did, "split_idx": -1, "offset": None,
                        "length": None, "first_rec": None,
                        "n_recs": None, "n_members": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return files.select(id_col, content_col, index_col).mapInPandas(
        _index,
        schema="doc_id bigint, split_idx int, offset long, length long, "
        "first_rec int, n_recs int, n_members int",
    )


def wikipedia_pages_ranged(
    splits: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Split rows carrying the dump bytes → page rows: each task
    decompresses only ITS (offset, length) byte range — the union over
    splits is row-identical to :func:`wikipedia_pages` on the whole
    dump (asserted in tests). Malformed ranges yield the page_id -1
    marker."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob, off, ln in zip(
                pdf[id_col], pdf[content_col], pdf["offset"], pdf["length"]
            ):
                try:
                    raw = bytes(blob)[int(off) : int(off) + int(ln)]
                    rows.extend(_wikipedia_range_rows(did, raw))
                except (ValueError, TypeError, OSError,
                        ElementTree.ParseError):
                    rows.append({
                        "doc_id": did, "page_id": -1, "title": None,
                        "ns": None, "redirect_to": None,
                        "text_clean": None, "n_tokens": None,
                    })
            yield pd.DataFrame(rows, columns=_WIKI_COLS)

    return splits.select(id_col, content_col, "offset", "length").mapInPandas(
        _parse, schema=_WIKI_SCHEMA
    )


def read_wikipedia_multistream(
    spark, dump_path: str, index_path: str, *, target_bytes: int = 1 << 20
) -> DataFrame:
    """The scale path for the single-20-GB-file Wikipedia dump: parse
    the multistream index (a few MB) into record-aligned (offset,
    length) splits, repartition the split rows, then each task seeks
    into the dump and decompresses only its range — same architecture
    as :func:`read_warc_split` (r8), so one dump becomes thousands of
    tasks instead of one. doc_id is 0 (single-dump reader); page rows
    match :func:`wikipedia_pages` over the whole file."""
    import os

    from hadoopxmlextractor_spark.sources.warc import _local_path

    n_parts = spark.sparkContext.defaultParallelism
    paths = spark.createDataFrame(
        [(dump_path, index_path)], "dump string, idx string"
    )

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["dump", "split_idx", "offset", "length", "first_rec"]
        for pdf in batches:
            rows = []
            for dp, ip in zip(pdf["dump"], pdf["idx"]):
                with open(_local_path(ip), "rb") as f:
                    entries = parse_multistream_index(f.read())
                size = os.path.getsize(_local_path(dp))
                for s in wikipedia_multistream_cuts(
                    entries, size, target_bytes
                ):
                    rows.append({
                        "dump": dp, "split_idx": s["split_idx"],
                        "offset": s["offset"], "length": s["length"],
                        "first_rec": s["first_rec"],
                    })
            yield pd.DataFrame(rows, columns=cols)

    splits = paths.mapInPandas(
        _index,
        schema="dump string, split_idx int, offset long, length long, "
        "first_rec int",
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for dp, off, ln in zip(
                pdf["dump"], pdf["offset"], pdf["length"]
            ):
                with open(_local_path(dp), "rb") as f:
                    f.seek(int(off))
                    raw = f.read(int(ln))
                rows.extend(_wikipedia_range_rows(0, raw))
            yield pd.DataFrame(rows, columns=_WIKI_COLS)

    return splits.repartition(n_parts, "dump", "split_idx").mapInPandas(
        _read, schema=_WIKI_SCHEMA
    )


def _synth_wikipedia_multistream(i: int) -> tuple[bytes, bytes]:
    """(dump bytes, index bytes) of a deterministic MULTISTREAM dump:
    header stream (<mediawiki> + <siteinfo>), ONE PAGE PER STREAM
    (the real layout packs ~100 — one page keeps >1 stream per doc),
    and a closing-tag stream; the bz2 index carries
    offset:page_id:title lines (titles with spaces, ids from the
    shared synth) and is itself bz2-compressed, as shipped."""
    import bz2 as _bz2

    pages = _synth_wikipedia_page_list(i)
    dump = bytearray()
    dump += _bz2.compress(
        (_WIKI_ROOT_OPEN + "<siteinfo><sitename>synth</sitename>"
         "</siteinfo>").encode()
    )
    index_lines = []
    for pid, title, xml in pages:
        index_lines.append(f"{len(dump)}:{pid}:{title}")
        dump += _bz2.compress(xml.encode())
    dump += _bz2.compress(b"</mediawiki>")
    index = _bz2.compress("\n".join(index_lines).encode() + b"\n")
    return bytes(dump), index


def synth_wikipedia_multistream(docs: DataFrame) -> DataFrame:
    """(doc_id, content, index) of a deterministic multistream dump
    per document (see :func:`_synth_wikipedia_multistream`)."""

    @F.pandas_udf("struct<content:binary, index:binary>")
    def _blobs(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for ids in it:
            pair = [_synth_wikipedia_multistream(int(i)) for i in ids]
            yield pd.DataFrame({
                "content": [p[0] for p in pair],
                "index": [p[1] for p in pair],
            })

    return docs.select("doc_id", _blobs("doc_id").alias("b")).select(
        "doc_id", F.col("b.content").alias("content"),
        F.col("b.index").alias("index"),
    )


# ---------------------------------------------------------------------------
# PDF Info dictionary — document metadata (title/author/dates)
# ---------------------------------------------------------------------------

_PDF_D_RE = re.compile(
    rb"D:(\d{4})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})"
)


def _pdf_info_string(body: bytes, key: bytes) -> str | None:
    """One Info-dict text value: either a literal (string) with the
    standard escapes, or a <hex> string — which, when it leads with
    the FEFF byte-order mark, is UTF-16BE text (ISO 32000 §7.9.2.2,
    how real producers write non-ASCII titles)."""
    m = re.search(rb"/" + key + rb"\s*(\(|<)", body)
    if m is None:
        return None
    s = body.decode("latin-1")
    pos = m.end() - 1
    if s[pos] == "(":
        lit, _ = _pdf_literal(s, pos)
        return lit
    j = s.index(">", pos)
    hexs = re.sub(r"\s", "", s[pos + 1 : j])
    if len(hexs) % 2:
        hexs += "0"
    raw = bytes.fromhex(hexs)
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be")
    return raw.decode("latin-1")


def pdf_info(blob: bytes) -> dict:
    """Document metadata of a PDF: the trailer's /Info dictionary —
    Title/Author/Producer text values (literal AND UTF-16BE-hex
    forms) and the D:YYYYMMDDHHmmSS CreationDate normalized to epoch
    seconds through the shared civil-date arithmetic. No /Info →
    all-NULL metadata (a valid, common state — not a marker)."""
    objs = _pdf_objects(blob)
    m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", blob)
    out = {"title": None, "author": None, "producer": None,
           "created_s": None}
    if m is None:
        return out
    body = objs.get(int(m.group(1)))
    if body is None:
        raise ValueError("dangling /Info reference")
    out["title"] = _pdf_info_string(body, b"Title")
    out["author"] = _pdf_info_string(body, b"Author")
    out["producer"] = _pdf_info_string(body, b"Producer")
    d = _PDF_D_RE.search(body)
    if d is not None:
        out["created_s"] = _epoch_from_civil(
            *(int(d.group(k)) for k in range(1, 7))
        )
    return out


def pdf_metadata(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, title, author, producer, created_ms, has_info) in one
    Arrow pass — the document-metadata twin of html_metadata for the
    PDF leg. Malformed blobs yield has_info NULL."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "title", "author", "producer", "created_ms",
                "has_info"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    info = pdf_info(bytes(blob))
                    rows.append({
                        "doc_id": did, "title": info["title"],
                        "author": info["author"],
                        "producer": info["producer"],
                        "created_ms": None if info["created_s"] is None
                        else info["created_s"] * 1000,
                        "has_info": info["title"] is not None
                        or info["author"] is not None
                        or info["created_s"] is not None,
                    })
                except (ValueError, IndexError, TypeError):
                    rows.append({
                        "doc_id": did, "title": None, "author": None,
                        "producer": None, "created_ms": None,
                        "has_info": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _meta,
        schema="doc_id bigint, title string, author string, "
        "producer string, created_ms bigint, has_info boolean",
    )


_PDF_TITLES = ("café report", "naïve survey", "plain notes")


def _synth_pdf_with_info(i: int) -> bytes:
    """A one-page PDF whose trailer carries an /Info dict from
    md5(doc:pdfi): Title rotates a plain LITERAL vs a UTF-16BE hex
    string with BOM (non-ASCII titles keep both decode branches
    honest), Author a literal with an escaped paren, CreationDate on
    the shared civil-date clock; b3%5==0 files carry NO /Info (the
    valid all-NULL state)."""
    import hashlib

    b = hashlib.md5(f"{i}:pdfi".encode()).digest()
    has_info = b[3] % 5 != 0
    stream = b"BT /F1 12 Tf (body) Tj ET"
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (f"<< /Length {len(stream)} >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"),
    }
    trailer_extra = ""
    if has_info:
        title = _PDF_TITLES[b[0] % 3]
        if b[1] % 2 == 1:
            tv = "<FEFF" + title.encode("utf-16-be").hex().upper() + ">"
        else:
            tv = "(" + title.replace("é", "\\351").replace("ï", "\\357") + ")"
        epoch = 1500000000 + 86400 * b[2] + 60 * b[4]
        days, rem = divmod(epoch, 86400)
        # reuse the rfc822 civil conversion for the D: string
        stamp = _rfc822(epoch)
        mm = re.match(
            r"\w{3}, (\d{2}) (\w{3}) (\d{4}) (\d{2}):(\d{2}):(\d{2})", stamp
        )
        d_str = (
            f"D:{mm.group(3)}{_MONTHS.index(mm.group(2)) + 1:02d}"
            f"{mm.group(1)}{mm.group(4)}{mm.group(5)}{mm.group(6)}"
        )
        objs[5] = (
            f"<< /Title {tv} /Author (dev \\({b[5] % 9}\\)) "
            f"/Producer (synth) /CreationDate ({d_str}) >>".encode()
        )
        trailer_extra = " /Info 5 0 R"
    out = bytearray(b"%PDF-1.4\n")
    for num in sorted(objs):
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    out += f"trailer\n<< /Root 1 0 R{trailer_extra} >>\n%%EOF\n".encode()
    return bytes(out)


def synth_pdf_with_info(docs: DataFrame) -> DataFrame:
    """Deterministic Info-carrying PDF per document (see
    :func:`_synth_pdf_with_info`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_pdf_with_info(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


def _epub_opf_metadata(blob: bytes) -> dict:
    """Dublin Core metadata of an EPUB's OPF package — title, creator,
    language, identifier, date (epoch s via the civil-date parse when
    ISO). Localname matching: dc: elements live in the Dublin Core
    namespace, and real books disagree on the prefix."""
    members = _zip_open_map(blob)
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("no META-INF/container.xml")
    opf_path = None
    for el in ElementTree.fromstring(container).iter():
        if _local(el.tag) == "rootfile":
            opf_path = el.get("full-path")
            break
    if not opf_path or opf_path not in members:
        raise ValueError("no OPF package")
    out = {"title": None, "creator": None, "language": None,
           "identifier": None, "published_s": None}
    for el in ElementTree.fromstring(members[opf_path]).iter():
        loc = _local(el.tag)
        if loc == "title" and out["title"] is None:
            out["title"] = el.text
        elif loc == "creator" and out["creator"] is None:
            out["creator"] = el.text
        elif loc == "language" and out["language"] is None:
            out["language"] = el.text
        elif loc == "identifier" and out["identifier"] is None:
            out["identifier"] = el.text
        elif loc == "date" and out["published_s"] is None:
            m = re.fullmatch(
                r"(\d{4})-(\d{2})-(\d{2})", (el.text or "").strip()
            )
            if m:
                out["published_s"] = _epoch_from_civil(
                    int(m.group(1)), int(m.group(2)), int(m.group(3)),
                    0, 0, 0,
                )
    return out


def epub_metadata(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, title, creator, language, identifier, published_ms) in
    one Arrow pass — the book-metadata leg completing the metadata
    trio (html_metadata / pdf_metadata / epub_metadata). Malformed
    blobs yield the all-NULL marker row."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "title", "creator", "language", "identifier",
                "published_ms"]
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    m = _epub_opf_metadata(bytes(blob))
                    rows.append({
                        "doc_id": did, "title": m["title"],
                        "creator": m["creator"],
                        "language": m["language"],
                        "identifier": m["identifier"],
                        "published_ms": None if m["published_s"] is None
                        else m["published_s"] * 1000,
                    })
                except (ValueError, IndexError, struct.error, zlib.error,
                        ElementTree.ParseError, TypeError):
                    rows.append({"doc_id": did, **{c: None
                                                   for c in cols[1:]}})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, content_col).mapInPandas(
        _meta,
        schema="doc_id bigint, title string, creator string, "
        "language string, identifier string, published_ms bigint",
    )


_EPUB_LANGS = ("en", "fr", "de", "ja")


def _synth_epub_meta_blob(i: int) -> bytes:
    """A minimal EPUB with Dublin Core metadata from md5(doc:epubm):
    dc: prefix rotates (dc: vs opf-default-declared dcterms-style),
    title with a non-ASCII word on b1%2, creator 'Author N', language
    over 4 codes, identifier a urn, dc:date an ISO civil date on the
    shared clock; b5%4==0 books omit creator AND date (NULL branch)."""
    import hashlib

    b = hashlib.md5(f"{i}:epubm".encode()).digest()
    title_word = ("café" if b[1] % 2 == 1 else "plain")
    epoch_day = (1 + b[2] % 9000)
    y, mo, d = 2000 + b[2] % 24, 1 + b[3] % 12, 1 + b[4] % 28
    has_extra = b[5] % 4 != 0
    prefix = "dc" if b[0] % 2 == 0 else "dcx"
    del epoch_day
    meta = [
        f"<{prefix}:title>{title_word} book {i}</{prefix}:title>",
        f"<{prefix}:language>{_EPUB_LANGS[b[6] % 4]}</{prefix}:language>",
        f"<{prefix}:identifier>urn:synth:{i}</{prefix}:identifier>",
    ]
    if has_extra:
        meta.insert(1, f"<{prefix}:creator>Author {b[7] % 10}"
                       f"</{prefix}:creator>")
        meta.append(
            f"<{prefix}:date>{y:04d}-{mo:02d}-{d:02d}</{prefix}:date>"
        )
    container = (
        "<?xml version=\"1.0\"?><container version=\"1.0\" xmlns=\"urn:"
        "oasis:names:tc:opendocument:xmlns:container\"><rootfiles>"
        "<rootfile full-path=\"content.opf\" media-type=\"application/"
        "oebps-package+xml\"/></rootfiles></container>"
    )
    opf = (
        "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/2007"
        f"/opf\" xmlns:{prefix}=\"http://purl.org/dc/elements/1.1/\" "
        "version=\"3.0\"><metadata>" + "".join(meta) + "</metadata>"
        "<manifest><item id=\"c0\" href=\"ch0.xhtml\" media-type="
        "\"application/xhtml+xml\"/></manifest>"
        "<spine><itemref idref=\"c0\"/></spine></package>"
    )
    ch = (b"<html xmlns=\"http://www.w3.org/1999/xhtml\"><body>"
          b"<p>body</p></body></html>")
    return build_zip([
        ("META-INF/container.xml", container.encode(), 8, False),
        ("content.opf", opf.encode(), 8, False),
        ("ch0.xhtml", ch, 8, False),
    ])


def synth_epub_with_meta(docs: DataFrame) -> DataFrame:
    """Deterministic metadata-carrying EPUB per document (see
    :func:`_synth_epub_meta_blob`)."""

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            yield pd.Series([_synth_epub_meta_blob(int(i)) for i in ids])

    return docs.select("doc_id", _blob("doc_id").alias("content"))


# ---------------------------------------------------------------------------
# RTF text extraction (r12)
# ---------------------------------------------------------------------------

# group-skipped destinations (their text is metadata, not body)
_RTF_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"header", b"headerl", b"headerr", b"footer", b"footerl",
    b"footerr", b"footnote",
}
_RTF_SYMBOLS = {
    b"tab": "\t", b"line": "\n", b"emdash": "\u2014",
    b"endash": "\u2013", b"lquote": "\u2018", b"rquote": "\u2019",
    b"ldblquote": "\u201c", b"rdblquote": "\u201d",
    b"bullet": "\u2022",
}
_RTF_CW_RE = re.compile(rb"\\([a-z]+)(-?\d+)?( ?)")


def rtf_to_text(blob: bytes) -> tuple[int, str]:
    """RTF → (n_paragraphs, text): control-word tokenizer with a
    group stack, ``{\\*`` ignorable destinations and the named
    metadata destinations (fonttbl/colortbl/stylesheet/info/pict/…)
    skipped whole, ``\\'xx`` hex bytes decoded through the declared
    ``\\ansicpgN`` codepage (single-byte codepages; cp1252 default),
    ``\\uN`` unicode with the group-scoped ``\\ucN`` fallback-skip
    (negative N wraps per spec; a ``\\'xx`` fallback counts as ONE
    skipped character), escaped ``\\{ \\} \\\\``, symbol words
    (tab/line/em-dash/smart quotes), ``\\binN`` raw-byte skip, and
    paragraph breaks from ``\\par``. Unbalanced groups or a truncated
    control refuse (ValueError) — the marker-row contract. Formatting
    words (\\b, \\fs24, …) are ignored; source CR/LF are not text."""
    if not blob.startswith(b"{\\rtf"):
        raise ValueError("not RTF")
    cp = "cp1252"
    m = re.search(rb"\\ansicpg(\d+)", blob[:256])
    if m is not None:
        import codecs

        try:
            codecs.lookup(f"cp{int(m.group(1))}")
            cp = f"cp{int(m.group(1))}"
        except LookupError:
            pass
    i, n = 0, len(blob)
    depth = 0
    uc_stack = [1]
    skip_until: int | None = None
    parts: list[str] = []
    paras: list[str] = []

    def emit(ch: str) -> None:
        if skip_until is None:
            parts.append(ch)

    while i < n:
        c = blob[i]
        if c == 0x7B:  # {
            depth += 1
            uc_stack.append(uc_stack[-1])
            i += 1
            if skip_until is None and blob[i : i + 2] == b"\\*":
                skip_until = depth
                i += 2
            continue
        if c == 0x7D:  # }
            if depth == 0:
                raise ValueError("unbalanced RTF group")
            if skip_until is not None and depth == skip_until:
                skip_until = None
            depth -= 1
            uc_stack.pop()
            i += 1
            continue
        if c == 0x5C:  # backslash
            nxt = blob[i + 1 : i + 2]
            if nxt == b"'":
                hx = blob[i + 2 : i + 4]
                if len(hx) < 2:
                    raise ValueError("truncated \\'xx escape")
                emit(bytes([int(hx, 16)]).decode(cp, "replace"))
                i += 4
                continue
            if nxt in (b"\\", b"{", b"}"):
                emit(nxt.decode("latin-1"))
                i += 2
                continue
            if nxt == b"~":
                emit("\u00a0")
                i += 2
                continue
            if nxt in (b"-", b"_", b"*", b":"):  # optional hyphen etc.
                i += 2
                continue
            cm = _RTF_CW_RE.match(blob, i)
            if cm is None:
                raise ValueError("bad RTF control")
            word, param = cm.group(1), cm.group(2)
            i = cm.end()
            if word == b"u":
                v = int(param)
                if v < 0:
                    v += 65536
                emit(chr(v))
                k = uc_stack[-1]  # skip the ANSI fallback chars
                while k > 0 and i < n:
                    if blob[i : i + 2] == b"\\'":
                        i += 4
                    elif blob[i] in (0x7B, 0x7D, 0x5C):
                        break  # delimiters end the fallback scope
                    else:
                        i += 1
                    k -= 1
            elif word == b"uc":
                uc_stack[-1] = int(param or 1)
            elif word == b"par":
                paras.append("".join(parts))
                parts = []
            elif word == b"bin":
                i += max(0, int(param or 0))
            elif word in _RTF_SYMBOLS:
                emit(_RTF_SYMBOLS[word])
            elif skip_until is None and word in _RTF_DESTS:
                skip_until = depth  # named destination: skip its group
            # any other word is formatting — ignored
            continue
        # plain text run up to the next delimiter
        j = i
        while j < n and blob[j] not in (0x5C, 0x7B, 0x7D):
            j += 1
        if skip_until is None:
            run = blob[i:j].replace(b"\r", b"").replace(b"\n", b"")
            if run:
                parts.append(run.decode(cp, "replace"))
        i = j
    if depth != 0:
        raise ValueError("unbalanced RTF group")
    paras.append("".join(parts))
    kept = [p.strip() for p in paras]
    kept = [p for p in kept if p]
    return len(kept), "\n".join(kept)


# ---------------------------------------------------------------------------
# 7z container — signature header, CRC-validated header walk, member
# metadata, Copy/LZMA1/LZMA2 payload decode through stdlib lzma (r12)
# ---------------------------------------------------------------------------

_7Z_SIG = b"7z\xbc\xaf\x27\x1c"


def _sz_num_enc(v: int) -> bytes:
    """7z variable-length number: i leading 1-bits in the first byte
    mean i little-endian extension bytes; the remaining 7-i first-byte
    bits hold the high part."""
    for i in range(8):
        if v < 1 << (7 * (i + 1)):
            first = ((0xFF << (8 - i)) & 0xFF) | (v >> (8 * i))
            return bytes([first]) + (v & ((1 << (8 * i)) - 1)).to_bytes(
                i, "little"
            )
    return b"\xff" + v.to_bytes(8, "little")


def _sz_num_dec(blob: bytes, pos: int) -> tuple[int, int]:
    """(value, next position) of one 7z number; truncation refuses."""
    if pos >= len(blob):
        raise ValueError("truncated 7z number")
    first = blob[pos]
    mask, value = 0x80, 0
    for i in range(8):
        if first & mask == 0:
            if pos + 1 + i > len(blob):
                raise ValueError("truncated 7z number")
            value |= (first & (mask - 1)) << (8 * i)
            return value, pos + 1 + i
        if pos + 1 + i >= len(blob):
            raise ValueError("truncated 7z number")
        value |= blob[pos + 1 + i] << (8 * i)
        mask >>= 1
    return value, pos + 9


_7Z_LZMA1_FILTER = {
    "id": None, "dict_size": 1 << 16, "lc": 3, "lp": 0, "pb": 2
}


def _lzma1_props(filt: dict) -> bytes:
    return bytes([(filt["pb"] * 5 + filt["lp"]) * 9 + filt["lc"]]) + (
        filt["dict_size"]
    ).to_bytes(4, "little")


# 7z coder ids this engine understands (7zFormat.txt / Methods.txt):
# Copy, LZMA1, LZMA2, AES-256+SHA-256 (06F10701), BCJ x86 (03030103).
_7Z_CODER_IDS = {
    b"\x00": "copy",
    b"\x03\x01\x01": "lzma",
    b"\x21": "lzma2",
    b"\x06\xf1\x07\x01": "aes256",
    b"\x03\x03\x01\x03": "bcj",
}
_7Z_CODER_CIDS = {v: k for k, v in _7Z_CODER_IDS.items()}


def _sz_aes_key(password: str, salt: bytes, cycles: int) -> bytes:
    """7z AES-256 key derivation (7-Zip 7zAes.cpp semantics): the
    password as UTF-16LE appended to the salt, then SHA-256 over
    2^cycles repetitions of (salt || password || counter_le64) fed
    into ONE running hash. cycles == 0x3F short-circuits to the raw
    zero-padded salt+password (the spec's no-KDF escape hatch)."""
    data = salt + password.encode("utf-16-le")
    if cycles == 0x3F:
        return (data + bytes(32))[:32]
    # r15 opt (guide §4.2): ONE running SHA-256 over the concatenated
    # (data ‖ counter_le64) repetitions — the per-iteration two-update
    # Python loop cost ~5× the hash itself at NumCyclesPower 14. The
    # buffer is built vectorized (rows of data bytes + a little-endian
    # u64 counter column) and hashed in one call; bit-identical input
    # stream by construction.
    n = 1 << cycles
    w = len(data)
    buf = np.empty((n, w + 8), dtype=np.uint8)
    buf[:, :w] = np.frombuffer(data, dtype=np.uint8)
    buf[:, w:] = np.arange(n, dtype="<u8").reshape(n, 1).view(np.uint8)
    return hashlib.sha256(buf.tobytes()).digest()


def _sz_aes_props(props: bytes) -> tuple[int, bytes, bytes]:
    """Decode 7z AES coder properties → (cycles, salt, iv padded to
    16). Byte 0 packs NumCyclesPower (low 6 bits) plus one-bit salt/
    iv base sizes (bits 7/6); byte 1 (present when either flag is
    set) carries 4-bit extensions of each."""
    if not props:
        raise ValueError("empty 7z AES properties")
    b0 = props[0]
    cycles = b0 & 0x3F
    salt_size = iv_size = 0
    pos = 1
    if b0 & 0xC0:
        if len(props) < 2:
            raise ValueError("truncated 7z AES properties")
        b1 = props[1]
        salt_size = ((b0 >> 7) & 1) + (b1 >> 4)
        iv_size = ((b0 >> 6) & 1) + (b1 & 0x0F)
        pos = 2
    if pos + salt_size + iv_size > len(props):
        raise ValueError("7z AES salt/iv past properties end")
    salt = props[pos : pos + salt_size]
    iv = props[pos + salt_size : pos + salt_size + iv_size]
    return cycles, salt, (iv + bytes(16))[:16]


def build_7z(members: list[tuple[str, bytes, str]], *,
             encoded_header: bool = False,
             passwords: dict[str, str] | None = None,
             aes_cycles: int = 14,
             solid: str | None = None) -> bytes:
    """Write a 7z archive from (name, data, method) tuples, method in
    {'copy', 'lzma', 'lzma2'} plus the chained forms 'aes+copy',
    'aes+lzma', 'aes+lzma2' (AES-256-CBC over the inner stream, key
    derived per :func:`_sz_aes_key` from ``passwords[name]``, salt/iv
    deterministic from the member so the archive bytes are replayable)
    and 'bcj+lzma' (x86 branch-convert filter before LZMA — stdlib
    ``lzma.FILTER_X86`` chain); empty payloads become EmptyStream file
    entries (no folder). One folder per non-empty member — two-coder
    folders carry one bind pair (the 7-Zip layout: coder 0 is the
    final-stage decoder, coder 1 consumes the pack stream; out sizes
    one per out-stream) — raw (uncompressed) header with PackInfo /
    UnpackInfo(+CRC) / FilesInfo(kEmptyStream + UTF-16LE kName),
    CRC32s over start header and next header — the synth-side partner
    of :func:`sevenzip_members`, byte-layout pinned to the public
    py7zr/7-Zip DOC spec by the hand-built golden archive in
    tests/test_documents.py. ``encoded_header`` compresses the header
    into an appended LZMA pack stream behind a kEncodedHeader
    StreamsInfo — the layout the real 7z CLI writes by default
    (r13). ``solid`` packs every non-empty member into ONE folder of
    the given method, with per-member sizes/CRCs in a SubStreamsInfo
    block — the real CLI's default for small files (r14; an AES
    solid method takes its password from ``passwords['*']``)."""
    import lzma

    from hadoopxmlextractor_spark.operators import aes as A

    def _inner(data: bytes, method: str) -> tuple[bytes, bytes]:
        if method == "copy":
            return data, b""
        if method == "lzma":
            f = dict(_7Z_LZMA1_FILTER, id=lzma.FILTER_LZMA1)
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[f])
            return c.compress(data) + c.flush(), _lzma1_props(f)
        if method == "lzma2":
            f = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16}
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[f])
            return c.compress(data) + c.flush(), bytes([16])  # 2^16
        raise ValueError(f"unknown 7z method {method}")

    packed: list[bytes] = []
    # per folder: coder list [(cid, props)] in coder-index order,
    # out sizes per out-stream (same order), final-data CRC
    folders: list[tuple[list[tuple[bytes, bytes]], list[int], int]] = []
    names: list[str] = []
    empties: list[bool] = []
    # solid mode (r14): every non-empty member lands in ONE folder of
    # the given method; per-member sizes/CRCs move to SubStreamsInfo
    # (the real CLI's default for small files). An AES solid method
    # takes its password from passwords['*'].
    sub_info: tuple[list[int], list[int]] | None = None
    if solid is not None:
        datas = []
        for name, data, _m in members:
            names.append(name)
            empties.append(len(data) == 0)
            if data:
                datas.append(data)
        joined = b"".join(datas)
        if solid.startswith("aes+"):
            inner_comp, iprops = _inner(joined, solid[4:])
            pw = (passwords or {}).get("*")
            if pw is None:
                raise ValueError("no '*' password for solid AES")
            salt = hashlib.sha256(b"7z-salt*" + joined).digest()[:8]
            iv = hashlib.sha256(b"7z-iv*" + joined).digest()[:16]
            key = _sz_aes_key(pw, salt, aes_cycles)
            pad = (-len(inner_comp)) % 16
            comp = A.cbc_encrypt_nopad(key, iv, inner_comp + bytes(pad))
            coders_s = [
                (_7Z_CODER_CIDS[solid[4:]], iprops),
                (_7Z_CODER_CIDS["aes256"],
                 bytes([aes_cycles | 0xC0, 0x7F]) + salt + iv),
            ]
            osizes = [len(joined), len(inner_comp)]
        else:
            comp, props = _inner(joined, solid)
            coders_s = [(_7Z_CODER_CIDS[solid], props)]
            osizes = [len(joined)]
        packed.append(comp)
        folders.append((coders_s, osizes, 0))
        sub_info = (
            [len(d) for d in datas],
            [zlib.crc32(d) for d in datas],
        )
    for name, data, method in ([] if solid is not None else members):
        names.append(name)
        if len(data) == 0:
            empties.append(True)
            continue
        empties.append(False)
        if method.startswith("aes+"):
            inner_comp, iprops = _inner(data, method[4:])
            pw = (passwords or {}).get(name)
            if pw is None:
                raise ValueError(f"no password for AES member {name}")
            salt = hashlib.sha256(
                b"7z-salt" + name.encode() + data
            ).digest()[:8]
            iv = hashlib.sha256(
                b"7z-iv" + name.encode() + data
            ).digest()[:16]
            key = _sz_aes_key(pw, salt, aes_cycles)
            pad = (-len(inner_comp)) % 16
            comp = A.cbc_encrypt_nopad(key, iv, inner_comp + bytes(pad))
            aprops = bytes([aes_cycles | 0xC0, 0x7F]) + salt + iv
            coders = [
                (_7Z_CODER_CIDS[method[4:]], iprops),
                (_7Z_CODER_CIDS["aes256"], aprops),
            ]
            osizes = [len(data), len(inner_comp)]
        elif method == "bcj+lzma":
            f = dict(_7Z_LZMA1_FILTER, id=lzma.FILTER_LZMA1)
            c = lzma.LZMACompressor(
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_X86}, f],
            )
            comp = c.compress(data) + c.flush()
            coders = [
                (_7Z_CODER_CIDS["bcj"], b""),
                (_7Z_CODER_CIDS["lzma"], _lzma1_props(f)),
            ]
            osizes = [len(data), len(data)]  # BCJ is size-preserving
        else:
            comp, props = _inner(data, method)
            coders = [(_7Z_CODER_CIDS[method], props)]
            osizes = [len(data)]
        packed.append(comp)
        folders.append((coders, osizes, zlib.crc32(data)))

    hdr = bytearray(b"\x01")  # kHeader
    if folders:
        hdr += b"\x04"  # kMainStreamsInfo
        hdr += b"\x06" + _sz_num_enc(0) + _sz_num_enc(len(packed))  # kPackInfo
        hdr += b"\x09" + b"".join(_sz_num_enc(len(c)) for c in packed)
        hdr += b"\x00"
        hdr += b"\x07"  # kUnpackInfo
        hdr += b"\x0b" + _sz_num_enc(len(folders)) + b"\x00"  # kFolder, internal
        for coders, _os, _crc in folders:
            hdr += _sz_num_enc(len(coders))
            for cid, props in coders:
                flag = len(cid) | (0x20 if props else 0)
                hdr += bytes([flag]) + cid
                if props:
                    hdr += _sz_num_enc(len(props)) + props
            # simple 1-in-1-out coders: out-streams = coders, so a
            # two-coder chain carries exactly one bind pair — coder
            # 0's input fed by coder 1's output; the single packed
            # stream index is implicit (the unbound in-stream)
            for k in range(len(coders) - 1):
                hdr += _sz_num_enc(k) + _sz_num_enc(k + 1)
        hdr += b"\x0c" + b"".join(
            b"".join(_sz_num_enc(s) for s in os_) for _c, os_, _r in folders
        )
        if sub_info is None:
            hdr += b"\x0a\x01" + b"".join(
                crc.to_bytes(4, "little") for _c, _os, crc in folders
            )
        hdr += b"\x00"  # end kUnpackInfo
        if sub_info is not None:
            sizes_s, crcs_s = sub_info
            hdr += b"\x08"  # kSubStreamsInfo
            hdr += b"\x0d" + _sz_num_enc(len(sizes_s))
            hdr += b"\x09" + b"".join(
                _sz_num_enc(v) for v in sizes_s[:-1]
            )
            hdr += b"\x0a\x01" + b"".join(
                c.to_bytes(4, "little") for c in crcs_s
            )
            hdr += b"\x00"  # end kSubStreamsInfo
        hdr += b"\x00"  # end kMainStreamsInfo
    hdr += b"\x05" + _sz_num_enc(len(names))  # kFilesInfo
    if any(empties):
        bits = bytearray((len(names) + 7) // 8)
        for k, e in enumerate(empties):
            if e:
                bits[k // 8] |= 0x80 >> (k % 8)
        hdr += b"\x0e" + _sz_num_enc(len(bits)) + bytes(bits)
    nameblob = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n in names
    )
    hdr += b"\x11" + _sz_num_enc(len(nameblob)) + nameblob
    hdr += b"\x00"  # end kFilesInfo... kHeader end
    hdr += b"\x00"
    body = b"".join(packed)
    next_header = bytes(hdr)
    if encoded_header:
        # the 7z CLI's default layout: the header itself is an
        # LZMA-compressed pack stream appended to the body; the
        # "next header" region carries kEncodedHeader + a StreamsInfo
        # describing it (PackPos points past the member streams)
        f = dict(_7Z_LZMA1_FILTER, id=lzma.FILTER_LZMA1)
        c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[f])
        hdr_packed = c.compress(next_header) + c.flush()
        props = _lzma1_props(f)
        enc_info = bytearray(b"\x17")
        enc_info += (
            b"\x06" + _sz_num_enc(len(body))
            + _sz_num_enc(1)  # PackPos, 1 pack stream
            + b"\x09" + _sz_num_enc(len(hdr_packed)) + b"\x00"
        )
        enc_info += b"\x07\x0b" + _sz_num_enc(1) + b"\x00"
        enc_info += (
            _sz_num_enc(1) + bytes([3 | 0x20]) + b"\x03\x01\x01"
            + _sz_num_enc(len(props)) + props
        )
        enc_info += b"\x0c" + _sz_num_enc(len(next_header))
        enc_info += b"\x0a\x01" + zlib.crc32(next_header).to_bytes(
            4, "little"
        )
        enc_info += b"\x00\x00"
        body += hdr_packed
        next_header = bytes(enc_info)
    next_off, next_size = len(body), len(next_header)
    start = (
        next_off.to_bytes(8, "little") + next_size.to_bytes(8, "little")
        + zlib.crc32(next_header).to_bytes(4, "little")
    )
    return (
        _7Z_SIG + b"\x00\x04"
        + zlib.crc32(start).to_bytes(4, "little") + start
        + body + next_header
    )


def _sz_streams_info(hdr: bytes, pos: int):
    """Parse one 7z StreamsInfo (PackInfo + UnpackInfo through its
    kEnd) → (pack_pos, pack_sizes, coders, unpack_sizes, crcs, pos
    after the StreamsInfo kEnd). Shared by the main header and the
    kEncodedHeader form (r13). ``coders`` holds one DECODE-ORDER
    chain per folder — [(method, props, out_size), ...] from the
    packed stream to the folder output — so simple multi-coder
    folders (AES-256 before LZMA, BCJ x86 after it; r14) parse along
    their bind pairs. Layouts this engine does not support (external
    folders, complex multi-stream coders, >1 pack stream per folder,
    SubStreamsInfo, pack/folder mismatches) refuse."""
    pack_sizes: list[int] = []
    coders: list[list[tuple[str, bytes, int]]] = []
    unpack_sizes: list[int] = []
    crcs: list[int | None] = []
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x06:
        raise ValueError("7z PackInfo expected")
    pack_pos, pos = _sz_num_dec(hdr, pos)
    n_pack, pos = _sz_num_dec(hdr, pos)
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x09:
        raise ValueError("7z pack sizes expected")
    for _ in range(n_pack):
        v, pos = _sz_num_dec(hdr, pos)
        pack_sizes.append(v)
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x00:
        raise ValueError("7z PackInfo kEnd expected")
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x07:
        raise ValueError("7z UnpackInfo expected")
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x0B:
        raise ValueError("7z kFolder expected")
    n_folders, pos = _sz_num_dec(hdr, pos)
    if hdr[pos] != 0:
        raise ValueError("external 7z folders unsupported")
    pos += 1
    folder_specs: list[tuple[list[tuple[str, bytes]],
                             list[tuple[int, int]], int]] = []
    for _ in range(n_folders):
        n_coders, pos = _sz_num_dec(hdr, pos)
        if not 1 <= n_coders <= 4:
            raise ValueError("unsupported 7z coder count")
        fcoders: list[tuple[str, bytes]] = []
        for _c in range(n_coders):
            flag = hdr[pos]
            pos += 1
            idlen = flag & 0x0F
            cid = hdr[pos : pos + idlen]
            pos += idlen
            if flag & 0x10:
                raise ValueError("complex 7z coders unsupported")
            props = b""
            if flag & 0x20:
                psize, pos = _sz_num_dec(hdr, pos)
                props = hdr[pos : pos + psize]
                pos += psize
            fcoders.append((_7Z_CODER_IDS.get(cid, cid.hex()), props))
        # simple 1-in-1-out coders: in/out-stream index k belongs to
        # coder k; NumBindPairs = out-streams - 1, and the single
        # packed stream (more than one refuses) is the unbound input
        pairs: list[tuple[int, int]] = []
        for _b in range(n_coders - 1):
            ii, pos = _sz_num_dec(hdr, pos)
            oi, pos = _sz_num_dec(hdr, pos)
            pairs.append((ii, oi))
        bound_in = {ii for ii, _oi in pairs}
        unbound = [i for i in range(n_coders) if i not in bound_in]
        if len(unbound) != 1:
            raise ValueError("multi-pack-stream 7z folders unsupported")
        folder_specs.append((fcoders, pairs, unbound[0]))
    pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x0C:
        raise ValueError("7z coders unpack sizes expected")
    for fcoders, pairs, packed_idx in folder_specs:
        sizes: list[int] = []
        for _ in fcoders:
            v, pos = _sz_num_dec(hdr, pos)
            sizes.append(v)
        # walk the bind-pair graph from the packed stream's coder to
        # the folder output → the decode-order chain
        chain: list[tuple[str, bytes, int]] = []
        seen: set[int] = set()
        cur = packed_idx
        while True:
            if cur in seen or cur >= len(fcoders):
                raise ValueError("7z bind-pair cycle")
            seen.add(cur)
            m, p = fcoders[cur]
            chain.append((m, p, sizes[cur]))
            nxt = next((ii for ii, oi in pairs if oi == cur), None)
            if nxt is None:
                break
            cur = nxt
        if len(seen) != len(fcoders):
            raise ValueError("disconnected 7z coder graph")
        bound_out = {oi for _ii, oi in pairs}
        main = [i for i in range(len(fcoders)) if i not in bound_out]
        if main != [cur]:
            raise ValueError("7z folder output mismatch")
        coders.append(chain)
        unpack_sizes.append(sizes[cur])
    pid, pos = _sz_num_dec(hdr, pos)
    if pid == 0x0A:  # kCRC
        if hdr[pos] != 1:
            raise ValueError("partial 7z CRC vectors unsupported")
        pos += 1
        for _ in range(n_folders):
            crcs.append(int.from_bytes(hdr[pos : pos + 4], "little"))
            pos += 4
        pid, pos = _sz_num_dec(hdr, pos)
    else:
        crcs = [None] * n_folders
    if pid != 0x00:
        raise ValueError("7z UnpackInfo kEnd expected")
    if len(pack_sizes) != n_folders:
        # multi-stream folders: one folder consuming several pack
        # streams — refuse explicitly instead of IndexError-ing
        # below (r12 ADVICE)
        raise ValueError("7z pack/folder count mismatch")
    # SubStreamsInfo (r14 — found REFUSING on a real 7z CLI archive:
    # solid folders pack several files into one folder and move the
    # per-file sizes/CRCs here; even single-file folders from the
    # real CLI carry their CRCs in this block, not UnpackInfo):
    # per-folder substream counts, all-but-last substream sizes
    # (the last derives from the folder's unpack size), and CRCs for
    # every substream whose digest isn't already pinned by a
    # single-stream folder's kCRC above
    n_sub = [1] * n_folders
    sub_sizes: list[list[int]] | None = None
    sub_crcs: list[list[int | None]] | None = None
    pid, pos = _sz_num_dec(hdr, pos)
    if pid == 0x08:  # kSubStreamsInfo
        pid, pos = _sz_num_dec(hdr, pos)
        if pid == 0x0D:  # kNumUnpackStream
            n_sub = []
            for _ in range(n_folders):
                v, pos = _sz_num_dec(hdr, pos)
                n_sub.append(v)
            pid, pos = _sz_num_dec(hdr, pos)
        sub_sizes = []
        if pid == 0x09:  # kSize: all but the last stream per folder
            for k in range(n_folders):
                sizes_k = []
                for _ in range(max(0, n_sub[k] - 1)):
                    v, pos = _sz_num_dec(hdr, pos)
                    sizes_k.append(v)
                last = unpack_sizes[k] - sum(sizes_k)
                if last < 0:
                    raise ValueError("7z substream sizes exceed folder")
                sizes_k.append(last)
                sub_sizes.append(sizes_k[: n_sub[k]])
            pid, pos = _sz_num_dec(hdr, pos)
        else:
            for k in range(n_folders):
                if n_sub[k] > 1:
                    raise ValueError(
                        "7z multi-stream folder without kSize"
                    )
                sub_sizes.append(
                    [unpack_sizes[k]] if n_sub[k] else []
                )
        # a substream's digest is already known iff its folder has a
        # kCRC above AND holds exactly one stream
        sub_crcs = [
            [crcs[k] if (n_sub[k] == 1 and crcs[k] is not None)
             else None] * n_sub[k]
            for k in range(n_folders)
        ]
        if pid == 0x0A:  # kCRC over the unknown-digest streams
            unknown = [
                (k, j) for k in range(n_folders)
                for j in range(n_sub[k])
                if sub_crcs[k][j] is None
            ]
            if hdr[pos] != 1:
                raise ValueError("partial 7z CRC vectors unsupported")
            pos += 1
            for k, j in unknown:
                sub_crcs[k][j] = int.from_bytes(
                    hdr[pos : pos + 4], "little"
                )
                pos += 4
            pid, pos = _sz_num_dec(hdr, pos)
        if pid != 0x00:
            raise ValueError("7z SubStreamsInfo kEnd expected")
        pid, pos = _sz_num_dec(hdr, pos)
    if sub_sizes is None:
        sub_sizes = [[unpack_sizes[k]] for k in range(n_folders)]
        sub_crcs = [[crcs[k]] for k in range(n_folders)]
    if pid != 0x00:
        raise ValueError("7z StreamsInfo kEnd expected")
    return (pack_pos, pack_sizes, coders, unpack_sizes, crcs,
            sub_sizes, sub_crcs, pos)


def _sz_decode_stream(method: str, props: bytes, comp: bytes,
                      usize: int) -> bytes | None:
    """One pack stream decoded (Copy passthrough, LZMA1/LZMA2 raw
    through stdlib lzma); None for coders this engine cannot run.
    Corrupt compressed data refuses as ValueError — the caller's
    marker-row contract, not a raw LZMAError."""
    import lzma

    try:
        if method == "copy":
            return comp
        if method == "lzma" and len(props) == 5:
            filt = {
                "id": lzma.FILTER_LZMA1,
                "lc": props[0] % 9,
                "lp": (props[0] // 9) % 5,
                "pb": props[0] // 45,
                "dict_size": int.from_bytes(props[1:5], "little"),
            }
            d = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW, filters=[filt]
            )
            return d.decompress(comp, max_length=usize)
        if method == "lzma2" and len(props) == 1:
            d = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA2,
                          "dict_size": 1 << min(31, props[0])}],
            )
            return d.decompress(comp, max_length=usize)
    except lzma.LZMAError as exc:
        raise ValueError(f"corrupt 7z {method} stream") from exc
    return None


def _sz_decode_chain(chain: list[tuple[str, bytes, int]], comp: bytes,
                     password: str | None = None) -> bytes | None:
    """Run one folder's decode-order coder chain over its pack
    stream. AES-256 steps (7z coder 06F10701) derive the key per
    :func:`_sz_aes_key` and CBC-decrypt with the properties' salt/iv,
    trimming the zero pad to the step's declared out size; a chain
    whose AES step has no password returns None (encrypted — the
    caller reports the member surface without payload). An LZMA step
    feeding a BCJ x86 step runs as ONE stdlib raw decompressor with
    the FILTER_X86 chain (the stdlib cannot run the branch filter
    standalone). None for coders this engine cannot run; corrupt
    data — including wrong-password AES garbage hitting the inner
    LZMA — refuses as ValueError (marker/crc contract)."""
    import lzma

    from hadoopxmlextractor_spark.operators import aes as A

    data = comp
    i = 0
    while i < len(chain):
        method, props, osize = chain[i]
        if method == "aes256":
            if password is None:
                return None
            cycles, salt, iv = _sz_aes_props(props)
            if len(data) % 16 or not data:
                raise ValueError("7z AES stream not block-aligned")
            key = _sz_aes_key(password, salt, cycles)
            data = A.cbc_decrypt_nopad(key, iv, data)[:osize]
        elif (method == "lzma" and i + 1 < len(chain)
              and chain[i + 1][0] == "bcj"):
            f = dict(_7Z_LZMA1_FILTER, id=lzma.FILTER_LZMA1)
            if len(props) == 5:
                f["lc"] = props[0] % 9
                f["lp"] = (props[0] // 9) % 5
                f["pb"] = props[0] // 45
                f["dict_size"] = int.from_bytes(props[1:5], "little")
            i += 1  # the BCJ step is fused into this decompressor
            osize = chain[i][2]
            try:
                d = lzma.LZMADecompressor(
                    format=lzma.FORMAT_RAW,
                    filters=[{"id": lzma.FILTER_X86}, f],
                )
                data = d.decompress(data, max_length=osize)
            except lzma.LZMAError as exc:
                raise ValueError("corrupt 7z bcj+lzma stream") from exc
        elif method in ("copy", "lzma", "lzma2"):
            data = _sz_decode_stream(method, props, data, osize)
            if data is None:
                return None
        else:
            return None
        if len(data) != osize:
            raise ValueError("7z coder output size mismatch")
        i += 1
    return data


def _sz_prop_blocks(hdr: bytes, pos: int):
    """Yield (property id, payload span) until kEnd inside kFilesInfo."""
    while True:
        pid, pos = _sz_num_dec(hdr, pos)
        if pid == 0x00:
            return
        size, pos = _sz_num_dec(hdr, pos)
        if pos + size > len(hdr):
            raise ValueError("7z property past header end")
        yield pid, hdr[pos : pos + size]
        pos += size


def sevenzip_members(blob: bytes, *, with_data: bool = False,
                     password: str | None = None) -> list[dict]:
    """Member metadata of a 7z archive with BOTH header CRCs verified
    before any field is trusted: one dict per file with name, method
    (copy/lzma/lzma2/hex id), packed/uncompressed sizes, the declared
    CRC32, crc_ok over the ACTUALLY-decoded payload (Copy passthrough,
    LZMA1/LZMA2 raw streams through stdlib ``lzma`` — an independent
    decoder, not this module's writer), and the first 16 decoded
    characters. Empty-stream files report size 0 / method None.
    Encoded (LZMA-compressed) headers, out-of-range offsets, bad
    CRCs, and unknown layout refuse (ValueError) — marker-row
    contract. Multi-coder folders decode along their bind pairs
    (r14): AES-256-protected members (coder 06F10701 before the
    codec) decrypt under ``password`` — method reads
    'aes256+<codec>'; without a password the member surface still
    reports (the 7z header is never encrypted in this layout) with
    crc_ok/head None, and a WRONG password yields crc_ok 0 (CRC
    mismatch on aes256+copy, inner-codec refusal caught per member
    otherwise). BCJ x86 chains ('lzma+bcj') decode through the
    stdlib FILTER_X86 raw chain. The archive tier's 7z leg beside
    ZIP/ZIP64/TAR/gz/bz2/xz (`documents.py` r11). ``with_data=True``
    adds the full decoded payload under ``data`` (the member-access
    path the 7z→documents capstone feeds into document_text)."""
    import lzma

    if blob[:6] != _7Z_SIG:
        raise ValueError("not a 7z archive")
    if len(blob) < 32:
        raise ValueError("truncated 7z signature header")
    if zlib.crc32(blob[12:32]) != int.from_bytes(blob[8:12], "little"):
        raise ValueError("7z start-header CRC mismatch")
    next_off = int.from_bytes(blob[12:20], "little")
    next_size = int.from_bytes(blob[20:28], "little")
    if next_off + next_size + 32 > len(blob):
        raise ValueError("7z next header out of range")
    hdr = blob[32 + next_off : 32 + next_off + next_size]
    if zlib.crc32(hdr) != int.from_bytes(blob[28:32], "little"):
        raise ValueError("7z next-header CRC mismatch")
    if not hdr[:1]:
        raise ValueError("empty 7z header")
    if hdr[0] == 0x17:
        # kEncodedHeader — the 7z CLI's DEFAULT layout (r13): the
        # real header is itself an LZMA pack stream appended past the
        # member streams, described by a StreamsInfo; decode it
        # (CRC-verified) and continue with the plain form
        (hp, hsizes, hcoders, husizes, hcrcs, _hss, _hsc,
         _) = _sz_streams_info(hdr, 1)
        if len(hcoders) != 1:
            raise ValueError("multi-stream encoded 7z header")
        if 32 + hp + hsizes[0] > len(blob):
            raise ValueError("7z encoded header past EOF")
        comp = blob[32 + hp : 32 + hp + hsizes[0]]
        data = _sz_decode_chain(hcoders[0], comp)
        if data is None:
            raise ValueError("unsupported encoded-header coder")
        if len(data) != husizes[0]:
            raise ValueError("7z encoded-header size mismatch")
        if hcrcs[0] is not None and zlib.crc32(data) != hcrcs[0]:
            raise ValueError("7z encoded-header CRC mismatch")
        hdr = data
        if not hdr[:1]:
            raise ValueError("empty decoded 7z header")
    if hdr[0] != 0x01:
        raise ValueError("unknown 7z header id")

    pos = 1
    pack_sizes: list[int] = []
    coders: list[list[tuple[str, bytes, int]]] = []
    unpack_sizes: list[int] = []
    crcs: list[int | None] = []
    sub_sizes: list[list[int]] = []
    sub_crcs: list[list[int | None]] = []
    names: list[str] = []
    empties: list[bool] = []
    pack_pos = 0
    pid, pos = _sz_num_dec(hdr, pos)
    if pid == 0x04:  # kMainStreamsInfo
        (pack_pos, pack_sizes, coders, unpack_sizes, crcs,
         sub_sizes, sub_crcs, pos) = _sz_streams_info(hdr, pos)
        pid, pos = _sz_num_dec(hdr, pos)
    if pid != 0x05:
        raise ValueError("7z FilesInfo expected")
    n_files, pos = _sz_num_dec(hdr, pos)
    for prop_id, payload in _sz_prop_blocks(hdr, pos):
        if prop_id == 0x0E:  # kEmptyStream
            empties = [
                bool(payload[k // 8] & (0x80 >> (k % 8)))
                for k in range(n_files)
            ]
        elif prop_id == 0x11:  # kName
            if payload[:1] != b"\x00":
                raise ValueError("external 7z names unsupported")
            text = payload[1:].decode("utf-16-le")
            names = text.split("\x00")[:-1]
    if len(names) != n_files:
        raise ValueError("7z name count mismatch")
    if not empties:
        empties = [False] * n_files
    if sum(1 for e in empties if not e) != sum(
        len(ss) for ss in sub_sizes
    ):
        raise ValueError("7z substream/file count mismatch")

    # decode each folder ONCE; solid folders (several files per
    # folder via SubStreamsInfo — the real CLI's default for small
    # files; r14) slice their output by the substream sizes
    pack_off = 32 + pack_pos
    if pack_off + sum(pack_sizes) > len(blob):
        raise ValueError("7z pack streams past EOF")
    flat: list[tuple[int, int, int]] = []  # (folder, sub idx, offset)
    for k2, sizes2 in enumerate(sub_sizes):
        off2 = 0
        for j, sz2 in enumerate(sizes2):
            flat.append((k2, j, off2))
            off2 += sz2
        if off2 != unpack_sizes[k2]:
            raise ValueError("7z substream sizes exceed folder")
    folder_cache: dict[int, bytes | None | bool] = {}

    def _folder_data(k2: int) -> bytes | None | bool:
        """Decoded folder bytes; None = unsupported/no password;
        False = wrong-password garbage (per-folder verdict)."""
        if k2 in folder_cache:
            return folder_cache[k2]
        chain2 = coders[k2]
        has_aes2 = any(m == "aes256" for m, _p, _s in chain2)
        comp2 = blob[
            pack_off + sum(pack_sizes[:k2]) :
            pack_off + sum(pack_sizes[: k2 + 1])
        ]
        try:
            d2 = _sz_decode_chain(chain2, comp2, password=password)
            if d2 is not None and len(d2) != unpack_sizes[k2]:
                raise ValueError("7z unpack size mismatch")
        except ValueError:
            if not (has_aes2 and password is not None):
                raise
            # wrong password: the AES step succeeds but the inner
            # codec chokes on garbage — a per-folder verdict (the
            # header itself is unencrypted), not an archive refusal
            d2 = False
        folder_cache[k2] = d2
        return d2

    out: list[dict] = []
    stream_idx = 0
    for k in range(n_files):
        if empties[k]:
            row = {
                "name": names[k], "method": None, "packed": 0,
                "size": 0, "crc_ok": None, "head": "",
            }
            if with_data:
                row["data"] = b""
            out.append(row)
            continue
        fk, sj, soff = flat[stream_idx]
        stream_idx += 1
        chain = coders[fk]
        method = "+".join(m for m, _p, _s in chain)
        usize = sub_sizes[fk][sj]
        psize = pack_sizes[fk] if len(sub_sizes[fk]) == 1 else 0
        fdata = _folder_data(fk)
        crc_ok = None
        head = None
        data = None
        if fdata is False:
            crc_ok = False
        elif fdata is not None:
            data = bytes(fdata[soff : soff + usize])
            crc_ok = (
                zlib.crc32(data) == sub_crcs[fk][sj]
                if sub_crcs[fk][sj] is not None else None
            )
            head = data[:16].decode("utf-8", "replace")
        row = {
            "name": names[k], "method": method, "packed": psize,
            "size": usize, "crc_ok": crc_ok, "head": head,
        }
        if with_data:
            row["data"] = data
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# CFB / OLE2 compound files ([MS-CFB]) — the container under legacy
# .doc/.xls/.ppt/MSI — directory walk, FAT + miniFAT stream reads,
# SummaryInformation ([MS-OLEPS]) metadata (r12)
# ---------------------------------------------------------------------------

_CFB_MAGIC = bytes.fromhex("d0cf11e0a1b11ae1")
_CFB_END = 0xFFFFFFFE
_CFB_FREE = 0xFFFFFFFF
_CFB_CUTOFF = 4096  # streams below this live in the mini stream


def build_cfb(streams: list[tuple[str, bytes]], *,
              sector_size: int = 512) -> bytes:
    """Write a compound file from (name, data) streams — small
    streams through the MINI stream + miniFAT (the spec's mandatory
    path for anything under 4096 bytes), large ones through the
    regular FAT; DIFAT held entirely in the header (≤109 FAT sectors
    — far beyond any fixture). ``sector_size`` 512 writes the
    version-3 layout; 4096 the version-4 one (MSI and large modern
    Office files — the header pads to a full sector and sector 0
    starts at 4096, the layout the r13 reader fix covers). The
    synth-side partner of :func:`cfb_members`."""
    if sector_size not in (512, 4096):
        raise ValueError("CFB sector size must be 512 or 4096")
    SS, MS = sector_size, 64

    def chunks(data: bytes, size: int) -> list[bytes]:
        return [
            data[k : k + size].ljust(size, b"\x00")
            for k in range(0, max(len(data), 1), size)
        ]

    # --- mini stream: concatenation of 64-byte mini sectors
    mini_data = bytearray()
    mini_fat: list[int] = []
    starts: dict[str, int] = {}
    for name, data in streams:
        if len(data) >= _CFB_CUTOFF:
            continue
        cs = chunks(data, MS)
        starts[name] = len(mini_fat)
        for k in range(len(cs)):
            mini_fat.append(
                len(mini_fat) + 1 if k + 1 < len(cs) else _CFB_END
            )
        mini_data += b"".join(cs)

    # --- sector layout: [FAT][directory][miniFAT][mini stream][big]
    dir_entries = 1 + len(streams)
    n_dir = (dir_entries * 128 + SS - 1) // SS
    n_minifat = (len(mini_fat) * 4 + SS - 1) // SS if mini_fat else 0
    n_mini = (len(mini_data) + SS - 1) // SS
    big = [(n, d) for n, d in streams if len(d) >= _CFB_CUTOFF]
    n_big = sum((len(d) + SS - 1) // SS for _n, d in big)
    n_fat_guess = 1
    while True:
        total = n_fat_guess + n_dir + n_minifat + n_mini + n_big
        if (total * 4 + SS - 1) // SS <= n_fat_guess:
            break
        n_fat_guess += 1
    n_fat = n_fat_guess
    fat_first = 0
    dir_first = n_fat
    minifat_first = dir_first + n_dir
    mini_first = minifat_first + n_minifat
    big_first = mini_first + n_mini
    total = n_fat + n_dir + n_minifat + n_mini + n_big

    fat = [_CFB_FREE] * (((total * 4 + SS - 1) // SS) * (SS // 4))
    for s in range(n_fat):
        fat[s] = 0xFFFFFFFD  # FATSECT
    def chain(first: int, count: int) -> None:
        for k in range(count):
            fat[first + k] = first + k + 1 if k + 1 < count else _CFB_END

    chain(dir_first, n_dir)
    if n_minifat:
        chain(minifat_first, n_minifat)
    if n_mini:
        chain(mini_first, n_mini)
    big_starts: dict[str, int] = {}
    at = big_first
    for name, data in big:
        cnt = (len(data) + SS - 1) // SS
        big_starts[name] = at
        chain(at, cnt)
        at += cnt

    def dirent(name: str, typ: int, start: int, size: int,
               child: int = _CFB_FREE, right: int = _CFB_FREE) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = nm.ljust(64, b"\x00")
        e += struct.pack("<H", len(nm))
        e += struct.pack("<BB", typ, 1)  # type, black
        e += struct.pack("<iii", -1, right if right != _CFB_FREE else -1,
                         child if child != _CFB_FREE else -1)
        e += b"\x00" * 16 + b"\x00" * 4  # CLSID, state
        e += b"\x00" * 16  # timestamps
        e += struct.pack("<Iq", start & 0xFFFFFFFF, size)
        return e

    dirblob = bytearray()
    dirblob += dirent(
        "Root Entry", 5, mini_first if n_mini else _CFB_END,
        len(mini_data), child=1 if streams else _CFB_FREE,
    )
    for k, (name, data) in enumerate(streams):
        start = (
            big_starts[name] if len(data) >= _CFB_CUTOFF
            else starts.get(name, _CFB_END)
        )
        right = k + 2 if k + 1 < len(streams) else _CFB_FREE
        dirblob += dirent(name, 2, start, len(data), right=right)
    dirblob = bytes(dirblob).ljust(n_dir * SS, b"\x00")

    header = bytearray()
    header += _CFB_MAGIC + b"\x00" * 16
    header += struct.pack(
        "<HH", 0x003E, 0x0003 if SS == 512 else 0x0004
    )  # minor, major
    header += struct.pack(
        "<HHH", 0xFFFE, 9 if SS == 512 else 12, 6
    )  # LE, sector shift, mini shift
    header += b"\x00" * 6
    # directory sector count: v3 writes 0, v4 the real count
    header += struct.pack("<I", 0 if SS == 512 else n_dir)
    header += struct.pack("<I", n_fat)
    header += struct.pack("<I", dir_first)
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", _CFB_CUTOFF)
    header += struct.pack(
        "<II", minifat_first if n_minifat else _CFB_END, n_minifat
    )
    header += struct.pack("<II", _CFB_END, 0)  # no DIFAT sectors
    difat = [fat_first + s for s in range(n_fat)]
    difat += [_CFB_FREE] * (109 - len(difat))
    header += struct.pack("<109I", *difat)
    assert len(header) == 512
    if SS == 4096:
        header += b"\x00" * (SS - 512)  # v4: header fills its sector

    body = bytearray()
    fatblob = b"".join(struct.pack("<I", v) for v in fat)
    body += fatblob[: n_fat * SS].ljust(n_fat * SS, b"\xff")
    body += dirblob
    if n_minifat:
        mfblob = b"".join(struct.pack("<I", v) for v in mini_fat)
        body += mfblob.ljust(n_minifat * SS, b"\xff")
    body += bytes(mini_data).ljust(n_mini * SS, b"\x00")
    for name, data in big:
        cnt = (len(data) + SS - 1) // SS
        body += data.ljust(cnt * SS, b"\x00")
    return bytes(header) + bytes(body)


def _cfb_read_chain(
    blob: bytes, fat: list[int], start: int, size: int, ss: int,
    base: int,
) -> bytes:
    out = bytearray()
    s = start
    hops = 0
    limit = len(fat) + 1
    while s != _CFB_END and len(out) < size:
        if not 0 <= s < len(fat) or hops > limit:
            raise ValueError("CFB chain out of range or cyclic")
        at = base + s * ss
        out += blob[at : at + ss]
        s = fat[s]
        hops += 1
    if len(out) < size:
        raise ValueError("CFB chain shorter than stream size")
    return bytes(out[:size])


def cfb_members(blob: bytes, *, with_data: bool = False) -> list[dict]:
    """Directory walk of a compound file with the stream payloads
    ACTUALLY read — large streams through the FAT chain, small ones
    through the root's mini stream + miniFAT (both paths bounds- and
    cycle-checked; truncation, bad magic, or a chain past EOF
    refuses). One dict per stream entry: name, size, head (first 16
    latin-1 chars — proof the chain read ran); ``with_data`` adds the
    full payload. Storage (folder) entries report size NULL."""
    if blob[:8] != _CFB_MAGIC:
        raise ValueError("not a compound file")
    if len(blob) < 512:
        raise ValueError("truncated CFB header")
    (order,) = struct.unpack("<H", blob[28:30])
    if order != 0xFFFE:
        raise ValueError("bad CFB byte order")
    (shift,) = struct.unpack("<H", blob[30:32])
    if shift not in (9, 12):
        raise ValueError("bad CFB sector shift")
    ss = 1 << shift
    (n_fat,) = struct.unpack("<I", blob[44:48])
    (dir_first,) = struct.unpack("<I", blob[48:52])
    (cutoff,) = struct.unpack("<I", blob[56:60])
    minifat_first, n_minifat = struct.unpack("<II", blob[60:68])
    (n_difat,) = struct.unpack("<I", blob[72:76])
    if n_difat:
        raise ValueError("chained DIFAT unsupported")
    difat = struct.unpack("<109I", blob[76:512])[:n_fat]
    # sector n lives at (n+1) * sector_size ([MS-CFB] 2.1): the
    # header occupies one FULL sector, so version-4 (4096-byte)
    # files offset from 4096, not 512 (r13 — the old hardcoded 512
    # silently misread every v4 file)
    base = ss
    fat: list[int] = []
    for s in difat:
        at = base + s * ss
        if at + ss > len(blob):
            raise ValueError("FAT sector past EOF")
        fat += list(struct.unpack(f"<{ss // 4}I", blob[at : at + ss]))
    # directory chain: size unknown up front — walk sector by sector
    out_dir = bytearray()
    s = dir_first
    hops = 0
    while s != _CFB_END:
        if not 0 <= s < len(fat) or hops > len(fat):
            raise ValueError("CFB directory chain invalid")
        out_dir += blob[base + s * ss : base + (s + 1) * ss]
        s = fat[s]
        hops += 1
    dirblob = bytes(out_dir)
    entries = []
    mini_start = mini_size = None
    minifat: list[int] = []
    if n_minifat:
        mf = _cfb_read_chain(
            blob, fat, minifat_first, n_minifat * ss, ss, base
        )
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))
    for k in range(len(dirblob) // 128):
        e = dirblob[k * 128 : (k + 1) * 128]
        (nlen,) = struct.unpack("<H", e[64:66])
        typ = e[66]
        if typ == 0 or nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le")
        (start,) = struct.unpack("<I", e[116:120])
        (size,) = struct.unpack("<q", e[120:128])
        if typ == 5:  # root: locates the mini stream
            mini_start, mini_size = start, size
            continue
        entries.append({"name": name, "typ": typ, "start": start,
                        "size": size})
    mini = b""
    if mini_start is not None and mini_size:
        mini = _cfb_read_chain(blob, fat, mini_start, mini_size, ss, base)
    out = []
    for e in entries:
        if e["typ"] != 2:  # storage
            out.append({"name": e["name"], "size": None, "head": None})
            continue
        if e["size"] < cutoff:
            data = bytearray()
            s = e["start"]
            hops = 0
            while s != _CFB_END and len(data) < e["size"]:
                if not 0 <= s < len(minifat) or hops > len(minifat) + 1:
                    raise ValueError("CFB mini chain invalid")
                data += mini[s * 64 : (s + 1) * 64]
                s = minifat[s]
                hops += 1
            if len(data) < e["size"]:
                raise ValueError("CFB mini chain shorter than size")
            data = bytes(data[: e["size"]])
        else:
            data = _cfb_read_chain(
                blob, fat, e["start"], e["size"], ss, base
            )
        row = {
            "name": e["name"], "size": e["size"],
            "head": data[:16].decode("latin-1"),
        }
        if with_data:
            row["data"] = data
        out.append(row)
    return out


def cfb_kind(names: list[str]) -> str:
    """Office family of a compound file from its stream names — the
    routing signal for the legacy binary formats."""
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    return "unknown"


def build_summary_information(
    title: str, author: str, created_unix_s: int
) -> bytes:
    """A \\x05SummaryInformation property-set stream ([MS-OLEPS]):
    PIDSI title (VT_LPSTR), author (VT_LPSTR), create time
    (VT_FILETIME) — the metadata triplet legacy Office writers emit."""
    def lpstr(s: str) -> bytes:
        raw = s.encode("latin-1") + b"\x00"
        return struct.pack("<II", 30, len(raw)) + raw.ljust(
            (len(raw) + 3) // 4 * 4, b"\x00"
        )

    ft = (created_unix_s + 11644473600) * 10_000_000
    props = [
        (0x02, lpstr(title)),
        (0x04, lpstr(author)),
        (0x0C, struct.pack("<IQ", 64, ft)),
    ]
    head_size = 8 + 8 * len(props)
    offs, bodies = [], []
    at = head_size
    for pid, body in props:
        offs.append((pid, at))
        bodies.append(body)
        at += len(body)
    section = struct.pack("<II", at, len(props))
    for pid, off in offs:
        section += struct.pack("<II", pid, off)
    section += b"".join(bodies)
    fmtid = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
    return (
        struct.pack("<HHI", 0xFFFE, 0, 0)
        + b"\x00" * 16
        + struct.pack("<I", 1)
        + fmtid
        + struct.pack("<I", 48)
        + section
    )


def parse_summary_information(data: bytes) -> dict:
    """(title, author, created_s) from a SummaryInformation stream —
    VT_LPSTR and VT_FILETIME properties; anything malformed refuses."""
    if data[:2] != b"\xfe\xff":
        raise ValueError("bad property-set byte order")
    (n_sets,) = struct.unpack("<I", data[24:28])
    if n_sets < 1:
        raise ValueError("empty property set")
    (sec_off,) = struct.unpack("<I", data[44:48])
    (sec_size, count) = struct.unpack("<II", data[sec_off : sec_off + 8])
    if sec_off + sec_size > len(data):
        raise ValueError("property section past EOF")
    out = {"title": None, "author": None, "created_s": None}
    for k in range(count):
        pid, off = struct.unpack(
            "<II", data[sec_off + 8 + 8 * k : sec_off + 16 + 8 * k]
        )
        at = sec_off + off
        (vt,) = struct.unpack("<I", data[at : at + 4])
        if vt == 30:  # VT_LPSTR
            (ln,) = struct.unpack("<I", data[at + 4 : at + 8])
            val = data[at + 8 : at + 8 + ln].split(b"\x00")[0].decode(
                "latin-1"
            )
            if pid == 0x02:
                out["title"] = val
            elif pid == 0x04:
                out["author"] = val
        elif vt == 64 and pid == 0x0C:  # VT_FILETIME
            (ft,) = struct.unpack("<Q", data[at + 4 : at + 12])
            out["created_s"] = ft // 10_000_000 - 11644473600
    return out


# ---------------------------------------------------------------------------
# Legacy Word binary (.doc) text — the SIMPLE (non-complex) subset (r12)
# ---------------------------------------------------------------------------


def build_doc(paragraphs: list[str]) -> bytes:
    """A legacy .doc compound file whose WordDocument stream carries a
    minimal FIB (wIdent 0xA5EC, fComplex = 0) with the text stored
    CONTIGUOUSLY at [fcMin, fcMac) as cp1252, paragraphs ending in the
    0x0D paragraph mark — the Word 6/95-era simple layout ([MS-DOC]
    FibBase) that non-incremental saves produce. Write partner of
    :func:`doc_extract_text`."""
    text = "".join(p + "\r" for p in paragraphs).encode("cp1252")
    fc_min = 1024  # text block starts after the FIB area
    fib = bytearray(fc_min)
    struct.pack_into("<H", fib, 0, 0xA5EC)  # wIdent
    struct.pack_into("<H", fib, 2, 101)  # nFib (Word 6)
    struct.pack_into("<H", fib, 10, 0)  # flags: fComplex=0
    struct.pack_into("<I", fib, 24, fc_min)  # fcMin
    struct.pack_into("<I", fib, 28, fc_min + len(text))  # fcMac
    word_stream = bytes(fib) + text
    if len(word_stream) < _CFB_CUTOFF:  # keep the FAT path honest
        word_stream = word_stream + b"\x00" * (
            _CFB_CUTOFF - len(word_stream)
        )
    return build_cfb([
        ("WordDocument", word_stream),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def build_doc97(
    pieces: list[tuple[str, bool]], *, table1: bool = False,
    out_of_order: bool = False, prc: bool = False, clx_pad: int = 0,
) -> bytes:
    """A Word 97+ piece-table .doc from (text, compressed) pieces —
    the layout virtually every real-world `.doc` uses ([MS-DOC]
    2.4.1): the FIB (nFib 0x00C1) carries fcClx/lcbClx into the
    0Table/1Table stream (``table1`` sets the fWhichTblStm 0x0200
    flag AND plants a DECOY garbage table under the other name — a
    reader ignoring the flag reads the wrong stream); the Clx holds
    an optional leading Prc (``prc``) then the Pcdt → PlcPcd whose
    PCDs place each piece's bytes in the WordDocument stream —
    compressed pieces as cp1252 at fc/2, others UTF-16LE at fc;
    ``out_of_order`` stores piece bytes in REVERSE file order while
    CP order stays forward; ``clx_pad`` offsets the Clx inside the
    table stream. Each piece is terminated with the 0x0D paragraph
    mark. fcMin/fcMac are left pointing at an EMPTY range — a reader
    falling back to the Word-6 contiguous path yields nothing, never
    silently-wrong text. Write partner of the piece-table arm of
    :func:`doc_extract_text`."""
    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0, 0xA5EC)  # wIdent
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib (Word 97)
    struct.pack_into(
        "<H", fib, 10, 0x0004 | (0x0200 if table1 else 0)
    )  # fComplex | fWhichTblStm
    struct.pack_into("<I", fib, 24, 1024)  # fcMin
    struct.pack_into("<I", fib, 28, 1024)  # fcMac — empty simple range
    struct.pack_into("<H", fib, 32, 14)  # csw
    struct.pack_into("<H", fib, 62, 22)  # cslw
    struct.pack_into("<H", fib, 152, 93)  # cbRgFcLcb (FibRgFcLcb97)

    texts = [t + "\r" for t, _comp in pieces]
    raws = [
        t.encode("cp1252") if comp else t.encode("utf-16-le")
        for t, (_t0, comp) in zip(texts, pieces)
    ]
    order = list(range(len(pieces)))
    if out_of_order:
        order = order[::-1]
    at = 1024
    fcs: dict[int, int] = {}
    for k in order:
        fcs[k] = at
        at += len(raws[k])
    body = bytearray(at - 1024)
    for k in order:
        body[fcs[k] - 1024 : fcs[k] - 1024 + len(raws[k])] = raws[k]

    n = len(pieces)
    cps = [0]
    for t in texts:
        cps.append(cps[-1] + len(t))
    plc = b"".join(struct.pack("<I", cp) for cp in cps)
    for k, (_t, comp) in enumerate(pieces):
        fc = (2 * fcs[k]) | 0x40000000 if comp else fcs[k]
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = b""
    if prc:
        grpprl = b"\xaa\xbb\xcc\xdd"
        clx += b"\x01" + struct.pack("<h", len(grpprl)) + grpprl
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    table = b"\x00" * clx_pad + clx
    struct.pack_into("<I", fib, 418, clx_pad)  # fcClx
    struct.pack_into("<I", fib, 422, len(clx))  # lcbClx

    word_stream = bytes(fib) + bytes(body)
    if len(word_stream) < _CFB_CUTOFF:
        word_stream += b"\x00" * (_CFB_CUTOFF - len(word_stream))
    tbl_name = "1Table" if table1 else "0Table"
    decoy_name = "0Table" if table1 else "1Table"
    return build_cfb([
        ("WordDocument", word_stream),
        (tbl_name, table),
        (decoy_name, b"\xff" * max(16, len(table))),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def _doc_fib_fcclx(data: bytes) -> tuple[int, int]:
    """(fcClx, lcbClx) via the variable-FIB walk ([MS-DOC] 2.5.1:
    csw-counted fibRgW, cslw-counted fibRgLw, cbRgFcLcb-counted
    fc/lcb pairs — fcClx is pair 33 of FibRgFcLcb97). Streams too
    short or FIBs whose pair table stops before fcClx report (0, 0)
    — the Word 6/95-era simple files, which carry no Clx."""
    if len(data) < 34:
        return 0, 0
    (csw,) = struct.unpack_from("<H", data, 32)
    at = 34 + 2 * csw
    if at + 2 > len(data):
        return 0, 0
    (cslw,) = struct.unpack_from("<H", data, at)
    at += 2 + 4 * cslw
    if at + 2 > len(data):
        return 0, 0
    (n_pairs,) = struct.unpack_from("<H", data, at)
    at += 2
    if n_pairs <= 33 or at + 8 * 34 > len(data):
        return 0, 0
    return struct.unpack_from("<II", data, at + 8 * 33)


def _doc_piece_table_text(data: bytes, table: bytes,
                          fc_clx: int, lcb_clx: int) -> str:
    """Text via the CLX walk: skip Prc blocks (clxt 0x01), find the
    Pcdt (clxt 0x02) → PlcPcd (n+1 ascending CPs + n PCDs), decode
    each PCD's span from the WordDocument stream — fc bit 30 set ⇒
    compressed cp1252 at fc/2, clear ⇒ UTF-16LE at fc — and
    concatenate pieces in CP order. Any malformed or out-of-bounds
    structure refuses (ValueError): scrambled piece text poisoning
    downstream dedup fingerprints is worse than a marker row."""
    if fc_clx + lcb_clx > len(table):
        raise ValueError(".doc Clx out of table-stream bounds")
    clx = table[fc_clx : fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc: property modifiers
        if i + 3 > len(clx):
            raise ValueError("truncated .doc Prc")
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        if cb < 0 or i + 3 + cb > len(clx):
            raise ValueError("truncated .doc Prc")
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError(".doc Clx missing Pcdt")
    if i + 5 > len(clx):
        raise ValueError("truncated .doc Pcdt")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb]
    if len(plc) != lcb or lcb < 16 or (lcb - 4) % 12:
        raise ValueError("malformed .doc PlcPcd")
    n = (lcb - 4) // 12
    cps = list(struct.unpack_from(f"<{n + 1}I", plc, 0))
    if any(cps[k] >= cps[k + 1] for k in range(n)):
        raise ValueError(".doc piece CPs not ascending")
    parts: list[str] = []
    for k in range(n):
        _fl, fc, _prm = struct.unpack_from("<HIH", plc, 4 * (n + 1) + 8 * k)
        nchars = cps[k + 1] - cps[k]
        if fc & 0x40000000:  # fCompressed: cp1252 at fc/2
            off = (fc & 0x3FFFFFFF) // 2
            end = off + nchars
            if end > len(data):
                raise ValueError(".doc piece out of bounds")
            parts.append(data[off:end].decode("cp1252"))
        else:
            off = fc & 0x3FFFFFFF
            end = off + 2 * nchars
            if end > len(data):
                raise ValueError(".doc piece out of bounds")
            parts.append(data[off:end].decode("utf-16-le"))
    return "".join(parts)


def _doc_filter_fields(text: str) -> str:
    """Word field-code filtering ([MS-DOC] 2.8.25 Plcfld semantics at
    the character level): every real .doc interleaves field BEGIN
    (0x13) / SEPARATOR (0x14) / END (0x15) marks with instruction
    text ("HYPERLINK \"…\"", "PAGE", …) that must never leak into
    extracted text — only the field RESULT (between separator and
    end) is display text. Fields NEST (an IF wrapping a PAGE), so a
    character is visible iff no enclosing field is still in its
    instruction region. Also maps the special marks real documents
    carry: 0x0B (soft line break) → newline, 0x07 (cell/row mark) →
    tab, and drops the object anchors 0x01/0x02/0x05/0x08."""
    out: list[str] = []
    instr: list[bool] = []  # per nesting level: still in instruction?
    for ch in text:
        if ch == "\x13":
            instr.append(True)
        elif ch == "\x14":
            if instr:
                instr[-1] = False
        elif ch == "\x15":
            if instr:
                instr.pop()
        elif any(instr):
            continue  # inside some field's instruction region
        elif ch == "\x0b":
            out.append("\n")
        elif ch == "\x07":
            out.append("\t")
        elif ch in "\x01\x02\x05\x08":
            continue
        else:
            out.append(ch)
    return "".join(out)


def doc_extract_text(blob: bytes) -> tuple[int, str]:
    """(n_paragraphs, text) of a legacy .doc: CFB directory →
    WordDocument stream → FIB (wIdent 0xA5EC/0xA5DC). A FIB whose
    fcClx/lcbClx ([MS-DOC] FibRgFcLcb97 pair 33) names a non-empty
    Clx takes the PIECE-TABLE path — the layout of virtually every
    Word 97-2003 file (r13): the fWhichTblStm flag (0x0200) picks the
    1Table/0Table stream, the CLX walk skips Prcs to the Pcdt, and
    PCDs decode mixed compressed-cp1252/UTF-16LE pieces in CP order.
    Files with NO Clx use the Word 6/95 simple walk — contiguous
    cp1252 at [fcMin, fcMac). Paragraphs split on the 0x0D mark,
    empties dropped. Encrypted files, complex files without a piece
    table, and any malformed Clx REFUSE (ValueError) rather than
    emitting scrambled pieces — the marker-row contract."""
    data = None
    tables: dict[str, bytes] = {}
    for m in cfb_members(blob, with_data=True):
        if m["name"] == "WordDocument":
            data = m["data"]
        elif m["name"] in ("0Table", "1Table"):
            tables[m["name"]] = m["data"]
    if data is None:
        raise ValueError("no WordDocument stream")
    if len(data) < 32:
        raise ValueError("truncated FIB")
    (ident,) = struct.unpack_from("<H", data, 0)
    if ident not in (0xA5EC, 0xA5DC):
        raise ValueError("not a Word binary FIB")
    (flags,) = struct.unpack_from("<H", data, 10)
    if flags & 0x0100:  # fEncrypted: the binary RC4 arm (r13)
        if flags & 0x8000:
            raise ValueError("XOR-obfuscated .doc unsupported")
        tbl_name = "1Table" if flags & 0x0200 else "0Table"
        table = tables.get(tbl_name)
        (lkey,) = struct.unpack_from("<I", data, 14)
        if table is None or lkey != 52 or len(table) < 52:
            raise ValueError("encrypted .doc: bad EncryptionHeader")
        vmaj, vmin = struct.unpack_from("<HH", table, 0)
        if (vmaj, vmin) != (1, 1):
            raise ValueError("CryptoAPI .doc encryption unsupported")
        salt, ev, evh = table[4:20], table[20:36], table[36:52]
        if not _office_rc4_verify(
            _OFFICE_DEFAULT_PW, salt, ev, evh, 512
        ):
            raise ValueError("encrypted .doc (password)")
        rc4 = _OfficeRC4(_OFFICE_DEFAULT_PW, salt, 512)
        rc4.skip(68)
        data = data[:68] + rc4.crypt(data[68:])
        rc4 = _OfficeRC4(_OFFICE_DEFAULT_PW, salt, 512)
        rc4.skip(52)
        tables[tbl_name] = rc4.crypt(table[52:])
        # flags re-read from the DECRYPTED FIB region are not needed:
        # fWhichTblStm and fComplex live in the plaintext base
    fc_clx, lcb_clx = _doc_fib_fcclx(data)
    if lcb_clx > 0:
        tbl_name = "1Table" if flags & 0x0200 else "0Table"
        table = tables.get(tbl_name)
        if table is None:
            raise ValueError(f".doc missing {tbl_name} stream")
        text = _doc_piece_table_text(data, table, fc_clx, lcb_clx)
    else:
        if flags & 0x0004:
            raise ValueError("complex (piece-table) .doc unsupported")
        fc_min, fc_mac = struct.unpack_from("<II", data, 24)
        if not 0 <= fc_min <= fc_mac <= len(data):
            raise ValueError(".doc text range out of bounds")
        text = data[fc_min:fc_mac].decode("cp1252")
    text = _doc_filter_fields(text)
    paras = [p for p in text.split("\r") if p]
    return len(paras), "\n".join(paras)


# ---------------------------------------------------------------------------
# Legacy Excel binary (.xls, BIFF8) cells — SST/LABELSST/NUMBER/RK (r12)
# ---------------------------------------------------------------------------


def _rk_decode(rk: int) -> str:
    """RK-value decode ([MS-XLS] 2.5.217): bit0 fX100 (divide by
    100), bit1 fInt (30-bit signed int vs high-30-bits-of-a-double);
    returned as the display string (exact integers bare, /100 values
    with two decimals)."""
    fx100, fint = rk & 1, rk & 2
    if fint:
        v = rk >> 2
        if v & (1 << 29):  # sign-extend 30 bits
            v -= 1 << 30
        if fx100:
            sign = "-" if v < 0 else ""
            v = abs(v)
            return f"{sign}{v // 100}.{v % 100:02d}"
        return str(v)
    (d,) = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))
    if fx100:
        d /= 100.0
    return str(int(d)) if d == int(d) else repr(d)


def build_xls(cells: list[tuple[int, int, object]]) -> bytes:
    """A BIFF8 .xls compound file from (row, col, value) cells —
    strings through a shared SST + LABELSST, ints ≥ 2^29 or floats
    through NUMBER, small ints through RK (fInt form; negative ints
    exercise the 30-bit sign). Write partner of :func:`xls_cells`."""
    def rec(op: int, payload: bytes) -> bytes:
        return struct.pack("<HH", op, len(payload)) + payload

    strings: list[str] = []
    sidx: dict[str, int] = {}
    body = b""
    for r, c, v in cells:
        if isinstance(v, str):
            if v not in sidx:
                sidx[v] = len(strings)
                strings.append(v)
            body += rec(
                0x00FD, struct.pack("<HHHI", r, c, 0, sidx[v])
            )
        elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
            body += rec(
                0x027E,
                struct.pack(
                    "<HHHI", r, c, 0, ((v & ((1 << 30) - 1)) << 2) | 2
                ),
            )
        else:
            body += rec(
                0x0203, struct.pack("<HHHd", r, c, 0, float(v))
            )
    sst = struct.pack("<II", len(cells), len(strings))
    for sv in strings:
        enc = sv.encode("latin-1") if all(
            ord(ch) < 256 for ch in sv
        ) else sv.encode("utf-16-le")
        high = 0 if all(ord(ch) < 256 for ch in sv) else 1
        sst += struct.pack("<HB", len(sv), high) + enc
    stream = (
        rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))  # BOF
        + rec(0x00FC, sst)
        + body
        + rec(0x000A, b"")  # EOF
    )
    if len(stream) < _CFB_CUTOFF:
        stream += b"\x00" * (_CFB_CUTOFF - len(stream))
    return build_cfb([
        ("Workbook", stream),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def _xls_rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _xls_collect_sst(
    cells: list[tuple[int, int, str, object]]
) -> tuple[list[tuple[str, bool, bool]], dict, int]:
    """(unique shared strings in first-reference order, key→index
    map, total reference count) over the 'sst' cells."""
    strings: list[tuple[str, bool, bool]] = []
    sidx: dict[tuple[str, bool, bool], int] = {}
    n_refs = 0
    for _r, _c, kind, v in cells:
        if kind == "sst":
            n_refs += 1
            key = tuple(v)  # type: ignore[arg-type]
            if key not in sidx:
                sidx[key] = len(strings)
                strings.append(key)  # type: ignore[arg-type]
    return strings, sidx, n_refs


def _xls_sst_records(
    strings: list[tuple[str, bool, bool]], n_refs: int, sst_chunk: int
) -> bytes:
    """The SST record (+ CONTINUE spills) for the shared strings —
    split only at character boundaries, each continuation restarting
    with a fresh grbit whose fHighByte is re-decided from the
    characters it carries ([MS-XLS] 2.5.293)."""
    if sst_chunk < 16:
        raise ValueError("sst_chunk too small")
    frags: list[bytearray] = [bytearray(struct.pack("<II", n_refs,
                                                    len(strings)))]

    def avail() -> int:
        return sst_chunk - len(frags[-1])

    def flush() -> None:
        frags.append(bytearray())

    def write_raw(data: bytes) -> None:
        # header-less continuation: runs/ExtRst bytes span records
        # WITHOUT a grbit ([MS-XLS] 2.5.293 continuation rules)
        while data:
            if avail() == 0:
                flush()
            take = min(len(data), avail())
            frags[-1] += data[:take]
            data = data[take:]

    def portion(remaining: str, room: int) -> tuple[int, int]:
        # (fHighByte, chars) for one record portion: compressed when
        # every char that fits is latin-1, else UTF-16LE — so an
        # ASCII head with a CJK tail genuinely switches width at the
        # continuation boundary
        k = min(len(remaining), room)
        if all(ord(ch) < 256 for ch in remaining[:k]):
            return 0, k
        return 1, min(len(remaining), room // 2)

    def enc_portion(remaining: str, high: int, take: int) -> bytes:
        return (remaining[:take].encode("utf-16-le") if high
                else remaining[:take].encode("latin-1"))

    for text, rich, phon in strings:
        crun = 2 if rich else 0
        cbext = 6 if phon else 0
        flags = (0x08 if rich else 0) | (0x04 if phon else 0)
        tail = (struct.pack("<H", crun) if rich else b"") + (
            struct.pack("<i", cbext) if phon else b""
        )
        # header (cch + grbit + counts) never splits, and at least
        # one (possibly wide) char must follow it in the same record
        if avail() < 3 + len(tail) + 2:
            flush()
        high, take = portion(text, avail() - 3 - len(tail))
        frags[-1] += struct.pack("<HB", len(text), flags | high)
        frags[-1] += tail + enc_portion(text, high, take)
        remaining = text[take:]
        while remaining:
            flush()
            high, take = portion(remaining, avail() - 1)
            frags[-1] += bytes([high]) + enc_portion(
                remaining, high, take
            )
            remaining = remaining[take:]
        write_raw(b"\x00\x00\x01\x00" * crun)  # dummy FormatRuns
        write_raw(b"\x01\x00\x02\x00\xaa\xbb"[:cbext])  # dummy ExtRst

    out = _xls_rec(0x00FC, bytes(frags[0]))
    for fr in frags[1:]:
        out += _xls_rec(0x003C, bytes(fr))
    return out


def _xls_cell_records(
    cells: list[tuple[int, int, str, object]], sidx: dict
) -> bytes:
    """The per-cell record bytes — every kind build_xls2 documents."""
    body = b""
    for r, c, kind, v in cells:
        if kind == "sst":
            body += _xls_rec(0x00FD, struct.pack(
                "<HHHI", r, c, 0, sidx[tuple(v)]  # type: ignore
            ))
        elif kind == "label":
            s = str(v)
            wide = any(ord(ch) > 255 for ch in s)
            enc = s.encode("utf-16-le" if wide else "latin-1")
            body += _xls_rec(0x0204, struct.pack(
                "<HHHHB", r, c, 0, len(s), 1 if wide else 0
            ) + enc)
        elif kind == "number":
            body += _xls_rec(
                0x0203, struct.pack("<HHHd", r, c, 0, float(v))
            )
        elif kind == "rk":
            body += _xls_rec(0x027E, struct.pack(
                "<HHHI", r, c, 0, ((int(v) & ((1 << 30) - 1)) << 2) | 2
            ))
        elif kind == "formula_num":
            body += _xls_rec(0x0006, struct.pack(
                "<HHHd", r, c, 0, float(v)
            ) + struct.pack("<HIH", 0, 0, 3) + b"\x1e\x01\x00")
        elif kind == "formula_bool":
            cached = bytes([1, 0, 1 if v else 0, 0, 0, 0, 0xFF, 0xFF])
            body += _xls_rec(
                0x0006, struct.pack("<HHH", r, c, 0) + cached
                + struct.pack("<HIH", 0, 0, 3) + b"\x1e\x01\x00"
            )
        elif kind == "formula_str":
            cached = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
            body += _xls_rec(
                0x0006, struct.pack("<HHH", r, c, 0) + cached
                + struct.pack("<HIH", 0, 0, 3) + b"\x1e\x01\x00"
            )
            s = str(v)
            wide = any(ord(ch) > 255 for ch in s)
            enc = s.encode("utf-16-le" if wide else "latin-1")
            body += _xls_rec(0x0207, struct.pack(
                "<HB", len(s), 1 if wide else 0
            ) + enc)
        elif kind == "mulrk":
            vals = list(v)  # type: ignore[arg-type]
            payload = struct.pack("<HH", r, c)
            for val in vals:
                payload += struct.pack(
                    "<HI", 0, ((int(val) & ((1 << 30) - 1)) << 2) | 2
                )
            payload += struct.pack("<H", c + len(vals) - 1)
            body += _xls_rec(0x00BD, payload)
        elif kind == "mulblank":
            n_blank = int(v)  # type: ignore[arg-type]
            payload = struct.pack("<HH", r, c)
            payload += b"\x00\x00" * n_blank
            payload += struct.pack("<H", c + n_blank - 1)
            body += _xls_rec(0x00BE, payload)
        else:
            raise ValueError(f"unknown xls cell kind {kind}")
    return body


def _xls_wrap_cfb(stream: bytes, *, name: str = "Workbook") -> bytes:
    if len(stream) < _CFB_CUTOFF:
        stream += b"\x00" * (_CFB_CUTOFF - len(stream))
    return build_cfb([
        (name, stream),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def build_xls2(
    cells: list[tuple[int, int, str, object]], *, sst_chunk: int = 2048
) -> bytes:
    """A BIFF8 .xls exercising the REAL-WORLD record surface the
    simple :func:`build_xls` writer never emits — (row, col, kind,
    value) cells with kind:

    - ``sst``: value ``(text, rich, phonetic)`` — shared string with
      optional rich-text runs (cRun FormatRuns) / phonetic ExtRst;
    - ``label``: inline-string LABEL cell;
    - ``number`` / ``rk``: as in build_xls;
    - ``formula_num`` / ``formula_str`` / ``formula_bool``: FORMULA
      records with cached results (the string form emits the STRING
      follow-on record);
    - ``mulrk``: value = list of small ints (one run over columns);
    - ``mulblank``: value = column count (no cell values).

    The SST spills across CONTINUE records whenever a string would
    cross ``sst_chunk`` payload bytes — split only at character
    boundaries, each continuation restarting with a fresh grbit byte
    whose fHighByte is re-decided from the characters it carries (an
    ASCII head continued by a CJK tail genuinely switches width —
    the trap [MS-XLS] 2.5.293 sets). Write partner of the r13
    :func:`xls_cells` surface. Single-substream layout; the
    multi-sheet layout real workbooks use is :func:`build_xls3`."""
    strings, sidx, n_refs = _xls_collect_sst(cells)
    stream = (
        _xls_rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))
        + _xls_sst_records(strings, n_refs, sst_chunk)
        + _xls_cell_records(cells, sidx)
        + _xls_rec(0x000A, b"")
    )
    return _xls_wrap_cfb(stream)


def build_xls3(
    sheets: list[tuple[str, list[tuple[int, int, str, object]]]], *,
    sst_chunk: int = 2048,
) -> bytes:
    """The MULTI-SHEET BIFF8 layout every real workbook uses
    ([MS-XLS] 2.1.7.20): a Workbook-globals substream (BOF dt 0x0005,
    the GLOBAL SST shared across sheets, one BoundSheet8 per sheet
    whose lbPlyPos points at its substream, EOF) followed by one
    worksheet substream (BOF dt 0x0010, cell records, EOF) per sheet.
    lbPlyPos values are patched after layout. Write partner of the
    r13 substream-aware :func:`xls_cells`."""
    all_cells = [c for _name, cs in sheets for c in cs]
    strings, sidx, n_refs = _xls_collect_sst(all_cells)

    bounds = b""
    for name, _cs in sheets:
        wide = any(ord(ch) > 255 for ch in name)
        enc = name.encode("utf-16-le" if wide else "latin-1")
        bounds += _xls_rec(0x0085, struct.pack(
            "<IHBB", 0, 0, len(name), 1 if wide else 0
        ) + enc)
    globals_sub = (
        _xls_rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))
        + _xls_sst_records(strings, n_refs, sst_chunk)
        + bounds + _xls_rec(0x000A, b"")
    )
    subs = []
    for _name, cs in sheets:
        subs.append(
            _xls_rec(0x0809,
                     struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))
            + _xls_cell_records(cs, sidx) + _xls_rec(0x000A, b"")
        )
    # patch each BoundSheet8's lbPlyPos to its substream offset
    stream = bytearray(globals_sub + b"".join(subs))
    at = len(globals_sub)
    offs = []
    for sub in subs:
        offs.append(at)
        at += len(sub)
    pos, k = 0, 0
    while pos + 4 <= len(globals_sub):
        op, ln = struct.unpack_from("<HH", stream, pos)
        if op == 0x0085:
            struct.pack_into("<I", stream, pos + 4, offs[k])
            k += 1
        pos += 4 + ln
    return _xls_wrap_cfb(bytes(stream))


def build_xls5(
    sheets: list[tuple[str, list[tuple[int, int, str, object]]]], *,
    codepage: int = 1252,
) -> bytes:
    """A BIFF5 (Excel 5.0/95) .xls — the pre-97 generation with NO
    shared string table: every string is an inline LABEL byte string
    (u16 length, chars in the CODEPAGE record's encoding, no flags
    byte), and BOUNDSHEET names are 1-byte-length byte strings.
    Layout mirrors :func:`build_xls3`: globals substream (BOF vers
    0x0500 dt 0x0005, CODEPAGE, BOUNDSHEETs with patched lbPlyPos,
    EOF) then one worksheet substream per sheet (BOF dt 0x0010,
    cells, EOF). Cell kinds: 'label' (str), 'number' (float), 'rk'
    (30-bit int), 'rk100' (int cents → fX100 form), 'mulrk' (list of
    ints fanned over columns). The stream lands under the legacy
    'Book' CFB name real 5.0/95 files carry. Write partner of the
    r14 BIFF5 arm in :func:`xls_cells`."""
    enc = {1250: "cp1250", 1251: "cp1251", 1252: "cp1252",
           437: "cp437", 850: "cp850", 10000: "mac_roman"}.get(
        codepage, "latin-1")

    def cell_recs(cs: list[tuple[int, int, str, object]]) -> bytes:
        body = b""
        for r, c, kind, v in cs:
            if kind == "label":
                raw = str(v).encode(enc)
                body += _xls_rec(0x0204, struct.pack(
                    "<HHHH", r, c, 0, len(raw)) + raw)
            elif kind == "number":
                body += _xls_rec(0x0203, struct.pack(
                    "<HHHd", r, c, 0, float(v)))
            elif kind in ("rk", "rk100"):
                rk = (int(v) << 2) | 2 | (1 if kind == "rk100" else 0)
                body += _xls_rec(0x027E, struct.pack(
                    "<HHHI", r, c, 0, rk & 0xFFFFFFFF))
            elif kind == "mulrk":
                runs = b"".join(
                    struct.pack("<HI", 0, ((int(x) << 2) | 2)
                                & 0xFFFFFFFF) for x in v
                )
                body += _xls_rec(0x00BD, struct.pack("<HH", r, c)
                                 + runs
                                 + struct.pack("<H", c + len(v) - 1))
            elif kind == "formula_num":
                body += _xls_rec(0x0006, struct.pack(
                    "<HHHd", r, c, 0, float(v)) + struct.pack(
                    "<HIH", 0, 0, 0))
            elif kind == "formula_str":
                cached = b"\x00" + bytes(5) + b"\xff\xff"
                body += _xls_rec(0x0006, struct.pack(
                    "<HHH", r, c, 0) + cached + struct.pack(
                    "<HIH", 0, 0, 0))
                raw = str(v).encode(enc)
                body += _xls_rec(0x0207, struct.pack(
                    "<H", len(raw)) + raw)
            elif kind == "formula_bool":
                cached = b"\x01\x00" + bytes([int(bool(v))]) \
                    + bytes(3) + b"\xff\xff"
                body += _xls_rec(0x0006, struct.pack(
                    "<HHH", r, c, 0) + cached + struct.pack(
                    "<HIH", 0, 0, 0))
            else:
                raise ValueError(f"unknown BIFF5 cell kind {kind}")
        return body

    bounds = b""
    for name, _cs in sheets:
        raw = name.encode(enc)
        bounds += _xls_rec(
            0x0085, struct.pack("<IHB", 0, 0, len(raw)) + raw
        )
    globals_sub = (
        _xls_rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
        + _xls_rec(0x0042, struct.pack("<H", codepage))
        + bounds + _xls_rec(0x000A, b"")
    )
    subs = [
        _xls_rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
        + cell_recs(cs) + _xls_rec(0x000A, b"")
        for _name, cs in sheets
    ]
    stream = bytearray(globals_sub + b"".join(subs))
    at = len(globals_sub)
    offs = []
    for sub in subs:
        offs.append(at)
        at += len(sub)
    pos, k = 0, 0
    while pos + 4 <= len(globals_sub):
        op, ln = struct.unpack_from("<HH", stream, pos)
        if op == 0x0085:
            struct.pack_into("<I", stream, pos + 4, offs[k])
            k += 1
        pos += 4 + ln
    return _xls_wrap_cfb(bytes(stream), name="Book")


class _SstCursor:
    """Read cursor over the SST's record fragments (the SST payload
    minus its 8-byte header, then each CONTINUE payload). The BIFF8
    continuation rules ([MS-XLS] 2.5.293 XLUnicodeRichExtendedString):
    a fragment boundary inside CHARACTER data restarts with a fresh
    grbit byte whose fHighByte may DIFFER from the portion before it
    (the classic trap); boundaries inside headers, format runs, or
    ExtRst data carry no grbit. Exhaustion before the declared string
    count refuses (r12 ADVICE)."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.pos = 0

    def read_raw(self, n: int) -> bytes:
        out = b""
        while n:
            if self.fi >= len(self.frags):
                raise ValueError("BIFF SST exhausted")
            take = min(n, len(self.frags[self.fi]) - self.pos)
            if take == 0:
                self.fi += 1
                self.pos = 0
                continue
            out += self.frags[self.fi][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_chars(self, cch: int, high: int) -> str:
        parts: list[str] = []
        while cch:
            if self.fi >= len(self.frags):
                raise ValueError("BIFF SST exhausted")
            a = len(self.frags[self.fi]) - self.pos
            width = 2 if high else 1
            if a < width:
                if a != 0:
                    raise ValueError("BIFF SST char fragment misaligned")
                self.fi += 1
                self.pos = 0
                if self.fi >= len(self.frags) or not self.frags[self.fi]:
                    raise ValueError("BIFF SST exhausted")
                # continuation inside char data: fresh grbit byte
                high = self.frags[self.fi][0] & 0x01
                self.pos = 1
                continue
            take = min(cch, a // width)
            if take == 0:
                raise ValueError("BIFF SST char fragment misaligned")
            raw = self.frags[self.fi][self.pos : self.pos + take * width]
            self.pos += take * width
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= take
        return "".join(parts)

    def read_string(self) -> str:
        cch, flags = struct.unpack("<HB", self.read_raw(3))
        if flags & 0xF2:
            raise ValueError("reserved SST flag bits")
        crun = struct.unpack("<H", self.read_raw(2))[0] \
            if flags & 0x08 else 0
        cbext = struct.unpack("<i", self.read_raw(4))[0] \
            if flags & 0x04 else 0
        if cbext < 0:
            raise ValueError("negative SST ExtRst size")
        s = self.read_chars(cch, flags & 0x01)
        self.read_raw(4 * crun)  # rich-text FormatRuns — skipped
        self.read_raw(cbext)  # phonetic ExtRst — skipped
        return s


def _xl_unicode_string(payload: bytes, at: int) -> tuple[str, int]:
    """(text, next offset) of a single-record XLUnicodeRichExtended-
    String (LABEL cells, FORMULA STRING results)."""
    cch, flags = struct.unpack_from("<HB", payload, at)
    at += 3
    if flags & 0xF2:
        raise ValueError("reserved string flag bits")
    crun = cbext = 0
    if flags & 0x08:
        (crun,) = struct.unpack_from("<H", payload, at)
        at += 2
    if flags & 0x04:
        (cbext,) = struct.unpack_from("<i", payload, at)
        at += 4
        if cbext < 0:
            raise ValueError("negative string ExtRst size")
    if flags & 0x01:
        raw = payload[at : at + 2 * cch]
        if len(raw) < 2 * cch:
            raise ValueError("string chars past record end")
        s = raw.decode("utf-16-le")
        at += 2 * cch
    else:
        raw = payload[at : at + cch]
        if len(raw) < cch:
            raise ValueError("string chars past record end")
        s = raw.decode("latin-1")
        at += cch
    at += 4 * crun + cbext
    if at > len(payload):
        raise ValueError("string runs past record end")
    return s, at


def _num_display(d: float) -> str:
    return str(int(d)) if d == int(d) else repr(d)


def xls_cells(blob: bytes) -> list[dict]:
    """Cells of a BIFF8 .xls ([MS-XLS]): CFB → Workbook stream →
    record walk (BOF version check) until EOF. The real-world record
    surface (r13, closing the r12 verdict's #2 gap): SST with
    CONTINUE-record coalescing (fHighByte re-read at every
    continuation boundary) and rich-text/phonetic runs skipped,
    LABELSST indices resolved, LABEL inline strings, NUMBER doubles,
    RK fInt/fX100 forms, MULRK runs fanned to one cell each, MULBLANK
    consumed, FORMULA cached results (number / bool / error / the
    string form whose value follows in a STRING record; cached blanks
    emit nothing). One dict per cell: 0-based row, col, kind
    ('s'/'label'/'n'/'rk'/'fn'/'fs'/'fb'/'fe'), display value.
    Records past the stream bound, an SST index out of range, SST
    exhaustion before the declared count, a string FORMULA without
    its STRING, or a missing EOF refuse."""
    data = None
    for m in cfb_members(blob, with_data=True):
        if m["name"] in ("Workbook", "Book"):
            data = m["data"]
            break
    if data is None:
        raise ValueError("no Workbook stream")
    # FilePass-protected workbooks: try the silent default password
    # (RC4 or XOR arms); a real password refuses to the marker row
    data = xls_decrypt_stream(data)
    pos = 0
    recs: list[tuple[int, int, bytes]] = []  # (offset, op, payload)
    saw_eof = False
    while pos + 4 <= len(data):
        op, ln = struct.unpack_from("<HH", data, pos)
        payload = data[pos + 4 : pos + 4 + ln]
        if len(payload) < ln:
            raise ValueError("BIFF record past stream end")
        recs.append((pos, op, payload))
        pos += 4 + ln
        if op == 0x000A:
            # a real workbook continues with per-sheet SUBSTREAMS:
            # another BOF follows each substream's EOF; anything else
            # (the CFB cutoff padding) ends the stream (r13)
            if pos + 4 <= len(data) and struct.unpack_from(
                "<H", data, pos
            )[0] == 0x0809:
                continue
            saw_eof = True
            break
    if not saw_eof:
        raise ValueError("BIFF stream missing EOF")

    # workbook generation from the FIRST BOF: 0x0600 = BIFF8,
    # 0x0500 = BIFF5 (Excel 5.0/95 — LABEL-only strings, no SST,
    # byte strings in the CODEPAGE record's encoding; r14)
    if not recs or recs[0][1] != 0x0809:
        raise ValueError("BIFF stream missing leading BOF")
    (wb_ver,) = struct.unpack_from("<H", recs[0][2], 0)
    if wb_ver not in (0x0500, 0x0600):
        raise ValueError("not a BIFF5/BIFF8 workbook")
    biff5 = wb_ver == 0x0500
    enc = "latin-1"
    for _off, op, payload in recs:
        if op == 0x0042 and len(payload) >= 2:  # CODEPAGE
            (cv,) = struct.unpack_from("<H", payload, 0)
            enc = {1250: "cp1250", 1251: "cp1251", 1252: "cp1252",
                   437: "cp437", 850: "cp850",
                   10000: "mac_roman"}.get(cv, "latin-1")

    # BoundSheet directory: declared substream start → (index, name)
    # (BIFF8 form carries a flags byte + optional UTF-16; the BIFF5
    # form is a 1-byte-length byte string in the workbook codepage)
    bound: dict[int, tuple[int, str]] = {}
    n_bound = 0
    for _off, op, payload in recs:
        if op == 0x0085:
            (ply,) = struct.unpack_from("<I", payload, 0)
            if biff5:
                cch = payload[6]
                name = payload[7 : 7 + cch].decode(enc)
            else:
                cch, sflags = struct.unpack_from("<BB", payload, 6)
                if sflags & 0x01:
                    name = payload[8 : 8 + 2 * cch].decode("utf-16-le")
                else:
                    name = payload[8 : 8 + cch].decode("latin-1")
            bound[ply] = (n_bound, name)
            n_bound += 1

    strings: list[str] = []
    out: list[dict] = []
    sheet, sheet_name = 0, None
    n_bof = 0
    k = 0
    while k < len(recs):
        _off, op, payload = recs[k]
        if op == 0x0809:
            (ver,) = struct.unpack_from("<H", payload, 0)
            if ver != wb_ver:
                raise ValueError("BIFF substream version mismatch")
            n_bof += 1
            if n_bof > 1:  # a worksheet substream
                if bound:
                    if _off not in bound:
                        raise ValueError(
                            "substream BOF not declared in BoundSheet8"
                        )
                    sheet, sheet_name = bound[_off]
                else:
                    sheet, sheet_name = n_bof - 2, None
        elif op == 0x00FC:  # SST (+ CONTINUE coalescing)
            if biff5:
                raise ValueError("SST record in a BIFF5 stream")
            (_total, n_unique) = struct.unpack_from("<II", payload, 0)
            frags = [payload[8:]]
            while k + 1 < len(recs) and recs[k + 1][1] == 0x003C:
                k += 1
                frags.append(recs[k][2])
            cur = _SstCursor(frags)
            strings = [cur.read_string() for _ in range(n_unique)]
        elif op == 0x00FD:  # LABELSST
            if biff5:
                raise ValueError("LABELSST record in a BIFF5 stream")
            r, c, _ixfe, isst = struct.unpack("<HHHI", payload)
            if isst >= len(strings):
                raise ValueError("SST index out of range")
            out.append({"sheet": sheet, "sheet_name": sheet_name,
                        "row": r, "col": c, "kind": "s",
                        "value": strings[isst]})
        elif op == 0x0204:  # LABEL (inline string)
            r, c, _ixfe = struct.unpack_from("<HHH", payload, 0)
            if biff5:
                # BIFF5 byte string: u16 length, chars in the
                # workbook codepage, no flags byte
                (cch,) = struct.unpack_from("<H", payload, 6)
                raw = payload[8 : 8 + cch]
                if len(raw) < cch:
                    raise ValueError("string chars past record end")
                s = raw.decode(enc)
            else:
                s, _end = _xl_unicode_string(payload, 6)
            out.append({"sheet": sheet, "sheet_name": sheet_name,
                        "row": r, "col": c, "kind": "label",
                        "value": s})
        elif op == 0x0203:  # NUMBER
            r, c, _ixfe, d = struct.unpack("<HHHd", payload)
            out.append({"sheet": sheet, "sheet_name": sheet_name,
                        "row": r, "col": c, "kind": "n",
                        "value": _num_display(d)})
        elif op == 0x027E:  # RK
            r, c, _ixfe, rk = struct.unpack("<HHHI", payload)
            out.append({"sheet": sheet, "sheet_name": sheet_name,
                        "row": r, "col": c, "kind": "rk",
                        "value": _rk_decode(rk)})
        elif op == 0x00BD:  # MULRK: (ixfe, rk) run over columns
            r, c0 = struct.unpack_from("<HH", payload, 0)
            n_run = (len(payload) - 6) // 6
            if n_run < 1 or len(payload) != 6 + 6 * n_run:
                raise ValueError("malformed MULRK")
            (c_last,) = struct.unpack_from(
                "<H", payload, len(payload) - 2
            )
            if c_last != c0 + n_run - 1:
                raise ValueError("MULRK column range mismatch")
            for j in range(n_run):
                _ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * j)
                out.append({"sheet": sheet, "sheet_name": sheet_name,
                            "row": r, "col": c0 + j, "kind": "rk",
                            "value": _rk_decode(rk)})
        elif op == 0x00BE:  # MULBLANK: no value — consumed
            pass
        elif op == 0x0006:  # FORMULA: cached result
            r, c, _ixfe = struct.unpack_from("<HHH", payload, 0)
            cached = payload[6:14]
            if cached[6:8] == b"\xff\xff":  # non-numeric cached forms
                t = cached[0]
                if t == 0:  # string: value in the following STRING
                    if k + 1 >= len(recs) or recs[k + 1][1] != 0x0207:
                        raise ValueError(
                            "string FORMULA missing its STRING record"
                        )
                    k += 1
                    if biff5:
                        # BIFF5 STRING: u16 length + codepage chars
                        (cch5,) = struct.unpack_from(
                            "<H", recs[k][2], 0
                        )
                        raw5 = recs[k][2][2 : 2 + cch5]
                        if len(raw5) < cch5:
                            raise ValueError(
                                "string chars past record end"
                            )
                        s = raw5.decode(enc)
                    else:
                        s, _end = _xl_unicode_string(recs[k][2], 0)
                    out.append({"sheet": sheet, "sheet_name": sheet_name,
                                "row": r, "col": c, "kind": "fs",
                                "value": s})
                elif t == 1:  # boolean
                    out.append({"sheet": sheet, "sheet_name": sheet_name,
                                "row": r, "col": c, "kind": "fb",
                                "value": str(cached[2])})
                elif t == 2:  # error code
                    out.append({"sheet": sheet, "sheet_name": sheet_name,
                                "row": r, "col": c, "kind": "fe",
                                "value": str(cached[2])})
                elif t == 3:  # cached blank
                    pass
                else:
                    raise ValueError("unknown FORMULA cached kind")
            else:
                (d,) = struct.unpack("<d", cached)
                out.append({"sheet": sheet, "sheet_name": sheet_name,
                            "row": r, "col": c, "kind": "fn",
                            "value": _num_display(d)})
        k += 1
    return out


# ---------------------------------------------------------------------------
# Legacy PowerPoint binary (.ppt) text — TextBytes/TextChars atoms (r12)
# ---------------------------------------------------------------------------


def build_ppt(slides: list[list[str]],
              notes: list[list[str]] | None = None) -> bytes:
    """A legacy .ppt compound file whose 'PowerPoint Document' stream
    nests one container record per slide holding TextBytesAtom
    (latin-1) or TextCharsAtom (UTF-16LE — chosen per text) children —
    the [MS-PPT] record framing (recVer/recInstance u16, recType u16,
    recLen u32). ``notes`` adds Notes containers (0x03F0) after the
    slides — the speaker-notes text real decks carry (r13). Write
    partner of :func:`ppt_extract_text`."""
    def atom(rtype: int, payload: bytes, ver: int = 0) -> bytes:
        return struct.pack("<HHI", ver, rtype, len(payload)) + payload

    def text_atoms(texts: list[str]) -> bytes:
        inner = b""
        for t in texts:
            if all(ord(ch) < 256 for ch in t):
                inner += atom(0x0FA8, t.encode("latin-1"))
            else:
                inner += atom(0x0FA0, t.encode("utf-16-le"))
        return inner

    body = b""
    for texts in slides:
        body += atom(0x03EE, text_atoms(texts), ver=0xF)  # Slide
    for texts in notes or []:
        body += atom(0x03F0, text_atoms(texts), ver=0xF)  # Notes
    stream = atom(0x03E8, body, ver=0xF)  # Document container
    if len(stream) < _CFB_CUTOFF:
        stream += b"\x00" * (_CFB_CUTOFF - len(stream))
    return build_cfb([
        ("PowerPoint Document", stream),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def ppt_extract_text(blob: bytes) -> tuple[int, str]:
    """(n_slides, text) of a legacy .ppt: CFB → 'PowerPoint Document'
    stream → recursive record walk (containers recVer 0xF descend;
    TextCharsAtom 0x0FA0 UTF-16LE / TextBytesAtom 0x0FA8 latin-1
    collect), slides counted from Slide containers, texts joined
    newline per slide and across slides. Records past the stream
    bound refuse (ValueError) — marker-row contract."""
    data = None
    for m in cfb_members(blob, with_data=True):
        if m["name"] == "PowerPoint Document":
            data = m["data"]
            break
    if data is None:
        raise ValueError("no PowerPoint Document stream")
    n_slides = 0
    texts: list[str] = []  # Slide AND Notes text, in walk order

    def walk(at: int, end: int, depth: int, collecting: bool) -> None:
        nonlocal n_slides
        if depth > 16:
            raise ValueError("PPT record nesting too deep")
        while at + 8 <= end:
            verinst, rtype, ln = struct.unpack_from("<HHI", data, at)
            body_at = at + 8
            if body_at + ln > end:
                raise ValueError("PPT record past bound")
            if rtype in (0x03EE, 0x03F0):  # Slide / Notes container
                if rtype == 0x03EE:
                    n_slides += 1
                walk(body_at, body_at + ln, depth + 1, True)
            elif verinst & 0xF == 0xF:  # other containers descend
                walk(body_at, body_at + ln, depth + 1, collecting)
            elif rtype == 0x0FA8 and collecting:
                texts.append(
                    data[body_at : body_at + ln].decode("latin-1")
                )
            elif rtype == 0x0FA0 and collecting:
                texts.append(
                    data[body_at : body_at + ln].decode("utf-16-le")
                )
            at = body_at + ln

    # the stream is cutoff-padded with zeros: bound the walk at the
    # outermost Document container's declared length
    if len(data) < 8:
        raise ValueError("truncated PPT stream")
    _vi, rtype, ln = struct.unpack_from("<HHI", data, 0)
    if rtype != 0x03E8:
        raise ValueError("not a PowerPoint Document container")
    if 8 + ln > len(data):
        raise ValueError("PPT record past bound")
    walk(0, 8 + ln, 0, False)
    return n_slides, "\n".join(texts)


# ---------------------------------------------------------------------------
# Encrypted legacy Office (r13) — [MS-OFFCRYPTO] 2.3.6 binary RC4
# (the .xls FilePass / .doc table-stream form, default password
# "VelvetSweatshop") and 2.3.7 XOR obfuscation (Method 1)
# ---------------------------------------------------------------------------

# Excel silently tries this well-known default before prompting —
# the binary-era analogue of the PDF empty-user-password flow
_OFFICE_DEFAULT_PW = "VelvetSweatshop"


def _office_rc4_keydigest(password: str, salt: bytes) -> bytes:
    """The 5-byte key digest of [MS-OFFCRYPTO] 2.3.6.2: MD5 of the
    UTF-16LE password, truncated to 5 bytes, then MD5 over 16
    repetitions of (truncated ‖ salt) — the per-block RC4 keys hang
    off this digest."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()
    m = hashlib.md5()
    for _ in range(16):
        m.update(h0[:5])
        m.update(salt)
    return m.digest()[:5]


class _OfficeRC4:
    """RC4 keystream over an encrypted legacy-Office stream: re-keyed
    every ``block_size`` bytes of ABSOLUTE stream offset (1024 for
    BIFF8 Workbook streams, 512 for Word document/table streams).
    Two published derivations ([MS-OFFCRYPTO]):

    - ``binary`` (2.3.6): key = MD5(keydigest5 ‖ le32(block)) off the
      MD5 ×16-repetition digest — the Office 97-2000 form;
    - ``cryptoapi`` (2.3.5): key = SHA1(H0 ‖ le32(block)) truncated
      to ``key_bits``/8 bytes (the 40-bit grade zero-pads to 16 —
      the export-grade CryptoAPI quirk), H0 = SHA1(salt ‖ UTF-16LE
      password) — the Office XP/2003 form.

    Plaintext spans (record headers, exempt records, the FIB base)
    still ADVANCE the position — `skip` consumes keystream without
    transforming."""

    def __init__(self, password: str, salt: bytes, block_size: int,
                 *, scheme: str = "binary", key_bits: int = 128):
        if scheme == "binary":
            self._kd = _office_rc4_keydigest(password, salt)
        elif scheme == "cryptoapi":
            self._kd = hashlib.sha1(
                salt + password.encode("utf-16-le")
            ).digest()
        else:
            raise ValueError(f"unknown RC4 scheme {scheme}")
        self._scheme = scheme
        self._key_bits = key_bits
        self._bs = block_size
        self._off = 0
        self._rekey(0)

    def _rekey(self, blk: int) -> None:
        if self._scheme == "binary":
            key = hashlib.md5(
                self._kd + struct.pack("<I", blk)
            ).digest()
        else:
            h = hashlib.sha1(
                self._kd + struct.pack("<I", blk)
            ).digest()
            if self._key_bits == 40:
                key = h[:5] + b"\x00" * 11
            else:
                key = h[: self._key_bits // 8]
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        self._s, self._i, self._j, self._blk = s, 0, 0, blk

    def crypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        s = self._s
        i, j = self._i, self._j
        for k, c in enumerate(data):
            blk = self._off // self._bs
            if blk != self._blk:
                self._rekey(blk)
                s = self._s
                i, j = 0, 0
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
            self._off += 1
        self._i, self._j = i, j
        return bytes(out)

    def skip(self, n: int) -> None:
        self.crypt(b"\x00" * n)


def _office_rc4_verify(password: str, salt: bytes, ev: bytes,
                       evh: bytes, block_size: int, *,
                       scheme: str = "binary",
                       key_bits: int = 128) -> bool:
    """[MS-OFFCRYPTO] 2.3.6.4 / 2.3.5.6: decrypt EncryptedVerifier
    then EncryptedVerifierHash with ONE continuous block-0 cipher;
    the password authenticates iff Hash(verifier) == verifierHash —
    MD5 for the binary form, SHA-1 for CryptoAPI."""
    rc4 = _OfficeRC4(password, salt, block_size, scheme=scheme,
                     key_bits=key_bits)
    v = rc4.crypt(ev)
    vh = rc4.crypt(evh)
    hf = hashlib.md5 if scheme == "binary" else hashlib.sha1
    d = hf(v).digest()
    return d == vh[: len(d)]


# --- XOR obfuscation (Method 1) tables: [MS-OFFCRYPTO] 2.3.7.2 — the
# 105-entry encryption matrix is GF-doubling chains (poly 0x11021,
# the CCITT polynomial) off 15 per-position seeds, so it is generated
# rather than transcribed (the aes.py S-box discipline)
_XOR_INITIAL_CODE = (
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE,
    0x313E, 0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A,
    0x4EC3,
)
_XOR_MATRIX_SEEDS = (
    0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23,
    0x47D3, 0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x3331,
    0x1021,
)
_XOR_PAD = bytes([
    0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80, 0x00, 0xBE,
    0x0F, 0x00, 0xBF, 0x0F, 0x00,
])


def _xor_matrix() -> list[int]:
    out = []
    for seed in _XOR_MATRIX_SEEDS:
        v = seed
        out.append(v)
        for _ in range(6):
            v <<= 1
            if v & 0x10000:
                v ^= 0x11021
            out.append(v)
    return out


_XOR_MATRIX = _xor_matrix()


def _xor_create_key(password: bytes) -> int:
    """CreateXorKey_Method1: fold password bits (last char first)
    through the encryption matrix from its tail."""
    if not 1 <= len(password) <= 15:
        raise ValueError("XOR password must be 1-15 bytes")
    key = _XOR_INITIAL_CODE[len(password) - 1]
    element = 104
    for ch in reversed(password):
        c = ch
        for _ in range(7):
            if c & 0x40:
                key ^= _XOR_MATRIX[element]
            c = (c << 1) & 0xFF
            element -= 1
    return key


def _xor_create_verifier(password: bytes) -> int:
    """CreatePasswordVerifier_Method1 — the 16-bit verifier stored in
    the FilePass record."""
    verifier = 0

    def rotl15(v: int) -> int:
        return ((v << 1) & 0x7FFF) | (1 if v & 0x4000 else 0)

    for ch in reversed(password):
        verifier = rotl15(verifier) ^ ch
    verifier = rotl15(verifier) ^ len(password) ^ 0xCE4B
    return verifier


def _ror8(b: int) -> int:
    return ((b >> 1) | (b << 7)) & 0xFF


def _rol8(b: int) -> int:
    return ((b << 1) | (b >> 7)) & 0xFF


def _xor_create_array(password: bytes) -> bytes:
    """CreateXorArray_Method1: the 16-byte obfuscation array — pad
    bytes and password chars folded against the XOR key's bytes with
    the XorRor primitive (Ror(b1 ^ b2))."""
    key = _xor_create_key(password)
    klow, khigh = key & 0xFF, key >> 8
    arr = bytearray(16)
    index = len(password)
    if index % 2 == 1:
        arr[index] = _ror8(_XOR_PAD[0] ^ khigh)
        index -= 1
        arr[index] = _ror8(password[-1] ^ klow)
    while index > 0:
        index -= 1
        arr[index] = _ror8(password[index] ^ khigh)
        index -= 1
        arr[index] = _ror8(password[index] ^ klow)
    index = 15
    pad_index = 15 - len(password)
    while pad_index > 0:
        arr[index] = _ror8(_XOR_PAD[pad_index] ^ khigh)
        index -= 1
        pad_index -= 1
        arr[index] = _ror8(_XOR_PAD[pad_index] ^ klow)
        index -= 1
        pad_index -= 1
    return bytes(arr)


def _xor_crypt_record(payload: bytes, xor_array: bytes,
                      data_offset: int, *, encrypt: bool) -> bytes:
    """One record payload through DecryptData_Method1 / its inverse:
    per [MS-XLS] 2.2.10.1 the array index starts at (record data
    offset + data length) mod 16; encrypt = XOR then Ror, decrypt =
    Rol then XOR."""
    idx = (data_offset + len(payload)) & 0x0F
    out = bytearray(len(payload))
    for k, c in enumerate(payload):
        if encrypt:
            out[k] = _ror8(c ^ xor_array[idx])
        else:
            out[k] = _rol8(c) ^ xor_array[idx]
        idx = (idx + 1) & 0x0F
    return bytes(out)


# records whose payloads are never encrypted in a protected Workbook
# stream ([MS-XLS] 2.2.10): BOF, FilePass, UsrExcl, FileLock,
# InterfaceHdr, RRDInfo, RRDHeader
_XLS_PLAINTEXT_RECORDS = frozenset(
    {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
)


def _xls_stream_records(data: bytes):
    """Yield (offset, op, length) for each record up to and including
    the LAST substream's EOF — a multi-sheet workbook continues with
    another BOF after each substream's EOF (r13); anything else there
    is the CFB cutoff padding. Header fields are plaintext even in
    encrypted streams, so the walk itself never needs the key."""
    pos = 0
    while pos + 4 <= len(data):
        op, ln = struct.unpack_from("<HH", data, pos)
        if pos + 4 + ln > len(data):
            raise ValueError("BIFF record past stream end")
        yield pos, op, ln
        pos += 4 + ln
        if op == 0x000A:
            if pos + 4 <= len(data) and struct.unpack_from(
                "<H", data, pos
            )[0] == 0x0809:
                continue
            return
    raise ValueError("BIFF stream missing EOF")


def xls_decrypt_stream(data: bytes,
                       password: str = _OFFICE_DEFAULT_PW) -> bytes:
    """Workbook stream with its FilePass protection REMOVED — the
    RC4 arm (wEncryptionType 1, vMajor 1: verifier-gated per-1024-
    byte-block keys, headers and exempt records advancing the
    keystream untransformed) and the XOR-obfuscation arm
    (wEncryptionType 0: per-record array rotation). Streams without
    FilePass pass through unchanged; a failed verifier (a REAL
    password) refuses — the marker-row contract. The default
    ``password`` is the one Excel tries silently."""
    fp = None
    for off, op, ln in _xls_stream_records(data):
        if op == 0x002F:
            fp = (off, ln)
            break
    if fp is None:
        return data
    off, ln = fp
    payload = data[off + 4 : off + 4 + ln]
    (wtype,) = struct.unpack_from("<H", payload, 0)
    out = bytearray(data)
    if wtype == 1:  # RC4 (binary or CryptoAPI)
        vmaj, vmin = struct.unpack_from("<HH", payload, 2)
        if (vmaj, vmin) == (1, 1):  # binary RC4 (Office 97-2000)
            scheme, key_bits = "binary", 128
            salt = payload[6:22]
            ev = payload[22:38]
            evh = payload[38:54]
            if len(evh) < 16:
                raise ValueError("truncated FilePass header")
        elif vmin == 2 and vmaj in (2, 3, 4):  # CryptoAPI (XP/2003)
            scheme = "cryptoapi"
            (hsize,) = struct.unpack_from("<I", payload, 10)
            header = payload[14 : 14 + hsize]
            alg_id, _algh, key_bits = struct.unpack_from(
                "<III", header, 8
            )
            if alg_id != 0x6801:
                raise ValueError("non-RC4 CryptoAPI .xls unsupported")
            if key_bits not in (40, 56, 128):
                raise ValueError("bad CryptoAPI key size")
            at = 14 + hsize
            (salt_size,) = struct.unpack_from("<I", payload, at)
            salt = payload[at + 4 : at + 20]
            ev = payload[at + 20 : at + 36]
            (vh_size,) = struct.unpack_from("<I", payload, at + 36)
            evh = payload[at + 40 : at + 60]
            if salt_size != 16 or vh_size != 20 or len(evh) < 20:
                raise ValueError("bad CryptoAPI verifier")
        else:
            raise ValueError("unsupported .xls encryption version")
        if not _office_rc4_verify(
            password, salt, ev, evh, 1024,
            scheme=scheme, key_bits=key_bits,
        ):
            raise ValueError("encrypted .xls (password)")
        rc4 = _OfficeRC4(password, salt, 1024, scheme=scheme,
                         key_bits=key_bits)
        for roff, rop, rln in _xls_stream_records(data):
            rc4.skip(4)  # header bytes advance the keystream
            if rop in _XLS_PLAINTEXT_RECORDS:
                rc4.skip(rln)
            elif rop == 0x0085:  # BoundSheet8: lbPlyPos stays plain
                rc4.skip(4)
                out[roff + 8 : roff + 4 + rln] = rc4.crypt(
                    data[roff + 8 : roff + 4 + rln]
                )
            else:
                out[roff + 4 : roff + 4 + rln] = rc4.crypt(
                    data[roff + 4 : roff + 4 + rln]
                )
    elif wtype == 0:  # XOR obfuscation
        xkey, xver = struct.unpack_from("<HH", payload, 2)
        pw = password.encode("latin-1")
        if _xor_create_verifier(pw) != xver or _xor_create_key(pw) != xkey:
            raise ValueError("encrypted .xls (password)")
        arr = _xor_create_array(pw)
        for roff, rop, rln in _xls_stream_records(data):
            if rop in _XLS_PLAINTEXT_RECORDS:
                continue
            pt = _xor_crypt_record(
                data[roff + 4 : roff + 4 + rln], arr, roff + 4,
                encrypt=False,
            )
            if rop == 0x0085:  # lbPlyPos was never obfuscated
                pt = data[roff + 4 : roff + 8] + pt[4:]
            out[roff + 4 : roff + 4 + rln] = pt
    else:
        raise ValueError("unknown FilePass encryption type")
    return bytes(out)


def encrypt_xls(blob: bytes, password: str = _OFFICE_DEFAULT_PW,
                *, xor: bool = False, salt_seed: bytes = b"s",
                cryptoapi: bool = False, key_bits: int = 128) -> bytes:
    """A plaintext BIFF8 .xls compound file re-written with FilePass
    protection — binary RC4 (default), RC4 CryptoAPI
    (``cryptoapi=True``, SHA-1 derivation, explicit ``key_bits``
    incl. the zero-padded 40-bit export grade), or XOR obfuscation.
    The FilePass record lands right after BOF and every later
    non-exempt payload is transformed; write partner of
    :func:`xls_decrypt_stream`."""
    ms = cfb_members(blob, with_data=True)
    wb = next((m for m in ms if m["name"] in ("Workbook", "Book")), None)
    if wb is None:
        raise ValueError("no Workbook stream")
    data = wb["data"]
    recs = list(_xls_stream_records(data))
    stream_end = recs[-1][0] + 4 + recs[-1][2]
    bof_off, _bop, bof_ln = recs[0]
    if _bop != 0x0809:
        raise ValueError("stream must start with BOF")
    cut = bof_off + 4 + bof_ln

    if xor:
        pw = password.encode("latin-1")
        fp_payload = struct.pack(
            "<HHH", 0, _xor_create_key(pw), _xor_create_verifier(pw)
        )
    elif cryptoapi:
        scheme = "cryptoapi"
        salt = hashlib.md5(salt_seed + b":xlsalt").digest()
        verifier = hashlib.md5(salt_seed + b":xlver").digest()
        rc4 = _OfficeRC4(password, salt, 1024, scheme=scheme,
                         key_bits=key_bits)
        ev = rc4.crypt(verifier)
        evh = rc4.crypt(hashlib.sha1(verifier).digest())
        csp = "Microsoft Base Cryptographic Provider v1.0"
        header = struct.pack(
            "<IIIIIIII", 0x04, 0, 0x6801, 0x8004, key_bits, 0x01, 0, 0
        ) + csp.encode("utf-16-le") + b"\x00\x00"
        fp_payload = (
            struct.pack("<HHHII", 1, 4, 2, 0x04, len(header)) + header
            + struct.pack("<I", 16) + salt + ev
            + struct.pack("<I", 20) + evh
        )
    else:
        scheme = "binary"
        salt = hashlib.md5(salt_seed + b":xlsalt").digest()
        verifier = hashlib.md5(salt_seed + b":xlver").digest()
        rc4 = _OfficeRC4(password, salt, 1024)
        ev = rc4.crypt(verifier)
        evh = rc4.crypt(hashlib.md5(verifier).digest())
        fp_payload = (
            struct.pack("<HHH", 1, 1, 1) + salt + ev + evh
        )
    fp_rec = struct.pack("<HH", 0x002F, len(fp_payload)) + fp_payload
    new = bytearray(data[:cut] + fp_rec + data[cut:stream_end])
    # the inserted FilePass shifts every substream: re-point each
    # BoundSheet8's lbPlyPos (kept plaintext by BOTH cipher arms)
    for roff, rop, rln in _xls_stream_records(bytes(new)):
        if rop == 0x0085:
            (ply,) = struct.unpack_from("<I", new, roff + 4)
            struct.pack_into("<I", new, roff + 4, ply + len(fp_rec))
    new = bytes(new)

    out = bytearray(new)
    if xor:
        arr = _xor_create_array(password.encode("latin-1"))
        for roff, rop, rln in _xls_stream_records(new):
            if rop in _XLS_PLAINTEXT_RECORDS:
                continue
            ct = _xor_crypt_record(
                new[roff + 4 : roff + 4 + rln], arr, roff + 4,
                encrypt=True,
            )
            if rop == 0x0085:  # lbPlyPos stays plain under XOR too
                ct = new[roff + 4 : roff + 8] + ct[4:]
            out[roff + 4 : roff + 4 + rln] = ct
    else:
        rc4 = _OfficeRC4(password, salt, 1024, scheme=scheme,
                         key_bits=key_bits)
        for roff, rop, rln in _xls_stream_records(new):
            rc4.skip(4)
            if rop in _XLS_PLAINTEXT_RECORDS:
                rc4.skip(rln)
            elif rop == 0x0085:
                rc4.skip(4)
                out[roff + 8 : roff + 4 + rln] = rc4.crypt(
                    new[roff + 8 : roff + 4 + rln]
                )
            else:
                out[roff + 4 : roff + 4 + rln] = rc4.crypt(
                    new[roff + 4 : roff + 4 + rln]
                )
    stream = bytes(out)
    if len(stream) < _CFB_CUTOFF:
        stream += b"\x00" * (_CFB_CUTOFF - len(stream))
    return build_cfb([
        ("Workbook", stream),
        ("\x05SummaryInformation",
         build_summary_information("", "", 0)),
    ])


def encrypt_doc(blob: bytes, password: str = _OFFICE_DEFAULT_PW,
                *, salt_seed: bytes = b"d") -> bytes:
    """A plaintext .doc compound file re-written with the binary RC4
    table-stream protection ([MS-OFFCRYPTO] 2.3.6 via [MS-DOC]
    2.2.6.2): fEncrypted set in the FIB, lKey = 52 (the size of the
    EncryptionHeader leading the table stream: vMajor/vMinor, Salt,
    EncryptedVerifier, EncryptedVerifierHash), the WordDocument
    stream encrypted from byte 68 (the plaintext FIB base) and the
    selected table stream from byte 52, each with its OWN cipher
    whose position is the absolute stream offset, re-keyed every 512
    bytes. Write partner of the decrypt arm in
    :func:`doc_extract_text`."""
    ms = cfb_members(blob, with_data=True)
    streams = {m["name"]: m["data"] for m in ms if m["size"] is not None}
    word = bytearray(streams["WordDocument"])
    (flags,) = struct.unpack_from("<H", word, 10)
    tbl_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(tbl_name, b"")
    struct.pack_into("<H", word, 10, flags | 0x0100)  # fEncrypted
    struct.pack_into("<I", word, 14, 52)  # lKey: header size

    salt = hashlib.md5(salt_seed + b":docsalt").digest()
    verifier = hashlib.md5(salt_seed + b":docver").digest()
    rc4 = _OfficeRC4(password, salt, 512)
    ev = rc4.crypt(verifier)
    evh = rc4.crypt(hashlib.md5(verifier).digest())
    header = struct.pack("<HH", 1, 1) + salt + ev + evh

    rc4 = _OfficeRC4(password, salt, 512)
    rc4.skip(68)
    word_enc = bytes(word[:68]) + rc4.crypt(bytes(word[68:]))
    rc4 = _OfficeRC4(password, salt, 512)
    rc4.skip(52)
    table_enc = header + rc4.crypt(table)

    out = []
    for m in ms:
        if m["size"] is None:
            continue
        if m["name"] == "WordDocument":
            out.append((m["name"], word_enc))
        elif m["name"] == tbl_name:
            out.append((m["name"], table_enc))
        else:
            out.append((m["name"], m["data"]))
    if tbl_name not in streams:
        # Word 6-era simple files carry no table stream: the
        # EncryptionHeader still needs one
        out.append((tbl_name, table_enc))
    return build_cfb(out)


# ---------------------------------------------------------------------------
# OOXML (ECMA-376) encryption (r13) — the MODERN password-protected
# Office form: a CFB container holding EncryptionInfo +
# EncryptedPackage around an ordinary .docx/.xlsx/.pptx zip.
# STANDARD form ([MS-OFFCRYPTO] 2.3.4.5-2.3.4.9): AES-ECB, SHA-1
# 50000-round spin, X1/X2 ipad/opad-style derivation. AGILE form
# (2.3.4.10-2.3.4.15, Office 2010+ default): XML descriptor, SHA-512
# spin, AES-CBC with per-purpose block keys, segmented package
# cipher, HMAC data integrity.
# ---------------------------------------------------------------------------

# per-purpose block keys, [MS-OFFCRYPTO] 2.3.4.13/2.3.4.14/2.3.4.15
_AGILE_BK_VERIFIER_INPUT = bytes.fromhex("fea7d2763b4b9e79")
_AGILE_BK_VERIFIER_VALUE = bytes.fromhex("d7aa0f6d3061344e")
_AGILE_BK_KEY_VALUE = bytes.fromhex("146e0be7abacd0d6")
_AGILE_BK_HMAC_KEY = bytes.fromhex("5fb2ad010cb9e1f6")
_AGILE_BK_HMAC_VALUE = bytes.fromhex("a0677f02b22c8433")

_AGILE_HASHES = {
    "SHA1": "sha1", "SHA256": "sha256", "SHA384": "sha384",
    "SHA512": "sha512",
}


def _ooxml_spin(hash_name: str, password: str, salt: bytes,
                spin: int) -> bytes:
    """H = Hash(salt ‖ UTF-16LE(password)); then spin rounds of
    H = Hash(LE32(i) ‖ H) — the iteration order both ECMA-376 forms
    share."""
    hf = getattr(hashlib, hash_name)
    h = hf(salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hf(struct.pack("<I", i) + h).digest()
    return h


def _ooxml_standard_key(password: str, salt: bytes,
                        keylen: int) -> bytes:
    """Standard-form key: 50000-round SHA-1 spin, block 0 appended,
    then the X1/X2 0x36/0x5C-pad derivation ([MS-OFFCRYPTO]
    2.3.4.7)."""
    h = _ooxml_spin("sha1", password, salt, 50000)
    hfinal = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    buf1 = bytes(b ^ 0x36 for b in hfinal) + b"\x36" * (64 - 20)
    buf2 = bytes(b ^ 0x5C for b in hfinal) + b"\x5c" * (64 - 20)
    x1 = hashlib.sha1(buf1).digest()
    x2 = hashlib.sha1(buf2).digest()
    return (x1 + x2)[:keylen]


def _agile_key(hash_name: str, h_spun: bytes, block_key: bytes,
               keylen: int) -> bytes:
    """Per-purpose agile key: Hash(spun ‖ blockKey) truncated (or
    0x36-padded) to the key length."""
    hf = getattr(hashlib, hash_name)
    k = hf(h_spun + block_key).digest()
    if len(k) < keylen:
        k += b"\x36" * (keylen - len(k))
    return k[:keylen]


def _agile_iv(hash_name: str, salt: bytes,
              block_key: bytes | None) -> bytes:
    """Agile IV: the salt itself (no block key) or Hash(salt ‖
    blockKey), truncated/0x36-padded to the 16-byte block size."""
    if block_key is None:
        iv = salt
    else:
        iv = getattr(hashlib, hash_name)(salt + block_key).digest()
    if len(iv) < 16:
        iv += b"\x36" * (16 - len(iv))
    return iv[:16]


def _pad16(data: bytes) -> bytes:
    return data + b"\x00" * (-len(data) % 16)


def build_ooxml_encrypted(
    package: bytes, password: str = _OFFICE_DEFAULT_PW, *,
    agile: bool = True, spin: int = 1000, salt_seed: bytes = b"o",
    hash_name: str = "sha512",
) -> bytes:
    """``package`` (an ordinary OOXML zip) wrapped in the ECMA-376
    encryption container. The agile arm writes the XML descriptor
    (configurable spinCount/hash — real writers use 100000/SHA512;
    fixtures keep the spin small because the FIELD drives the
    reader), AES-256-CBC per-purpose keys, the 4096-byte segmented
    package cipher, and the HMAC dataIntegrity pair. The standard
    arm writes the binary header (AES-128-ECB, the spec-FIXED
    50000-round SHA-1 spin). Write partner of
    :func:`ooxml_decrypt`."""
    from hadoopxmlextractor_spark.operators import aes as A

    if not agile:
        salt = hashlib.md5(salt_seed + b":stds").digest()
        key = _ooxml_standard_key(password, salt, 16)
        verifier = hashlib.md5(salt_seed + b":stdv").digest()
        ev = A.ecb_encrypt(key, verifier)
        vh = hashlib.sha1(verifier).digest()
        evh = A.ecb_encrypt(key, _pad16(vh))
        csp = "Microsoft Enhanced RSA and AES Cryptographic Provider"
        header = struct.pack(
            "<IIIIIIII", 0x24, 0, 0x660E, 0x8004, 128, 0x18, 0, 0
        ) + csp.encode("utf-16-le") + b"\x00\x00"
        info = (
            struct.pack("<HHI", 4, 2, 0x24)
            + struct.pack("<I", len(header)) + header
            + struct.pack("<I", 16) + salt + ev
            + struct.pack("<I", 20) + evh
        )
        enc_pkg = (
            struct.pack("<Q", len(package))
            + A.ecb_encrypt(key, _pad16(package))
        )
        return build_cfb([
            ("EncryptionInfo", info),
            ("EncryptedPackage", enc_pkg),
        ])

    import base64
    import hmac as hmac_mod

    hname = hash_name.lower()
    hf = getattr(hashlib, hname)
    kd_salt = hashlib.md5(salt_seed + b":kds").digest()
    pw_salt = hashlib.md5(salt_seed + b":pws").digest()
    pkg_key = hf(salt_seed + b":pk").digest()[:32]
    h_spun = _ooxml_spin(hname, password, pw_salt, spin)
    k_vi = _agile_key(hname, h_spun, _AGILE_BK_VERIFIER_INPUT, 32)
    k_vv = _agile_key(hname, h_spun, _AGILE_BK_VERIFIER_VALUE, 32)
    k_kv = _agile_key(hname, h_spun, _AGILE_BK_KEY_VALUE, 32)
    iv_pw = _agile_iv(hname, pw_salt, None)
    verifier_input = hashlib.md5(salt_seed + b":vi").digest()
    e_vi = A.cbc_encrypt_nopad(k_vi, iv_pw, _pad16(verifier_input))
    e_vv = A.cbc_encrypt_nopad(
        k_vv, iv_pw, _pad16(hf(verifier_input).digest())
    )
    e_kv = A.cbc_encrypt_nopad(k_kv, iv_pw, pkg_key)

    # segmented package cipher: 4096-byte segments, IV per segment
    body = b""
    for seg in range(0, max(len(package), 1), 4096):
        chunk = package[seg : seg + 4096]
        iv = _agile_iv(hname, kd_salt, struct.pack("<I", seg // 4096))
        body += A.cbc_encrypt_nopad(pkg_key, iv, _pad16(chunk))
    enc_pkg = struct.pack("<Q", len(package)) + body

    hmac_key = hf(salt_seed + b":hk").digest()
    e_hk = A.cbc_encrypt_nopad(
        pkg_key, _agile_iv(hname, kd_salt, _AGILE_BK_HMAC_KEY),
        _pad16(hmac_key),
    )
    hval = hmac_mod.new(hmac_key, enc_pkg, hf).digest()
    e_hv = A.cbc_encrypt_nopad(
        pkg_key, _agile_iv(hname, kd_salt, _AGILE_BK_HMAC_VALUE),
        _pad16(hval),
    )

    b64 = lambda x: base64.b64encode(x).decode()  # noqa: E731
    hsize = hf(b"").digest_size
    hup = {"sha1": "SHA1", "sha256": "SHA256", "sha384": "SHA384",
           "sha512": "SHA512"}[hname]
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<encryption xmlns="http://schemas.microsoft.com/office/2006/'
        'encryption" xmlns:p="http://schemas.microsoft.com/office/2006/'
        'keyEncryptor/password">'
        f'<keyData saltSize="16" blockSize="16" keyBits="256" '
        f'hashSize="{hsize}" cipherAlgorithm="AES" '
        f'cipherChaining="ChainingModeCBC" hashAlgorithm="{hup}" '
        f'saltValue="{b64(kd_salt)}"/>'
        f'<dataIntegrity encryptedHmacKey="{b64(e_hk)}" '
        f'encryptedHmacValue="{b64(e_hv)}"/>'
        '<keyEncryptors><keyEncryptor uri="http://schemas.microsoft.'
        'com/office/2006/keyEncryptor/password">'
        f'<p:encryptedKey spinCount="{spin}" saltSize="16" '
        f'blockSize="16" keyBits="256" hashSize="{hsize}" '
        f'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        f'hashAlgorithm="{hup}" saltValue="{b64(pw_salt)}" '
        f'encryptedVerifierHashInput="{b64(e_vi)}" '
        f'encryptedVerifierHashValue="{b64(e_vv)}" '
        f'encryptedKeyValue="{b64(e_kv)}"/>'
        '</keyEncryptor></keyEncryptors></encryption>'
    )
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode()
    return build_cfb([
        ("EncryptionInfo", info),
        ("EncryptedPackage", enc_pkg),
    ])


def ooxml_decrypt(blob: bytes,
                  password: str = _OFFICE_DEFAULT_PW) -> bytes:
    """The plaintext OOXML zip inside an ECMA-376 encryption
    container — both shipping forms:

    - AGILE (4.4): XML descriptor parsed for real (hash family,
      spinCount, salts, AES-CBC chaining all field-driven); the
      verifierHashInput/Value pair AUTHENTICATES the password, the
      package key unwraps from encryptedKeyValue, the HMAC
      dataIntegrity pair is VERIFIED over the whole EncryptedPackage
      stream before any payload byte is trusted, then the 4096-byte
      segments decrypt with per-segment IVs.
    - STANDARD (2/3/4 . 2): binary header (AES-128/192/256 ECB,
      SHA-1), the spec-fixed 50000-round spin, SHA1(verifier) check.

    A failed verifier (a REAL password), a failed HMAC, RC4-flagged
    standard headers, or unsupported cipher/chaining refuse
    (ValueError) — the marker-row contract."""
    import base64
    import hmac as hmac_mod

    from hadoopxmlextractor_spark.operators import aes as A

    streams = {
        m["name"]: m["data"]
        for m in cfb_members(blob, with_data=True)
        if m["size"] is not None
    }
    info = streams.get("EncryptionInfo")
    pkg = streams.get("EncryptedPackage")
    if info is None or pkg is None:
        raise ValueError("not an OOXML encryption container")
    vmaj, vmin, flags = struct.unpack_from("<HHI", info, 0)
    (orig_size,) = struct.unpack_from("<Q", pkg, 0)

    if (vmaj, vmin) == (4, 4) and flags == 0x40:
        root = ElementTree.fromstring(info[8:].decode("utf-8"))
        ns = "{http://schemas.microsoft.com/office/2006/encryption}"
        pns = ("{http://schemas.microsoft.com/office/2006/"
               "keyEncryptor/password}")
        kd = root.find(f"{ns}keyData")
        ek = root.find(f".//{pns}encryptedKey")
        di = root.find(f"{ns}dataIntegrity")
        if kd is None or ek is None:
            raise ValueError("malformed agile descriptor")
        for el in (kd, ek):
            if (el.get("cipherAlgorithm") != "AES"
                    or el.get("cipherChaining") != "ChainingModeCBC"):
                raise ValueError("unsupported agile cipher")
        hname = _AGILE_HASHES.get(ek.get("hashAlgorithm", ""))
        kd_hname = _AGILE_HASHES.get(kd.get("hashAlgorithm", ""))
        if hname is None or kd_hname is None:
            raise ValueError("unsupported agile hash")
        hname = hname.lower()
        kd_hname = kd_hname.lower()
        hf = getattr(hashlib, hname)
        spin = int(ek.get("spinCount"))
        if not 0 < spin <= 10_000_000:
            raise ValueError("agile spinCount out of range")
        keylen = int(ek.get("keyBits")) // 8
        pkg_keylen = int(kd.get("keyBits")) // 8
        pw_salt = base64.b64decode(ek.get("saltValue"))
        kd_salt = base64.b64decode(kd.get("saltValue"))
        e_vi = base64.b64decode(ek.get("encryptedVerifierHashInput"))
        e_vv = base64.b64decode(ek.get("encryptedVerifierHashValue"))
        e_kv = base64.b64decode(ek.get("encryptedKeyValue"))
        h_spun = _ooxml_spin(hname, password, pw_salt, spin)
        iv_pw = _agile_iv(hname, pw_salt, None)
        vi = A.cbc_decrypt_nopad(
            _agile_key(hname, h_spun, _AGILE_BK_VERIFIER_INPUT,
                       keylen), iv_pw, e_vi,
        )[: len(pw_salt)]
        vv = A.cbc_decrypt_nopad(
            _agile_key(hname, h_spun, _AGILE_BK_VERIFIER_VALUE,
                       keylen), iv_pw, e_vv,
        )[: hf(b"").digest_size]
        if hf(vi).digest() != vv:
            raise ValueError("encrypted OOXML (password)")
        pkg_key = A.cbc_decrypt_nopad(
            _agile_key(hname, h_spun, _AGILE_BK_KEY_VALUE, keylen),
            iv_pw, e_kv,
        )[:pkg_keylen]
        if di is not None:
            hmac_key = A.cbc_decrypt_nopad(
                pkg_key,
                _agile_iv(kd_hname, kd_salt, _AGILE_BK_HMAC_KEY),
                base64.b64decode(di.get("encryptedHmacKey")),
            )[: hf(b"").digest_size]
            want = A.cbc_decrypt_nopad(
                pkg_key,
                _agile_iv(kd_hname, kd_salt, _AGILE_BK_HMAC_VALUE),
                base64.b64decode(di.get("encryptedHmacValue")),
            )[: hf(b"").digest_size]
            got = hmac_mod.new(
                hmac_key, pkg, getattr(hashlib, kd_hname)
            ).digest()
            if got != want:
                raise ValueError("OOXML dataIntegrity HMAC mismatch")
        out = bytearray()
        body = pkg[8:]
        for seg in range(0, len(body), 4096):
            iv = _agile_iv(kd_hname, kd_salt,
                           struct.pack("<I", seg // 4096))
            out += A.cbc_decrypt_nopad(
                pkg_key, iv, body[seg : seg + 4096]
            )
        if orig_size > len(out):
            raise ValueError("OOXML package shorter than declared")
        return bytes(out[:orig_size])

    if vmin == 2 and vmaj in (2, 3, 4):
        if flags & 0x20 == 0 and flags != 0x24:
            # fCryptoAPI without fAES ⇒ the RC4 CryptoAPI form
            raise ValueError("RC4 CryptoAPI OOXML unsupported")
        (hsize,) = struct.unpack_from("<I", info, 8)
        header = info[12 : 12 + hsize]
        alg_id, _algh, key_bits = struct.unpack_from("<III", header, 8)
        keylen = {0x660E: 16, 0x660F: 24, 0x6610: 32}.get(alg_id)
        if keylen is None or key_bits != keylen * 8:
            raise ValueError("unsupported standard-form cipher")
        at = 12 + hsize
        (salt_size,) = struct.unpack_from("<I", info, at)
        if salt_size != 16:
            raise ValueError("bad standard-form salt size")
        salt = info[at + 4 : at + 20]
        ev = info[at + 20 : at + 36]
        (vh_size,) = struct.unpack_from("<I", info, at + 36)
        evh = info[at + 40 : at + 72]
        if vh_size != 20 or len(evh) < 32:
            raise ValueError("bad standard-form verifier")
        key = _ooxml_standard_key(password, salt, keylen)
        verifier = A.ecb_decrypt(key, ev)
        vh = A.ecb_decrypt(key, evh)[:20]
        if hashlib.sha1(verifier).digest() != vh:
            raise ValueError("encrypted OOXML (password)")
        out = A.ecb_decrypt(key, _pad16(pkg[8:]))
        if orig_size > len(out):
            raise ValueError("OOXML package shorter than declared")
        return out[:orig_size]

    raise ValueError("unknown OOXML encryption version")


# ---------------------------------------------------------------------------
# OLE property sets, full fidelity (r13): CodePage-aware VT_LPSTR,
# VT_LPWSTR, and the \x05DocumentSummaryInformation stream (GKPIDDSI)
# ---------------------------------------------------------------------------

_FMTID_SUMMARY = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
_FMTID_DOCSUMMARY = bytes.fromhex("02d5cdd59c2e1b10939708002b2cf9ae")


def _ole_codec(codepage: int) -> str:
    if codepage == 1200:
        return "utf-16-le"
    if codepage == 65001:
        return "utf-8"
    try:
        "".encode(f"cp{codepage}")
        return f"cp{codepage}"
    except LookupError:
        return "latin-1"


def build_property_set(
    fmtid: bytes, props: list[tuple[int, int, object]], *,
    codepage: int = 1252,
) -> bytes:
    """One [MS-OLEPS] property-set stream: the CodePage property
    (PID 1, VT_I2) leads — it drives every VT_LPSTR's encoding, the
    detail naive readers skip and then mojibake CJK metadata — then
    the given (pid, vt, value) properties (VT_I2/I4, VT_LPSTR,
    VT_LPWSTR, VT_FILETIME as unix seconds)."""
    codec = _ole_codec(codepage)

    def enc(vt: int, value) -> bytes:
        if vt == 2:  # VT_I2
            return struct.pack("<IhH", 2, int(value), 0)
        if vt == 3:  # VT_I4
            return struct.pack("<Ii", 3, int(value))
        if vt == 30:  # VT_LPSTR (CodePage-encoded)
            raw = str(value).encode(codec) + (
                b"\x00\x00" if codec == "utf-16-le" else b"\x00"
            )
            raw = raw.ljust((len(raw) + 3) // 4 * 4, b"\x00")
            return struct.pack("<II", 30, len(raw)) + raw
        if vt == 31:  # VT_LPWSTR (always UTF-16LE, cch incl. NUL)
            u = str(value).encode("utf-16-le") + b"\x00\x00"
            pad = u.ljust((len(u) + 3) // 4 * 4, b"\x00")
            return struct.pack("<II", 31, len(u) // 2) + pad
        if vt == 64:  # VT_FILETIME from unix seconds
            ft = (int(value) + 11644473600) * 10_000_000
            return struct.pack("<IQ", 64, ft)
        raise ValueError(f"unsupported property type {vt}")

    all_props = [(0x0001, struct.pack("<IhH", 2, codepage, 0))]
    all_props += [(pid, enc(vt, v)) for pid, vt, v in props]
    head_size = 8 + 8 * len(all_props)
    offs, bodies = [], []
    at = head_size
    for pid, body in all_props:
        offs.append((pid, at))
        bodies.append(body)
        at += len(body)
    section = struct.pack("<II", at, len(all_props))
    for pid, off in offs:
        section += struct.pack("<II", pid, off)
    section += b"".join(bodies)
    return (
        struct.pack("<HHI", 0xFFFE, 0, 0)
        + b"\x00" * 16
        + struct.pack("<I", 1)
        + fmtid
        + struct.pack("<I", 48)
        + section
    )


def parse_property_set(data: bytes) -> tuple[int, dict]:
    """(codepage, {pid: value}) of an [MS-OLEPS] property-set stream
    — a TWO-PASS read: the CodePage property (PID 1) is resolved
    FIRST, then every VT_LPSTR decodes with it (the CJK-metadata
    fidelity detail); VT_LPWSTR is always UTF-16LE. Malformed
    sections refuse."""
    if len(data) < 48:
        raise ValueError("truncated property set")
    if data[:2] != b"\xfe\xff":
        raise ValueError("bad property-set byte order")
    (n_sets,) = struct.unpack("<I", data[24:28])
    if n_sets < 1:
        raise ValueError("empty property set")
    (sec_off,) = struct.unpack("<I", data[44:48])
    if sec_off + 8 > len(data):
        raise ValueError("property section past EOF")
    sec_size, count = struct.unpack("<II", data[sec_off : sec_off + 8])
    if sec_off + sec_size > len(data) or sec_off + 8 + 8 * count > len(
        data
    ):
        raise ValueError("property section past EOF")
    idx = [
        struct.unpack(
            "<II", data[sec_off + 8 + 8 * k : sec_off + 16 + 8 * k]
        )
        for k in range(count)
    ]
    codepage = 1252
    have_cp = False
    for pid, off in idx:
        if pid == 0x0001:
            at = sec_off + off
            (vt,) = struct.unpack("<I", data[at : at + 4])
            if vt == 2:
                (codepage,) = struct.unpack(
                    "<h", data[at + 4 : at + 6]
                )
                codepage &= 0xFFFF
                have_cp = True
    codec = _ole_codec(codepage) if have_cp else "latin-1"
    out: dict[int, object] = {}
    for pid, off in idx:
        at = sec_off + off
        (vt,) = struct.unpack("<I", data[at : at + 4])
        if vt == 2:
            (out[pid],) = struct.unpack("<h", data[at + 4 : at + 6])
        elif vt == 3:
            (out[pid],) = struct.unpack("<i", data[at + 4 : at + 8])
        elif vt == 30:
            (ln,) = struct.unpack("<I", data[at + 4 : at + 8])
            raw = data[at + 8 : at + 8 + ln]
            out[pid] = raw.decode(codec, "replace").split("\x00")[0]
        elif vt == 31:
            (cch,) = struct.unpack("<I", data[at + 4 : at + 8])
            raw = data[at + 8 : at + 8 + 2 * cch]
            out[pid] = raw.decode("utf-16-le").split("\x00")[0]
        elif vt == 64:
            (ft,) = struct.unpack("<Q", data[at + 4 : at + 12])
            out[pid] = ft // 10_000_000 - 11644473600
    return codepage if have_cp else None, out


def build_doc_summary_information(
    category: str, manager: str, company: str, *,
    codepage: int = 1252, wide: bool = False,
) -> bytes:
    """A \\x05DocumentSummaryInformation stream (GKPIDDSI: category
    0x02, manager 0x0E, company 0x0F) — LPSTR under ``codepage`` or
    LPWSTR when ``wide``."""
    vt = 31 if wide else 30
    return build_property_set(
        _FMTID_DOCSUMMARY,
        [(0x02, vt, category), (0x0E, vt, manager),
         (0x0F, vt, company)],
        codepage=codepage,
    )


def parse_doc_summary_information(data: bytes) -> dict:
    """{category, manager, company, codepage} of a
    DocumentSummaryInformation stream."""
    cp, props = parse_property_set(data)
    return {
        "category": props.get(0x02),
        "manager": props.get(0x0E),
        "company": props.get(0x0F),
        "codepage": cp,
    }
