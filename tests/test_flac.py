"""Native FLAC full-sample decode (operators/flac.py, round 10)."""

from __future__ import annotations

import hashlib
import random

import pytest

from hadoopxmlextractor_spark.operators import flac as FL

BS = 64


def _mk(trial, rng, nf):
    n = BS * nf
    L = [rng.randint(-32768, 32767) for _ in range(n)]
    R = [rng.randint(-32768, 32767) for _ in range(n)]
    plans = []
    for f in range(nf):
        mode = {0: 0, 1: 8, 2: 9, 3: 10}[(trial + f) % 4]
        sfs = []
        for ch in range(2):
            t = (trial + f + ch) % 4
            if mode == 0 and t == 3:
                c = rng.randint(-1000, 1000)
                tgt = L if ch == 0 else R
                for j in range(f * BS, (f + 1) * BS):
                    tgt[j] = c
                sfs.append({"type": "constant"})
            elif t == 0:
                sfs.append({"type": "verbatim"})
            elif t == 1:
                sfs.append({"type": "fixed", "order": (trial + f) % 5,
                            "po": (trial + f) % 3,
                            "rice2": bool((trial + ch) % 2),
                            "escape": (trial + f + ch) % 4 == 0})
            else:
                sfs.append({"type": "lpc", "order": 2, "coefs": [3, -1],
                            "shift": 1, "precision": 4,
                            "po": (trial + 1) % 3})
        plans.append({"mode": mode, "subframes": sfs})
    return L, R, plans


def test_flac_roundtrip_matrix():
    """encode→decode identity across stereo modes × subframe types ×
    rice methods × partition orders × escapes × sample-rate header
    paths — with the STREAMINFO MD5 verifying on every stream."""
    rng = random.Random(42)
    for trial in range(40):
        nf = 2 + trial % 2
        L, R, plans = _mk(trial, rng, nf)
        sr = (8000, 44100, 48000)[trial % 3]
        blob = FL.encode_flac([L, R], sr, 16, blocksize=BS,
                              frame_plans=plans,
                              sr_in_frame=bool(trial % 2))
        d = FL.decode_flac(blob)
        assert d["samples"] == [L, R], trial
        assert d["md5_ok"] and d["sample_rate"] == sr
        assert d["n_frames"] == nf


def test_flac_wasted_bits_and_tamper():
    rng = random.Random(7)
    L = [(rng.randint(-8000, 8000) & ~3) for _ in range(BS)]
    R = [(rng.randint(-8000, 8000) & ~3) for _ in range(BS)]
    blob = FL.encode_flac(
        [L, R], 44100, 16, blocksize=BS,
        frame_plans=[{"mode": 0, "subframes": [
            {"type": "verbatim", "wasted": 2},
            {"type": "fixed", "order": 2, "wasted": 2, "po": 1},
        ]}],
    )
    d = FL.decode_flac(blob)
    assert d["samples"] == [L, R] and d["md5_ok"]
    # three integrity layers: md5 arm, CRC-16 tamper, CRC-8 tamper
    bad = FL.encode_flac(
        [L, R], 44100, 16, blocksize=BS,
        frame_plans=[{"mode": 10, "subframes": [
            {"type": "verbatim"}, {"type": "verbatim"}]}],
        corrupt_md5=True,
    )
    assert FL.decode_flac(bad)["md5_ok"] is False
    t = bytearray(blob)
    t[-10] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(t))
    t = bytearray(blob)
    # flip a bit inside the frame header's blocksize byte
    hdr_off = blob.index(b"\xff\xf8")
    t[hdr_off + 4] ^= 1
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(t))
    with pytest.raises(ValueError, match="not a FLAC"):
        FL.decode_flac(b"junk")


def test_flac_synth_rotations_cover_everything():
    """The fixture synth reaches every decode path across the doc
    range: all four stereo modes, all subframe families, both rice
    methods, escapes, the wasted-bits arm, both sample-rate header
    paths, and the corrupt-md5 arm."""
    seen = {"indep": 0, "ls": 0, "sr_": 0, "ms": 0, "const": 0,
            "wasted": 0, "srhdr0": 0, "badmd5": 0}
    for i in range(60):
        b = hashlib.md5(f"{i}:flacd".encode()).digest()
        d = FL.decode_flac(FL._synth_flac_doc(i))
        assert d["n_frames"] == 2 + b[0] % 2
        assert d["md5_ok"] == (i % 11 != 5)
        for f in range(d["n_frames"]):
            m = (b[1] + f) % 4
            seen[("indep", "ls", "sr_", "ms")[m]] += 1
            for ch in range(2):
                if m == 0 and (b[2] + f + ch) % 4 == 3:
                    seen["const"] += 1
                if (m == 0 and (b[2] + f + ch) % 4 == 0 and ch == 1
                        and (b[6] + f) % 2):
                    seen["wasted"] += 1
        seen["srhdr0"] += 1 - b[9] % 2
        seen["badmd5"] += i % 11 == 5
        # decoded modes match the plan
        assert d["modes"] == [
            # independent stereo reports ca = channels-1 = 1
            {0: 1, 1: 8, 2: 9, 3: 10}[(b[1] + f) % 4]
            for f in range(d["n_frames"])
        ]
    assert all(v > 0 for v in seen.values()), seen


def test_flac_crc_known_vectors():
    """Independent cross-validation of the integrity layer: the FLAC
    CRCs must match the PUBLISHED check values for their parameter
    sets (CRC-8 poly 0x07 init 0 -> 0xF4 over '123456789'; CRC-16
    poly 0x8005 init 0 non-reflected, the CRC-16/UMTS set ->
    0xFEE8) — a mirrored polynomial/shift bug in encoder+decoder
    cannot fake these."""
    assert FL._crc8(b"123456789") == 0xF4
    assert FL._crc16(b"123456789") == 0xFEE8
    assert FL._crc8(b"") == 0 and FL._crc16(b"") == 0


def test_flac_picture_block_roundtrip_and_refusals():
    import pytest

    from hadoopxmlextractor_spark.operators import flac as FL

    si = bytes([0]) + (34).to_bytes(3, "big") + b"\x00" * 34
    pic = FL.build_flac_picture_block(
        pic_type=3, mime="image/png", description="déjà",
        width=8, height=8, depth=24, data=b"\x89PNGdata",
    )
    rows = FL.flac_pictures(b"fLaC" + si + pic)
    assert rows == [{
        "pic_type": 3, "mime": "image/png", "description": "déjà",
        "width": 8, "height": 8, "depth": 24, "colors": 0,
        "data": b"\x89PNGdata",
    }]
    # truncated picture payload refuses
    whole = b"fLaC" + si + pic
    with pytest.raises(ValueError, match="truncated"):
        FL.flac_pictures(whole[:-4])
    # a FLAC without pictures yields no rows, not an error
    si_last = bytes([0x80]) + (34).to_bytes(3, "big") + b"\x00" * 34
    assert FL.flac_pictures(b"fLaC" + si_last) == []


def test_flac_corrupt_and_truncated_streams_refuse():
    """r15 opt regression guard: the residual reader's bit-walk was
    inlined over local state — every truncated or bit-flipped stream
    must still REFUSE (ValueError) or decode to a valid result, never
    crash or silently mis-decode past a CRC. Deterministic battery
    over all fixture arms."""
    import random

    rng = random.Random(11)
    refused = 0
    for t in range(120):
        blob = bytearray(FL._synth_flac_doc(t % 60))
        if t % 2:
            blob = blob[: rng.randrange(4, len(blob))]
        else:
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        try:
            FL.decode_flac(bytes(blob))
        except (ValueError, IndexError):
            refused += 1
    # virtually every corruption lands in a CRC-covered span or
    # truncates structure; the battery must actually exercise refusal
    assert refused >= 100
