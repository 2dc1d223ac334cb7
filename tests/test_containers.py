"""Round-9 modern-container metadata walks: MP4/ISO-BMFF, WebM/EBML,
WebP — parser-vs-synth replay across the rotating layout matrices,
dispatch totality from the shared container-meta operators, and the
malformed-input marker contract."""

from __future__ import annotations

import hashlib
import struct

import pytest

from hadoopxmlextractor_spark.operators.containers import (
    _parse_mp4_audio_meta,
    _parse_mp4_meta,
    _parse_webm_meta,
    _parse_webp_meta,
    _synth_m4a_blob,
    _synth_mp4_video_blob,
    _synth_webm_blob,
    _synth_webp_blob,
)


def test_mp4_box_walk_rotating_layouts():
    """The MP4 walk survives every layout the synth rotates — mvhd
    v0/v1, free-box interleave, audio-track-first ordering, 1- vs
    2-entry stts — and replays dims/codec/frames/duration exactly;
    the doc range is wide enough that every rotation branch occurs."""
    seen = {"v1": 0, "free": 0, "audio_first": 0, "stts2": 0}
    for i in range(300):
        b = hashlib.md5(f"{i}:mp4".encode()).digest()
        ts = (600, 1000, 90000, 30000)[b[2] % 4]
        dur = ts * (1 + b[10] % 10) + b[4]
        got = _parse_mp4_meta(_synth_mp4_video_blob(i))
        assert got == {
            "codec": ("avc1", "hev1", "vp09", "av01")[b[5] % 4],
            "width": 16 * (b[0] % 40 + 1),
            "height": 16 * (b[1] % 24 + 1),
            "fps_num": None,
            "fps_den": None,
            "n_frames": 10 + b[3] % 90,
            "duration_ms": dur * 1000 // ts,
        }
        seen["v1"] += b[7] % 2
        seen["free"] += b[6] % 2
        seen["audio_first"] += b[8] % 2
        seen["stts2"] += b[9] % 2
    assert all(0 < v < 300 for v in seen.values()), seen


def test_mp4_largesize_box_and_64bit_mvhd():
    """size==1 largesize escape parses; a 64-bit mvhd duration past
    2^32 converts without overflow."""
    from hadoopxmlextractor_spark.operators.containers import _box

    blob = _synth_mp4_video_blob(7)
    # re-wrap the whole file's mdat as a largesize box: parse unchanged
    meta = _parse_mp4_meta(blob)
    big_mdat = _box(b"mdat", b"\x00" * 32, largesize=True)
    assert _parse_mp4_meta(blob + big_mdat) == meta
    # synthetic v1 mvhd with duration > 2^32
    ts, dur = 90000, (1 << 33) + 12345
    mvhd = _box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">IQ", ts, dur) + b"\x00" * 80,
    )
    tail = blob[blob.index(b"moov") - 4:]
    # splice: ftyp + moov with our mvhd + original traks
    (moov_size,) = struct.unpack(">I", tail[:4])
    moov_body = tail[8:moov_size]
    # drop the original mvhd (first child box)
    (old_sz,) = struct.unpack(">I", moov_body[:4])
    new_moov = _box(b"moov", mvhd + moov_body[old_sz:])
    got = _parse_mp4_meta(_box(b"ftyp", b"isom") + new_moov)
    assert got["duration_ms"] == dur * 1000 // ts


def test_webm_ebml_walk_rotating_layouts():
    """The EBML walk replays dims/codec/frames/duration exactly across
    the rotation matrix — float32 vs float64 Duration, Void padding,
    Info/Tracks order swap, audio TrackEntry present (whose
    SimpleBlocks must NOT count toward the video frame count)."""
    seen = {"f32": 0, "void": 0, "swap": 0, "audio": 0}
    for i in range(300):
        b = hashlib.md5(f"{i}:webm".encode()).digest()
        scale = (1_000_000, 500_000, 100_000)[b[3] % 3]
        du = 1000 * (1 + b[4] % 20) + b[5]
        got = _parse_webm_meta(_synth_webm_blob(i))
        assert got == {
            "codec": ("V_VP8", "V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")[
                b[2] % 4
            ],
            "width": 16 * (b[0] % 40 + 1),
            "height": 16 * (b[1] % 24 + 1),
            "fps_num": None,
            "fps_den": None,
            "n_frames": 1 + b[7] % 8,
            "duration_ms": du * scale // 1_000_000,
        }
        seen["f32"] += b[10] % 2
        seen["void"] += b[9] % 2
        seen["swap"] += b[14] % 2
        seen["audio"] += b[12] % 2
    assert all(0 < v < 300 for v in seen.values()), seen


def test_webm_audio_blocks_never_count():
    """Find a doc whose synth includes the audio TrackEntry and verify
    its frame count equals the video-block count alone (the audio
    SimpleBlock per cluster is excluded by track number)."""
    i = next(
        k for k in range(100)
        if hashlib.md5(f"{k}:webm".encode()).digest()[12] % 2
    )
    b = hashlib.md5(f"{i}:webm".encode()).digest()
    got = _parse_webm_meta(_synth_webm_blob(i))
    assert got["n_frames"] == 1 + b[7] % 8  # not + n_clusters


def test_webp_three_variants_and_flags():
    """All three WebP container variants replay exactly; flag bits
    (alpha 0x10, animation 0x02) and the VP8L-payload lossless rule
    each occur in both states across the doc range."""
    seen = {"vp8": 0, "vp8l": 0, "vp8x": 0, "alpha": 0, "anim": 0,
            "lossless": 0}
    for i in range(300):
        b = hashlib.md5(f"{i}:webp".encode()).digest()
        got = _parse_webp_meta(_synth_webp_blob(i))
        v = b[0] % 3
        seen[("vp8", "vp8l", "vp8x")[v]] += 1
        assert got["format"] == ("vp8", "vp8l", "vp8x")[v]
        if v == 2:
            assert got["has_alpha"] == bool(b[5] % 2)
            assert got["is_animated"] == bool(b[6] % 2)
            assert got["is_lossless"] == bool(b[7] % 2)
            assert got["n_chunks"] == 2 + b[5] % 2 + b[6] % 2
            seen["alpha"] += b[5] % 2
            seen["anim"] += b[6] % 2
            seen["lossless"] += b[7] % 2
    assert all(v > 0 for v in seen.values()), seen


def test_m4a_box_walk_replay():
    rates = (8000, 16000, 22050, 24000, 32000, 44100, 48000)
    for i in range(200):
        b = hashlib.md5(f"{i}:m4a".encode()).digest()
        sr = rates[b[0] % 7]
        du = sr * (1 + b[6] % 10) + b[7]
        assert _parse_mp4_audio_meta(_synth_m4a_blob(i)) == {
            "codec": "aac",
            "sample_rate": sr,
            "channels": 1 + b[1] % 2,
            "sample_bits": 16,
            "n_units": 100 + b[3] % 900,
            "bitrate_kbps": 32 + b[2] % 288,
            "is_vbr": False,
            "duration_ms": du * 1000 // sr,
            "meta_bytes": None,
        }


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"\x00" * 64,
        b"RIFF\x10\x00\x00\x00WEBPVP8 ",  # truncated chunk
        b"RIFF\x0c\x00\x00\x00WEBPJUNK\x00\x00\x00\x00",  # no VP8* chunk
        b"\x1aE\xdf\xa3\x84webm",  # bare EBML magic, no doctype element
        struct.pack(">I", 8) + b"ftyp",  # ftyp only, no moov
        struct.pack(">I", 3) + b"moov",  # size smaller than header
    ],
)
def test_malformed_containers_refuse_cleanly(blob):
    """Malformed blobs return None or raise only the exception types
    the container-meta dispatchers convert to the codec-NULL marker
    row — never a wrong-answer dict, never an uncaught type."""
    for parse in (
        _parse_mp4_meta, _parse_webm_meta,
        _parse_webp_meta, _parse_mp4_audio_meta,
    ):
        try:
            got = parse(blob)
        except (ValueError, IndexError, struct.error):
            continue
        assert got is None, (parse.__name__, got)


def test_dispatch_totality_in_shared_operators(spark):
    """One mixed DataFrame of MP4/WebM/garbage video blobs routes each
    to the right leg of video_container_meta; M4A routes through
    audio_container_meta; marker rows carry codec NULL."""
    from hadoopxmlextractor_spark.operators.multimodal import (
        audio_container_meta,
        video_container_meta,
    )

    vids = spark.createDataFrame(
        [
            (1, bytearray(_synth_mp4_video_blob(1))),
            (2, bytearray(_synth_webm_blob(2))),
            (3, bytearray(b"garbage bytes")),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in video_container_meta(vids).collect()}
    assert rows[1].codec in ("avc1", "hev1", "vp09", "av01")
    assert rows[2].codec.startswith("V_")
    assert rows[3].codec is None

    auds = spark.createDataFrame(
        [(4, bytearray(_synth_m4a_blob(4)))],
        "media_id long, content binary",
    )
    (arow,) = audio_container_meta(auds).collect()
    assert arow.codec == "aac" and arow.sample_bits == 16


# ---------------------------------------------------------------------------
# VP8L — lossless WebP codec (r9)
# ---------------------------------------------------------------------------


def test_vp8l_roundtrip_matrix():
    """encode→decode is the identity across shapes × subtract-green ×
    color-cache sizes — the lossless property the shared aHash oracle
    leans on."""
    import numpy as np

    from hadoopxmlextractor_spark.operators.vp8l import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(7)
    for (h, w) in [(8, 8), (5, 7), (1, 1), (16, 3), (2, 13)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for sg in (False, True):
            for cb in (0, 3, 6):
                blob = encode_webp_lossless(
                    img, subtract_green=sg, cache_bits=cb
                )
                assert np.array_equal(decode_webp(blob), img), (h, w, sg, cb)


def test_vp8l_backrefs_and_cache_paths():
    """LZ77 run backreferences decode through the direct-distance
    mapping and genuinely compress (the backref stream is smaller than
    the literal stream); the color cache round-trips alongside; RGBA
    alpha survives."""
    import numpy as np

    from hadoopxmlextractor_spark.operators.vp8l import (
        decode_vp8l,
        decode_webp,
        encode_vp8l,
        encode_webp_lossless,
    )

    img = np.zeros((6, 9, 3), np.uint8)
    img[3:] = 200
    img[0, 0] = [1, 2, 3]
    lit = encode_webp_lossless(img)
    for cb in (0, 4):
        blob = encode_webp_lossless(img, run_backrefs=True, cache_bits=cb)
        assert np.array_equal(decode_webp(blob), img), cb
    assert len(encode_webp_lossless(img, run_backrefs=True)) < len(lit)

    rgba = np.random.RandomState(3).randint(0, 256, (4, 4, 4), np.uint8)
    assert np.array_equal(decode_vp8l(encode_vp8l(rgba)), rgba)


def test_vp8l_refusal_points():
    """Malformed/unsupported streams refuse with ValueError (the
    plug-in contract): duplicate transforms, truncated meta-prefix
    sections, near-pixel distance codes (the one remaining refusal
    point), bad signature/version — and image_ahash maps a refused
    WebP to the NULL marker instead of crashing."""
    import numpy as np
    import pytest

    from hadoopxmlextractor_spark.operators.vp8l import (
        _BitWriter,
        decode_vp8l,
    )

    def header(bits_after):
        bw = _BitWriter()
        bw.write(7, 14)  # w-1
        bw.write(7, 14)  # h-1
        bw.write(0, 1)
        bw.write(0, 3)
        for v, n in bits_after:
            bw.write(v, n)
        return b"\x2f" + bw.tobytes()

    with pytest.raises(ValueError):  # duplicate subtract-green
        decode_vp8l(header([(1, 1), (2, 2), (1, 1), (2, 2)]))
    with pytest.raises(ValueError):  # truncated meta-prefix section
        decode_vp8l(header([(0, 1), (0, 1), (1, 1)]))
    with pytest.raises(ValueError):  # bad version
        bw = _BitWriter()
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(5, 3)
        decode_vp8l(b"\x2f" + bw.tobytes())
    with pytest.raises(ValueError):  # not VP8L at all
        decode_vp8l(b"\x00abc")


def test_vp8l_max_symbol_early_out_decodes():
    """The complex-code max_symbol path (trailing lengths implicitly
    zero) decodes: a handcrafted stream writes only the first lengths
    and relies on the early-out for the rest."""
    from hadoopxmlextractor_spark.operators.vp8l import (
        _BitReader,
        _BitWriter,
        _PrefixCode,
        _read_prefix_code,
    )

    # target: alphabet 256, symbols 0 and 1 with length 1, rest zero
    bw = _BitWriter()
    bw.write(0, 1)  # complex form
    # CL code over symbols {0: len1, 1: len1}: order indices 2 and 3
    bw.write(0, 4)  # num_code_lengths = 4
    bw.write(0, 3)  # order[0] = 17
    bw.write(0, 3)  # order[1] = 18
    bw.write(1, 3)  # order[2] = symbol 0 -> length 1
    bw.write(1, 3)  # order[3] = symbol 1 -> length 1
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2 -> read exactly two CL symbols
    cl = _PrefixCode([1, 1] + [0] * 17)
    cl.write(bw, 1)  # symbol 0 gets length 1
    cl.write(bw, 1)  # symbol 1 gets length 1
    code = _read_prefix_code(_BitReader(bw.tobytes()), 256)
    br = _BitReader(bytes([0b10]))  # bits: 0 then 1
    assert code.read(br) == 0
    assert code.read(br) == 1


def test_image_ahash_dispatches_webp(spark):
    """A lossless WebP of a known plane lands on the same aHash as the
    equivalent PPM (shared decode → hash path); garbage RIFF yields
    the NULL marker."""
    import hashlib

    import numpy as np

    from hadoopxmlextractor_spark.operators.multimodal import image_ahash
    from hadoopxmlextractor_spark.operators.vp8l import (
        encode_webp_lossless,
    )

    plane = b"".join(
        hashlib.md5(f"77:{k}".encode()).digest() for k in range(12)
    )[: 8 * 8 * 3]
    img = np.frombuffer(plane, np.uint8).reshape(8, 8, 3)
    ppm = f"P6\n8 8\n255\n".encode() + plane
    webp = encode_webp_lossless(img, subtract_green=True)
    media = spark.createDataFrame(
        [
            (1, bytearray(ppm)),
            (2, bytearray(webp)),
            (3, bytearray(b"RIFF\x04\x00\x00\x00WEBP")),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert rows[1] == rows[2] and rows[1] is not None
    assert rows[3] is None


def test_id3v22_layout_parses_and_future_versions_refuse():
    # v2.2: 3-byte frame ids (TT2/TP1/TAL/TYE) with 3-byte big-endian
    # sizes and 6-byte headers — the layout every pre-2000 MP3
    # carries (r10: parsed, no longer gated to the marker row)
    from hadoopxmlextractor_spark.operators import containers as C

    frames = (b"TT2" + b"\x00\x00\x05" + b"\x00titl"
              + b"TP1" + b"\x00\x00\x04" + b"\x00art"
              + b"TYE" + b"\x00\x00\x05" + b"\x001999"
              + b"\x00" * 12)  # padding stop
    blob = b"ID3\x02\x00\x00" + C._syncsafe(len(frames)) + frames
    got = C.parse_id3v2_frames(blob)
    assert got == {"title": "titl", "artist": "art", "album": None,
                   "year": "1999"}
    # an unknown FUTURE version still refuses to the marker row
    assert C.parse_id3v2_frames(b"ID3\x05\x00\x00" + C._syncsafe(0)) \
        is None
    assert C.parse_id3v2_frames(b"ID3\x03\x00\x00" + C._syncsafe(0)) \
        is not None
    # synth rotation reaches all three versions and replays exactly
    import hashlib

    seen = set()
    for i in range(30):
        b = hashlib.md5(f"{i}:id3".encode()).digest()
        got = C.parse_id3v2_frames(C._synth_id3_mp3_blob(i))
        assert got["title"] == C._ID3_TITLES[b[2] % 5], i
        assert got["year"] == str(1990 + b[6] % 40), i
        seen.add(2 + b[0] % 3)
    assert seen == {2, 3, 4}


def test_mp4_fragmented_layout_replay():
    """fMP4 (b11%2): empty moov sample tables, timing in moof/trun —
    frame count from trun sample counts keyed on track_ID (audio traf
    decoys must not count), duration from mehd (v0/v1) or, in the
    no-mehd arm, per-sample trun durations summing exactly; output is
    IDENTICAL to the progressive twin, so one shared oracle covers
    both layouts."""
    import hashlib

    from hadoopxmlextractor_spark.operators import containers as C

    arms = {"frag_mehd": 0, "frag_persample": 0, "progressive": 0}
    for i in range(60):
        b = hashlib.md5(f"{i}:mp4".encode()).digest()
        blob = C._synth_mp4_video_blob(i)
        m = C._parse_mp4_meta(blob)
        ts = C._MP4_TIMESCALES[b[2] % 4]
        dur = ts * (1 + b[10] % 10) + b[4]
        assert m["n_frames"] == 10 + b[3] % 90
        assert m["duration_ms"] == dur * 1000 // ts
        if b[11] % 2 == 0:
            arms["progressive"] += 1
            assert b"moof" not in blob
        else:
            assert b"moof" in blob and b"trun" in blob
            if b[12] % 2:
                arms["frag_persample"] += 1
                assert b"mehd" not in blob
            else:
                arms["frag_mehd"] += 1
                assert b"mehd" in blob
    assert all(v > 0 for v in arms.values()), arms


def test_webm_blockgroup_counts_like_simpleblock():
    """BlockGroup-wrapped Blocks (0xA0/0xA1) count toward the video
    frame count exactly like SimpleBlocks; audio blocks in either
    wrapping never count."""
    import hashlib

    from hadoopxmlextractor_spark.operators import containers as C

    grouped = [i for i in range(40)
               if hashlib.md5(f"{i}:webm".encode()).digest()[15] % 2 == 1]
    plain = [i for i in range(40)
             if hashlib.md5(f"{i}:webm".encode()).digest()[15] % 2 == 0]
    assert grouped and plain
    for i in grouped[:4] + plain[:4]:
        b = hashlib.md5(f"{i}:webm".encode()).digest()
        blob = C._synth_webm_blob(i)
        m = C._parse_webm_meta(blob)
        assert m["n_frames"] == 1 + b[7] % 8, (i, m)
        if b[15] % 2 and (1 + b[7] % 8) >= 2:
            assert b"\xa0" in blob  # BlockGroup id present in the mux


def test_vp8l_predictor_and_color_transforms_roundtrip():
    """r10: the PREDICTOR transform (all 14 modes via mode_salt, both
    block sizes, edge rules incl. the rightmost-column TR wrap) and
    the COLOR transform (signed int8 delta arithmetic, per-block
    ColorTransformElements) round-trip losslessly, alone and stacked
    with subtract-green and the color cache."""
    import numpy as np

    from hadoopxmlextractor_spark.operators.vp8l import (
        decode_vp8l,
        encode_vp8l,
    )

    rng = np.random.RandomState(11)
    for trial in range(24):
        h, w = int(rng.randint(1, 11)), int(rng.randint(1, 11))
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        opts = dict(
            subtract_green=bool(trial % 2),
            cache_bits=0 if trial % 3 else 3,
            predictor_bits=None if trial % 4 == 0 else 2 + trial % 2,
            cross_color_bits=None if trial % 3 == 0 else 2,
            mode_salt=trial,
        )
        out = decode_vp8l(encode_vp8l(img, **opts))
        assert np.array_equal(out[:, :, :3], img), (h, w, opts)
    # every predictor mode decodes on a block grid that uses it
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    for salt in range(14):
        out = decode_vp8l(encode_vp8l(img, predictor_bits=2,
                                      mode_salt=salt))
        assert np.array_equal(out[:, :, :3], img), salt


def test_vp8l_color_indexing_bundling_tiers():
    """r10: the color-indexing (palette) transform round-trips across
    every pixel-bundling tier (<=2/<=4/<=16 indices packed into one
    coded pixel, larger palettes unbundled), with delta-coded palette
    entries; combining indexing with other transforms refuses."""
    import numpy as np
    import pytest

    from hadoopxmlextractor_spark.operators.vp8l import (
        decode_vp8l,
        encode_vp8l,
    )

    rng = np.random.RandomState(5)
    for n_colors in (1, 2, 3, 4, 9, 16, 17, 64, 200):
        pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        for (h, w) in ((7, 9), (1, 1), (5, 16)):
            img = pal[rng.randint(0, n_colors, (h, w))]
            out = decode_vp8l(encode_vp8l(img, palette=True))
            assert np.array_equal(out[:, :, :3], img), (n_colors, h, w)
    with pytest.raises(ValueError, match="no other transform"):
        encode_vp8l(pal[rng.randint(0, n_colors, (4, 4))],
                    palette=True, subtract_green=True)


def test_vp8l_meta_prefix_groups_roundtrip():
    """r10: meta prefix codes — an entropy image selects the code
    group per block; the two groups carry DISTINCT canonical
    assignments so a wrong selection misparses; runs crossing block
    boundaries and the shared color cache both survive."""
    import numpy as np

    from hadoopxmlextractor_spark.operators.vp8l import (
        decode_vp8l,
        encode_vp8l,
    )

    rng = np.random.RandomState(13)
    for trial in range(16):
        h, w = int(rng.randint(1, 13)), int(rng.randint(1, 13))
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        opts = dict(
            meta_bits=2 + trial % 2,
            subtract_green=bool(trial % 2),
            cache_bits=0 if trial % 3 else 3,
            predictor_bits=None if trial % 5 else 2,
            mode_salt=trial,
        )
        out = decode_vp8l(encode_vp8l(img, **opts))
        assert np.array_equal(out[:, :, :3], img), (h, w, opts)
    flat = np.zeros((9, 9, 3), np.uint8)
    flat[4:] = 77  # runs crossing the 4-px block boundary
    out = decode_vp8l(encode_vp8l(flat, meta_bits=2, run_backrefs=True))
    assert np.array_equal(out[:, :, :3], flat)


def test_id3_and_m4a_cover_art_walks():
    import pytest

    from hadoopxmlextractor_spark.operators import containers as C

    for v in (2, 3, 4):
        tag = C.build_id3_picture_tag(
            version=v, pic_type=3, mime="image/png",
            description="cover 5", data=b"PNGPAYLOAD",
        )
        rows = C.id3_pictures(tag + b"\xff\xfbfakemp3")
        assert rows == [{
            "pic_type": 3, "mime": "image/png",
            "description": "cover 5", "data": b"PNGPAYLOAD",
        }], v
    # tags without pictures yield no rows; non-ID3 yields no rows
    assert C.id3_pictures(b"\xff\xfbjust audio") == []
    # m4a covr walk + coverless file
    m4a = C.build_m4a_cover(b"PNGBYTES")
    assert C.m4a_cover(m4a) == [{"mime": "image/png", "data": b"PNGBYTES"}]
    assert C.m4a_cover(b"\x00\x00\x00\x10ftypM4A \x00\x00\x02\x00") == []
    # hostile: covr data atom size past the box end refuses
    bad = bytearray(m4a)
    at = bytes(bad).index(b"data") - 4
    bad[at : at + 4] = (1 << 20).to_bytes(4, "big")
    with pytest.raises(ValueError, match="covr data atom|box size"):
        C.m4a_cover(bytes(bad))


def test_mp3_frame_info_arms_and_refusals():
    from hadoopxmlextractor_spark.operators import containers as C
    from hadoopxmlextractor_spark.queries_r12 import _synth_mp3_blob

    # find one id per (version, vbr) shape from the synth rotation
    seen = {}
    for i in range(200):
        b = hashlib.md5(f"{i}:mp3f".encode()).digest()
        ver = ("1", "2", "2.5")[b[0] % 3]
        layer = (3, 2, 1)[b[1] % 3]
        vbr = (b[2] % 3) if layer == 3 else 0
        seen.setdefault((ver, layer, vbr), i)
    # every version appears; xing and vbri arms exist for layer III
    assert {k[0] for k in seen} == {"1", "2", "2.5"}
    assert any(k[2] == 1 for k in seen) and any(k[2] == 2 for k in seen)
    for (ver, layer, vbr), i in seen.items():
        info = C.mp3_frame_info(_synth_mp3_blob(i))
        assert info["version"] == ver and info["layer"] == layer
        b = hashlib.md5(f"{i}:mp3f".encode()).digest()
        assert info["n_frames"] == 3 + b[6] % 4
        if vbr == 1:
            assert info["vbr_kind"] == "xing"
        elif vbr == 2:
            assert info["vbr_kind"] == "vbri"

    # padding bit: frame length grows by 1 slot (x4 for layer I)
    assert C._mp3_frame_len("1", 3, 128, 44100, 1) == (
        C._mp3_frame_len("1", 3, 128, 44100, 0) + 1
    )
    assert C._mp3_frame_len("1", 1, 192, 44100, 1) == (
        C._mp3_frame_len("1", 1, 192, 44100, 0) + 4
    )
    # a synthetic padded CBR frame parses with the padded length
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (9 << 4) | (0 << 2) | 2, 0xC0])
    flen = C._mp3_frame_len("1", 3, 128, 44100, 1)
    blob = (hdr + b"\xaa" * (flen - 4)) * 2
    info = C.mp3_frame_info(blob)
    assert info["bitrate_kbps"] == 128 and info["channels"] == 1
    assert info["n_frames"] == 2

    # refusals: free-format bitrate, reserved codes, missing sync
    free = bytearray(hdr + b"\xaa" * 16)
    free[2] = 0x00
    with pytest.raises(ValueError, match="bitrate"):
        C.mp3_frame_info(bytes(free))
    resv = bytearray(hdr + b"\xaa" * 16)
    resv[1] = 0xE0 | (1 << 3) | (1 << 1) | 1  # reserved version id
    with pytest.raises(ValueError, match="reserved"):
        C.mp3_frame_info(bytes(resv))
    with pytest.raises(ValueError, match="sync"):
        C.mp3_frame_info(b"\x00\x00\x00\x00")
    # ID3v1 trailer excluded from the CBR byte count
    info2 = C.mp3_frame_info(blob + b"TAG" + b"\x00" * 125)
    assert info2["duration_ms"] == info["duration_ms"]
    assert info2["n_frames"] == 2


def test_audio_router_mp3_fallback_widens_coverage():
    """audio_container_meta r12 fallback: files the strict MPEG-1-L3
    full-chain walk refuses (MPEG-2/2.5, layers I/II, Xing/VBRI) now
    report duration/bitrate through the head-only frame walk instead
    of falling to the codec-NULL row; genuinely broken files still
    refuse."""
    from hadoopxmlextractor_spark.operators import multimodal as M
    from hadoopxmlextractor_spark.queries_r12 import _synth_mp3_blob

    covered = set()
    for i in range(120):
        b = hashlib.md5(f"{i}:mp3f".encode()).digest()
        ver = ("1", "2", "2.5")[b[0] % 3]
        layer = (3, 2, 1)[b[1] % 3]
        if ver == "1" and layer == 3:
            continue  # the strict walk's own territory
        blob = _synth_mp3_blob(i)
        assert M._parse_mp3(blob) is None
        meta = M._mp3_frame_info_meta(blob)
        assert meta is not None and meta["codec"] == "mp3"
        assert meta["duration_ms"] > 0 and meta["sample_rate"] > 0
        covered.add((ver, layer))
    assert len(covered) >= 6  # versions x layers beyond MPEG-1 L3
    assert M._mp3_frame_info_meta(b"\xff\x00broken") is None
    assert M._mp3_frame_info_meta(b"ID3\x03\x00\x00\x00\x00\x00\x00") is None


# ---------------------------------------------------------------------------
# MPEG Layer I subband decode (r13)
# ---------------------------------------------------------------------------

from hadoopxmlextractor_spark.operators import containers as C  # noqa: E402


def test_mp1_subband_roundtrip_and_formula():
    frames = [
        [(0, 2, 0, [0, 1, 2, 3] * 3),
         (7, 15, 60, list(range(12))),
         (31, 8, 30, [200] * 12)],
        [(3, 5, 9, [7] * 12)],
    ]
    blob = C.build_mp1(frames, version="1", sr_idx=2, br_idx=12)
    rows = C.mp1_subband_stats(blob)
    assert [(r["frame"], r["sb"], r["nb"]) for r in rows] == [
        (0, 0, 2), (0, 7, 15), (0, 31, 8), (1, 3, 5),
    ]
    r0 = rows[0]
    assert (r0["code_sum"], r0["code_sq_sum"]) == (18, 42)
    # the documented requantization identity holds per sample
    for r in rows:
        nb, scf = r["nb"], r["scf"]
        a = (2.0 ** nb) / (2.0 ** nb - 1.0)
        b = 2.0 ** (1 - nb)
        sf = 2.0 ** (2 - scf // 3)
        want = sf * (a * (b * float(r["code_sum"]) + 12.0 * (b - 1.0)))
        assert r["dec_sum"] == want
    # per-sample decoded values stay in [-sf, sf)
    one = C.build_mp1([[(4, 3, 0, [0, 7, 3, 5] * 3)]])
    (r,) = C.mp1_subband_stats(one)
    assert r["nb"] == 3 and r["code_sum"] == 45
    # MPEG-2 arm uses the other bitrate table
    v2 = C.build_mp1(frames, version="2", sr_idx=1, br_idx=10)
    assert len(C.mp1_subband_stats(v2)) == 4


def test_mp1_refusals():
    frames = [[(0, 4, 6, [1] * 12)]]
    blob = C.build_mp1(frames)
    # free-format bitrate
    bad = bytearray(blob)
    bad[2] &= 0x0F
    with pytest.raises(ValueError, match="bitrate"):
        C.mp1_subband_stats(bytes(bad))
    # stereo refuses
    bad = bytearray(blob)
    bad[3] = 0  # mode stereo
    with pytest.raises(ValueError, match="stereo"):
        C.mp1_subband_stats(bytes(bad))
    # Layer III refuses (the layer gate)
    bad = bytearray(blob)
    bad[1] = (bad[1] & ~0x06) | (1 << 1)
    with pytest.raises(ValueError, match="not Layer I"):
        C.mp1_subband_stats(bytes(bad))
    # forbidden allocation 15
    bad = bytearray(blob)
    bad[4] = 0xF0  # first alloc nibble = 15
    with pytest.raises(ValueError, match="allocation 15"):
        C.mp1_subband_stats(bytes(bad))
    # non-integer-exponent scalefactor refuses (exactness contract)
    odd = C.build_mp1([[(0, 4, 7, [1] * 12)]])
    with pytest.raises(ValueError, match="scalefactor"):
        C.mp1_subband_stats(odd)
    # truncated payload
    with pytest.raises(ValueError, match="past stream end"):
        C.mp1_subband_stats(blob[: len(blob) - 20])
    with pytest.raises(ValueError, match="no Layer I frames"):
        C.mp1_subband_stats(b"")


def test_mp2_subband_roundtrip_grouped_and_scfsi():
    """r14: Layer II grouped 3/5/9-step sample words, scfsi
    scalefactor sharing, region-structured allocation classes, and
    the collapsed requantization s'' = 2(code-mid)/steps."""
    codes = lambda steps, seed: [  # noqa: E731
        (seed * 7 + k * 5) % steps for k in range(36)
    ]
    spec = [
        (1, 3, 0, [0, 3, 6], codes(15, 1)),    # region A idx3 -> 15
        (5, 2, 1, [9, 12], codes(5, 2)),       # mid idx2 -> 5, grouped
        (12, 4, 2, [15], codes(9, 3)),         # hi idx4 -> 9, grouped
        (24, 1, 3, [18, 21], codes(3, 4)),     # top idx1 -> 3, grouped
    ]
    blob = C.build_mp2([spec, spec], sr_idx=0, br_idx=4)  # 64k -> a
    rows = C.mp2_subband_stats(blob)
    assert [(r["frame"], r["sb"], r["steps"], r["grouped"])
            for r in rows] == [
        (0, 1, 15, 0), (0, 5, 5, 1), (0, 12, 9, 1), (0, 24, 3, 1),
        (1, 1, 15, 0), (1, 5, 5, 1), (1, 12, 9, 1), (1, 24, 3, 1),
    ]
    # scfsi expansion: 0 -> three own, 1 -> (a,a,b), 2 -> (a,a,a),
    # 3 -> (a,b,b)
    assert [(r["sf0"], r["sf1"], r["sf2"]) for r in rows[:4]] == [
        (0, 3, 6), (9, 9, 12), (15, 15, 15), (18, 21, 21),
    ]
    # the collapsed Table B.4 identity per part
    for r in rows:
        steps, mid = r["steps"], (r["steps"] - 1) // 2
        cs = codes(steps, {15: 1, 5: 2, 9: 3, 3: 4}[steps])
        want = 0.0
        parts = []
        for p, sfi in enumerate((r["sf0"], r["sf1"], r["sf2"])):
            csum_p = sum(cs[12 * p : 12 * p + 12])
            parts.append(
                2.0 ** (2 - sfi // 3)
                * (2.0 * float(csum_p - 12 * mid)) / steps
            )
        assert r["dec_sum"] == (parts[0] + parts[1]) + parts[2]
        assert r["code_sum"] == sum(cs)
    # low-rate c/d tables: 48 kbps at 44.1 kHz -> table c (sblimit 8,
    # classes 3,5,9,15,31 at the head — no 7)
    spec2 = [(0, 3, 2, [6], codes(9, 5)),
             (3, 2, 0, [0, 3, 6], codes(5, 6))]
    blob2 = C.build_mp2([spec2], sr_idx=0, br_idx=2)
    rows2 = C.mp2_subband_stats(blob2)
    assert [(r["sb"], r["steps"]) for r in rows2] == [(0, 9), (3, 5)]
    # table d at 32 kHz reaches subband 11
    blob3 = C.build_mp2([[(11, 1, 2, [0], codes(3, 7))]],
                        sr_idx=2, br_idx=2)
    assert C.mp2_subband_stats(blob3)[0]["sb"] == 11


def test_mp2_refusals():
    spec = [[(4, 1, 2, [6], [1] * 36)]]
    blob = C.build_mp2(spec, sr_idx=0, br_idx=4)
    bad = bytearray(blob)
    bad[3] &= 0x3F  # stereo
    with pytest.raises(ValueError, match="stereo"):
        C.mp2_subband_stats(bytes(bad))
    bad = bytearray(blob)
    bad[1] = (bad[1] & ~0x06) | (3 << 1)  # Layer I bits
    with pytest.raises(ValueError, match="not Layer II"):
        C.mp2_subband_stats(bytes(bad))
    bad = bytearray(blob)
    bad[1] &= ~0x08  # version -> MPEG-2 LSF
    with pytest.raises(ValueError, match="LSF"):
        C.mp2_subband_stats(bytes(bad))
    with pytest.raises(ValueError, match="scalefactor count"):
        C.build_mp2([[(4, 1, 0, [0, 3], [1] * 36)]])
    with pytest.raises(ValueError, match="sblimit"):
        C.build_mp2([[(28, 1, 2, [0], [1] * 36)]], br_idx=4)  # a: 27
    with pytest.raises(ValueError, match="beyond step count"):
        C.build_mp2([[(4, 1, 2, [0], [3] * 36)]])  # idx1 -> 3 steps
    odd = C.build_mp2([[(4, 1, 2, [7], [1] * 36)]])
    with pytest.raises(ValueError, match="scalefactor"):
        C.mp2_subband_stats(odd)
    with pytest.raises(ValueError, match="past stream end"):
        C.mp2_subband_stats(blob[: len(blob) - 20])
