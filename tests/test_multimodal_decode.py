"""Real stdlib media-header decoding (r4): fixtures are VALID container
bytes built with struct/zlib/wave (spec-conformant, not decoder-shaped),
so these test format conformance. Pixel/sample-content decode (JPEG DCT,
H.264) still requires PIL/av — `decode_media` covers the metadata
surface a 100 TB feature-extraction pass computes per blob."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from eget_crawler_for_overflow_spark.operators.multimodal import (
    decode_media,
    extract_features,
)


def make_png(w: int, h: int) -> bytes:
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8


def make_wav(n_frames: int, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x01\x02" * n_frames * channels)
    return buf.getvalue()


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", len(payload) + 8, btype) + payload


def _make_tkhd(w: int, h: int, version: int = 0) -> bytes:
    # ISO 14496-12 §8.3.2: ver/flags(4) + ctime/mtime/track_ID/reserved/
    # duration (20 v0 / 32 v1) + reserved(8) + layer/alt/vol/reserved(8)
    # + matrix(36) + width/height (16.16 fixed). v0 payload = 84 bytes.
    times = 32 if version else 20
    return (
        bytes([version]) + b"\x00" * 3
        + b"\x00" * (times + 8 + 8 + 36)
        + struct.pack(">II", w << 16, h << 16)
    )


def _make_stts(n_frames: int) -> bytes:
    return (
        b"\x00" * 4
        + struct.pack(">I", 2)  # two entries
        + struct.pack(">II", n_frames - 5, 512)
        + struct.pack(">II", 5, 1024)
    )


def _make_trak(w: int, h: int, n_frames: int, version: int = 0) -> bytes:
    stbl = _box(b"stbl", _box(b"stts", _make_stts(n_frames)))
    return _box(
        b"trak",
        _box(b"tkhd", _make_tkhd(w, h, version))
        + _box(b"mdia", _box(b"minf", stbl)),
    )


def make_mp4(w: int, h: int, n_frames: int, version: int = 0,
             extra_traks: bytes = b"") -> bytes:
    moov = _box(b"moov", _make_trak(w, h, n_frames, version) + extra_traks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_image_headers():
    assert decode_media(make_png(640, 480)) == {
        "media_type": "image", "width": 640, "height": 480, "n_frames": 1,
    }
    assert decode_media(make_jpeg(1920, 1080)) == {
        "media_type": "image", "width": 1920, "height": 1080, "n_frames": 1,
    }
    assert decode_media(make_gif(32, 16)) == {
        "media_type": "image", "width": 32, "height": 16, "n_frames": 1,
    }
    assert decode_media(make_bmp(100, 50)) == {
        "media_type": "image", "width": 100, "height": 50, "n_frames": 1,
    }
    # bottom-up BMPs carry negative height
    assert decode_media(make_bmp(100, -50))["height"] == 50


def test_wav_real_decode():
    got = decode_media(make_wav(16000, rate=16000, channels=2))
    assert got["media_type"] == "audio"
    assert got["n_frames"] == 16000
    assert got["sample_rate"] == 16000
    assert got["channels"] == 2


def test_mp4_box_walk():
    got = decode_media(make_mp4(1280, 720, 300))
    assert got == {
        "media_type": "video", "width": 1280, "height": 720, "n_frames": 300,
    }
    # spec-size sanity: a v0 tkhd box is exactly 8 header + 84 payload
    assert len(_box(b"tkhd", _make_tkhd(1280, 720))) == 92


def test_mp4_tkhd_version1():
    # v1 tkhd carries 64-bit times: payload is 96 bytes, width at +88
    got = decode_media(make_mp4(1920, 1080, 24, version=1))
    assert (got["width"], got["height"]) == (1920, 1080)
    assert got["n_frames"] == 24


def test_mp4_audio_video_tracks_scoped():
    # Typical MP4: video trak (0 < frames) + audio trak (no dims, MANY
    # more stts samples). n_frames must come from the video trak, not a
    # global max that picks up the audio sample count.
    audio = _make_trak(0, 0, 43 * 60, version=0)  # 43 AAC frames/s × 60 s
    got = decode_media(make_mp4(640, 360, 30 * 60, extra_traks=audio))
    assert got == {
        "media_type": "video", "width": 640, "height": 360, "n_frames": 1800,
    }


def test_mp4_audio_only():
    # m4a-style: one trak, no dimensions — report its sample count
    got = decode_media(make_mp4(0, 0, 430))
    assert got == {"media_type": "video", "width": 0, "height": 0,
                   "n_frames": 430}


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="unrecognized media container"):
        decode_media(b"plain text, no magic")
    with pytest.raises(ValueError, match="no SOF marker"):
        decode_media(b"\xff\xd8\xff\xd9")  # JPEG with no frame header


def test_extract_features_real_decoder_through_spark(spark):
    """The same mapInPandas plan with the real decoder: mixed containers
    in one binary column, dims sniffed from magic bytes (the declared
    media_type column is deliberately wrong to prove sniffing wins)."""
    rows = [
        (1, "unknown", make_png(8, 4), (0, "x")),
        (2, "unknown", make_wav(100), (0, "x")),
        (3, "unknown", make_mp4(320, 240, 42), (0, "x")),
    ]
    blobs = spark.createDataFrame(
        rows,
        "blob_id long, media_type string, payload binary, "
        "meta struct<declared_bytes:int, codec:string>",
    )
    got = {
        r["blob_id"]: r
        for r in extract_features(
            blobs, decoder=lambda p, m: decode_media(p)
        ).collect()
    }
    assert got[1]["media_type"] == "image"
    assert (got[1]["width"], got[1]["height"]) == (8, 4)
    assert got[2]["media_type"] == "audio"
    assert got[2]["n_frames"] == 100
    assert got[3]["media_type"] == "video"
    assert (got[3]["width"], got[3]["height"], got[3]["n_frames"]) == (
        320, 240, 42,
    )


def test_malformed_containers_raise_valueerror_only():
    """decode_media's contract: ValueError on ANY undecodable input —
    truncated headers must not leak struct.error/wave.Error (they would
    fail a whole Spark task over one corrupt blob)."""
    for bad in (
        b"GIF89a\x01\x02",                # truncated GIF descriptor
        b"RIFF1234WAVExx",                # bogus WAV chunks
        b"\x89PNG\r\n\x1a\nXXXX",         # PNG without IHDR
        b"\x00\x00\x00\x0cftypisom",      # ftyp only, no moov
        make_mp4(1, 1, 6)[:40],           # truncated MP4 boxes
    ):
        with pytest.raises(ValueError):
            decode_media(bad)


def test_mp4_largesize_box_payload_offset():
    """size==1 boxes carry a 64-bit largesize; the payload starts AFTER
    that field — walking from i+8 would parse the length as a child box."""
    inner = make_mp4(640, 360, 24)
    # rewrap the moov box (last box) as a largesize box
    ftyp_len = struct.unpack(">I", inner[:4])[0]
    moov = inner[ftyp_len:]
    moov_payload = moov[8:]
    large = (
        struct.pack(">I4s", 1, b"moov")
        + struct.pack(">Q", 16 + len(moov_payload))
        + moov_payload
    )
    got = decode_media(inner[:ftyp_len] + large)
    assert (got["width"], got["height"], got["n_frames"]) == (640, 360, 24)


def test_synthesized_real_blobs_roundtrip_through_real_decoder(spark):
    """r6 driver binding: synthesize_media_blobs builds REAL containers
    from (doc_id, text); extract_media_features parses them back with
    decode_media. Every field must match the closed-form oracle formulas
    (multimodal._build_* overhead constants), including the corrupt-blob
    error envelope at doc_id % 31 == 0."""
    from eget_crawler_for_overflow_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media_blobs,
    )

    docs = spark.createDataFrame(
        [(i, "x" * (10 + i * 7)) for i in range(12)] + [(31, "y" * 50), (62, "z")],
        "doc_id long, text string",
    )
    got = {
        r["blob_id"]: r
        for r in extract_media_features(synthesize_media_blobs(docs)).collect()
    }
    assert len(got) == 14
    for i, r in got.items():
        n = 10 + i * 7 if i < 12 else (50 if i == 31 else 1)
        if i % 31 == 0:  # 0, 31, 62
            assert r["error"].startswith("ValueError: unrecognized")
            assert r["media_type"] is None and r["width"] is None
            assert r["n_bytes"] == 21
            continue
        assert r["error"] is None
        if i % 3 == 0:
            overhead = {0: 57, 3: 11, 6: 26}[i % 9]
            assert r["media_type"] == "image"
            assert r["n_bytes"] == overhead + n
            assert (r["width"], r["height"], r["n_frames"]) == (
                n % 640 + 1, n % 480 + 1, 1)
        elif i % 3 == 1:
            assert r["media_type"] == "audio"
            assert r["n_bytes"] == 44 + 2 * (n % 16000 + 1)
            assert (r["width"], r["height"]) == (0, 0)
            assert r["n_frames"] == n % 16000 + 1
        else:
            assert r["media_type"] == "video"
            assert r["n_bytes"] == 180 + n
            assert (r["width"], r["height"], r["n_frames"]) == (
                n % 1920 + 1, n % 1080 + 1, n % 300 + 1)
