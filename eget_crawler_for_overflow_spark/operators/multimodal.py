"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two decode paths:

* ``decode_media`` (since r4) — REAL container/header decoding with the
  stdlib only: PNG/JPEG/GIF/BMP dimensions from their headers, WAV via
  the stdlib ``wave`` module (channels/rate/frames — full PCM access),
  MP4/ISO-BMFF box walking (tkhd dimensions, stts sample count). This is
  what a 100 TB metadata-extraction pass actually computes per blob.
  Pixel/sample *content* decoding (JPEG DCT, H.264 frames) still needs
  PIL/av — `decode_media` covers the metadata surface, not pixels.
* ``decode_stub`` — the deterministic fake retained for the synthetic
  text-derived blob fixtures (the driver's `multimodal_features` oracle
  pins its formula; real media bytes aren't among the driver tables).

The Spark-side plumbing — binary schema, partitioning, mapInPandas batch
shape, typed output struct — is identical for both: swap the decoder
callable, no plan change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("declared_bytes", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic blob table derived from documents: payload = utf-8
    text bytes, media_type cycles by doc_id."""
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col("text")).cast("int").alias("declared_bytes"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode: real image/audio decoding is unavailable in this
    container. The deterministic fake derives 'dimensions' from payload
    bytes so tests pin the plumbing end-to-end; a real deployment replaces
    this body with PIL.Image.open / av.open etc."""
    n = len(payload)
    if media_type == "image":
        return {"width": n % 640 + 1, "height": n % 480 + 1, "n_frames": 1}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n % 16000 + 1}
    if media_type == "video":
        return {"width": n % 1920 + 1, "height": n % 1080 + 1, "n_frames": n % 300 + 1}
    raise NotImplementedError(f"unknown media type {media_type!r}")


# ---------------------------------------------------------------------------
# real header decoders (stdlib only)
# ---------------------------------------------------------------------------


def _png_dims(p: bytes) -> tuple[int, int]:
    # signature(8) + IHDR len/type(8) -> width,height u32 BE at 16
    if len(p) < 24 or p[12:16] != b"IHDR":
        raise ValueError("malformed PNG (no IHDR)")
    w, h = struct.unpack(">II", p[16:24])
    return w, h


def _jpeg_dims(p: bytes) -> tuple[int, int]:
    # walk markers to the first SOFn frame header
    i = 2
    while i + 9 < len(p):
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", p[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", p[i + 5 : i + 9])
            return w, h
        i += 2 + seglen
    raise ValueError("malformed JPEG (no SOF marker)")


def _gif_dims(p: bytes) -> tuple[int, int]:
    w, h = struct.unpack("<HH", p[6:10])
    return w, h


def _bmp_dims(p: bytes) -> tuple[int, int]:
    w, h = struct.unpack("<ii", p[18:26])
    return w, abs(h)


def _wav_features(p: bytes) -> dict:
    """Full-fidelity WAV read via the stdlib wave module (real decode —
    PCM frames are accessible the same way)."""
    import io
    import wave

    with wave.open(io.BytesIO(p)) as wf:
        return {
            "width": 0,
            "height": 0,
            "n_frames": wf.getnframes(),
            "channels": wf.getnchannels(),
            "sample_rate": wf.getframerate(),
        }


def _mp4_boxes(p: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack(">I4s", p[i : i + 8])
        payload = i + 8
        if size == 1:  # 64-bit largesize: payload starts AFTER the field
            if i + 16 > end:
                return
            size = struct.unpack(">Q", p[i + 8 : i + 16])[0]
            payload = i + 16
        if size < 8 or i + size > end:
            return
        yield btype, payload, i + size
        i += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_features(p: bytes) -> dict:
    # Per-trak scoping: an audio+video MP4's audio stts (≈43 AAC frames/s)
    # outcounts the video frames, so n_frames must come from the trak whose
    # tkhd has nonzero width/height, not a global max over all stts boxes.
    tracks: list[dict] = []  # one entry per trak: {w, h, frames}

    def walk(start: int, end: int, track: dict | None) -> None:
        for btype, s, e in _mp4_boxes(p, start, end):
            if btype == b"trak":
                t = {"w": 0, "h": 0, "frames": 0}
                tracks.append(t)
                walk(s, e, t)
            elif btype in _MP4_CONTAINERS:
                walk(s, e, track)
            elif btype == b"tkhd" and track is not None:
                version = p[s]
                # ISO 14496-12 §8.3.2: after the version byte sit 3 flag
                # bytes, creation/modification/track_ID/reserved/duration
                # (20 bytes v0 / 32 v1), reserved(8), layer/alt/vol/
                # reserved(8), matrix(36) — width starts at payload+76 (v0)
                # or +88 (v1).
                off = s + (88 if version == 1 else 76)
                if off + 8 <= e:
                    w16, h16 = struct.unpack(">II", p[off : off + 8])
                    track["w"] = w16 >> 16  # 16.16 fixed point
                    track["h"] = h16 >> 16
            elif btype == b"stts" and track is not None:
                n = struct.unpack(">I", p[s + 4 : s + 8])[0]
                total = 0
                for j in range(n):
                    cnt = struct.unpack(">I", p[s + 8 + j * 8 : s + 12 + j * 8])[0]
                    total += cnt
                track["frames"] = total

    walk(0, len(p), None)
    if not tracks or not any(t["w"] or t["h"] or t["frames"] for t in tracks):
        raise ValueError("malformed MP4 (no tkhd/stts found)")
    video = [t for t in tracks if t["w"] or t["h"]]
    if video:
        best = max(video, key=lambda t: t["w"] * t["h"])
        return {"width": best["w"], "height": best["h"], "n_frames": best["frames"]}
    # audio-only MP4: no dimensions; report the largest sample count
    return {"width": 0, "height": 0, "n_frames": max(t["frames"] for t in tracks)}


def decode_media(payload: bytes) -> dict:
    """Sniff the container from magic bytes and decode its header
    metadata — media_type + dimensions/frame counts. ALWAYS raises
    ValueError on undecodable input (unrecognized magic, truncated or
    malformed headers) — never a bare struct.error/wave.Error that would
    escape the documented catchable contract and fail a whole task over
    one corrupt blob."""
    import wave

    p = bytes(payload)
    try:
        if p.startswith(b"\x89PNG\r\n\x1a\n"):
            w, h = _png_dims(p)
            return {"media_type": "image", "width": w, "height": h, "n_frames": 1}
        if p.startswith(b"\xff\xd8"):
            w, h = _jpeg_dims(p)
            return {"media_type": "image", "width": w, "height": h, "n_frames": 1}
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _gif_dims(p)
            return {"media_type": "image", "width": w, "height": h, "n_frames": 1}
        if p.startswith(b"BM") and len(p) >= 26:
            w, h = _bmp_dims(p)
            return {"media_type": "image", "width": w, "height": h, "n_frames": 1}
        if p.startswith(b"RIFF") and p[8:12] == b"WAVE":
            return {"media_type": "audio", **_wav_features(p)}
        if len(p) >= 12 and p[4:8] == b"ftyp":
            return {"media_type": "video", **_mp4_features(p)}
    except ValueError:
        raise
    except (struct.error, wave.Error, EOFError, IndexError, KeyError) as e:
        raise ValueError(f"malformed media container: {e}") from e
    raise ValueError("unrecognized media container (magic bytes unknown)")


# ---------------------------------------------------------------------------
# real-container fixture synthesis (inverted construction — the driver's
# `multimodal_features` oracle predicts every field in closed form because
# WE build the container bytes the real decoders then parse; same trick as
# convert.synthesize_office_files for the §2.11 converters)
# ---------------------------------------------------------------------------


def _build_png(w: int, h: int, body: bytes) -> bytes:
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # 8 sig + 25 IHDR + (12+len(body)) IDAT + 12 IEND = 57 + len(body)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def _build_gif(w: int, h: int, body: bytes) -> bytes:
    # 6 + 4 + len(body) + 1 = 11 + len(body)
    return b"GIF89a" + struct.pack("<HH", w, h) + body + b"\x3b"


def _build_bmp(w: int, h: int, body: bytes) -> bytes:
    # 2 + 16 + 8 + len(body) = 26 + len(body)
    return b"BM" + bytes(16) + struct.pack("<ii", w, h) + body


def _build_wav(n_frames: int) -> bytes:
    # stdlib wave writer: 44-byte PCM header + 2 bytes/frame (mono s16)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def _build_mp4(w: int, h: int, n_frames: int, body: bytes) -> bytes:
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))  # 16
    # tkhd v0 payload: version(1)+flags(3)+creation/mod/track_ID/reserved/
    # duration(20)+reserved(8)+layer/alt/volume/reserved(8)+matrix(36)+
    # width/height as 16.16 fixed (8) = 84 bytes -> box 92
    tkhd = box(
        b"tkhd", bytes(76) + struct.pack(">II", w << 16, h << 16)
    )
    stts = box(
        b"stts", bytes(4) + struct.pack(">I", 1) + struct.pack(">II", n_frames, 1)
    )  # 24
    trak = box(b"trak", tkhd + box(b"mdia", box(b"minf", box(b"stbl", stts))))
    moov = box(b"moov", trak)  # 156
    # 16 + 156 + (8 + len(body)) = 180 + len(body)
    return ftyp + moov + box(b"free", body)


#: closed-form byte-size constants the oracle SQL mirrors
_PNG_OVERHEAD, _GIF_OVERHEAD, _BMP_OVERHEAD = 57, 11, 26
_WAV_HEADER, _MP4_OVERHEAD = 44, 180
CORRUPT_PAYLOAD = b"not a media container"  # 21 bytes, unknown magic


def synthesize_media_blobs(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media containers derived from documents: doc_id
    cycles image (PNG/GIF/BMP by doc_id%9) / WAV / MP4; dimensions and
    frame counts are the same closed forms the former stub used
    (len(text)%640+1, …) so the oracle predicts the real decoders'
    output; every 31st payload is corrupt (unknown magic) to exercise the
    per-blob decode-error envelope."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids: list[int] = []
            blobs: list[bytes] = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                i = int(doc_id)
                t = str(text)
                n = len(t)
                body = t.encode("utf-8")
                ids.append(i)
                if i % 31 == 0:
                    blobs.append(CORRUPT_PAYLOAD)
                elif i % 3 == 0:
                    w, h = n % 640 + 1, n % 480 + 1
                    builder = {0: _build_png, 3: _build_gif, 6: _build_bmp}[i % 9]
                    blobs.append(builder(w, h, body))
                elif i % 3 == 1:
                    blobs.append(_build_wav(n % 16000 + 1))
                else:
                    blobs.append(
                        _build_mp4(n % 1920 + 1, n % 1080 + 1, n % 300 + 1, body)
                    )
            yield pd.DataFrame({"blob_id": ids, "payload": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("blob_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_media_features(blobs: DataFrame) -> DataFrame:
    """REAL-decode feature extraction: magic-byte sniff + header parse via
    ``decode_media``; per-blob ValueErrors land in the ``error`` column
    (never fail the task — same envelope contract as convert_files,
    reference converter.py:70-89)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "blob_id": [],
                "media_type": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "error": [],
            }
            for bid, p in zip(pdf["blob_id"], pdf["payload"]):
                payload = bytes(p)
                out["blob_id"].append(bid)
                out["n_bytes"].append(len(payload))
                try:
                    f = decode_media(payload)
                    out["media_type"].append(f["media_type"])
                    out["width"].append(f["width"])
                    out["height"].append(f["height"])
                    out["n_frames"].append(f["n_frames"])
                    out["error"].append(None)
                except ValueError as e:
                    out["media_type"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(None)
                    out["error"].append(f"ValueError: {e}")
            yield pd.DataFrame(out)

    return blobs.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def extract_features(blobs: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches of binary payloads,
    one output row per blob. ``decoder`` defaults to ``decode_stub`` (the
    synthetic-fixture path the driver oracle pins); pass
    ``lambda p, m: decode_media(p)`` for real container sniffing — the
    plan shape is identical either way."""
    decoder = decoder or decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    # real decoders sniff the type from magic bytes; the
                    # stub has no opinion and echoes the declared column
                    "media_type": [
                        f.get("media_type", m)
                        for f, m in zip(feats, pdf["media_type"])
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)
