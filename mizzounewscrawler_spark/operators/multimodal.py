"""Multimodal (image/audio/video) column operators.

Training-data pipelines carry media as opaque ``binary`` columns with typed
metadata structs.  This module provides the Spark-side plumbing — schemas,
partitioning, Arrow batch shape, UDF signatures — as real, tested code,
while the codec layer (PIL/ffmpeg/librosa are not in this container) is
stubbed behind ``DecodeBackend`` with a deterministic fake:

- the **fake backend** parses a tiny self-describing header our fixture
  generator writes (``MMF1|kind|width|height|frames|...payload``) so every
  operator's dataflow (batch shapes, struct outputs, explode of frames,
  per-kind routing) is exercised end-to-end and deterministically;
- the **real backend** raises ``NotImplementedError`` with the exact
  integration point documented — swapping it in changes no Spark code.

Scale notes: media rows are orders of magnitude wider than text rows, so
every operator (a) projects only the needed columns (binary column pruned
away unless touched), (b) uses ``mapInPandas`` with bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` should be LOWERED for
media tables — wide rows × big batch = OOM), and (c) repartitions by a
uniform key before decode so one skewed shard can't pin an executor.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_MAGIC = b"MMF1"


def encode_fake_media(kind: str, width: int, height: int, frames: int, seed: int) -> bytes:
    """Deterministic fake media blob with a parseable header (fixtures)."""
    header = _MAGIC + struct.pack("<16sIII", kind.encode()[:16], width, height, frames)
    body = bytes((seed * 31 + i * 7) % 256 for i in range(min(width * height, 4096)))
    return header + body


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw BGR pixel bytes (row-major, top-down, ``width*height*3``)
    as a standard 24-bit uncompressed bottom-up BMP — a REAL image format,
    dependency-free in both directions (see ``DecodeBackend('bmp')``)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 BGR bytes")
    row = width * 3
    pad = (-row) % 4
    body = b"".join(
        pixels[y * row : (y + 1) * row] + b"\x00" * pad
        for y in range(height - 1, -1, -1)  # bottom-up storage
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + body


def _decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: returns ok/kind/width/height/frames
    plus ``body`` = raw top-down BGR pixel bytes (padding stripped,
    bottom-up storage flipped)."""
    bad = {"ok": False, "kind": None, "width": 0, "height": 0, "frames": 0}
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return bad
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return bad
    top_down = h < 0
    h_abs = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    if len(payload) < offset + stride * h_abs:
        return bad
    rows = [
        payload[offset + y * stride : offset + y * stride + row]
        for y in range(h_abs)
    ]
    if not top_down:
        rows.reverse()
    return {
        "ok": True, "kind": "bmp", "width": w, "height": h_abs,
        "frames": 1, "body": b"".join(rows),
    }


def resize_bmp(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit BMP payload via numpy —
    decode → index-map → re-encode, no image library."""
    import numpy as np

    d = _decode_bmp(payload)
    if not d["ok"]:
        raise ValueError("not a decodable 24-bit BMP")
    w, h = d["width"], d["height"]
    px = np.frombuffer(d["body"], dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    out = px[ys][:, xs]
    return encode_bmp(new_w, new_h, out.tobytes())


class DecodeBackend:
    """Codec seam.  ``fake`` parses the fixture header; ``bmp`` is a REAL
    dependency-free decoder for 24-bit uncompressed BMP (decode + numpy
    nearest-neighbor resize + re-encode — the whole image path works
    end-to-end in this container); ``real`` decodes any format with PIL
    when it is installed (import-gated — this container ships no image
    libs, so that path raises NotImplementedError here and works unchanged
    on a cluster image that has Pillow; video/audio stay documented ffmpeg
    integration points)."""

    def __init__(self, mode: str = "fake"):
        self.mode = mode

    def decode(self, payload: bytes) -> dict:
        if self.mode == "bmp":
            return _decode_bmp(payload)
        if self.mode == "real":
            try:
                import io

                from PIL import Image
            except ImportError as exc:  # sandbox: no image libs installed
                raise NotImplementedError(
                    "real codec backend needs Pillow (PIL) on the executors; "
                    "ffmpeg integration for video/audio plugs in here too — "
                    "the Spark plumbing above is codec-agnostic"
                ) from exc
            if payload is None:
                return {
                    "ok": False, "kind": None, "width": 0, "height": 0,
                    "frames": 0,
                }
            try:
                img = Image.open(io.BytesIO(bytes(payload)))
                img.load()
                return {
                    "ok": True,
                    "kind": (img.format or "image").lower(),
                    "width": int(img.width),
                    "height": int(img.height),
                    "frames": int(getattr(img, "n_frames", 1)),
                    "body": b"",
                }
            except Exception:
                return {
                    "ok": False, "kind": None, "width": 0, "height": 0,
                    "frames": 0,
                }
        if payload is None or payload[:4] != _MAGIC:
            return {"ok": False, "kind": None, "width": 0, "height": 0, "frames": 0}
        kind_b, w, h, fr = struct.unpack("<16sIII", payload[4 : 4 + 28])
        return {
            "ok": True,
            "kind": kind_b.rstrip(b"\x00").decode(),
            "width": int(w),
            "height": int(h),
            "frames": int(fr),
            "body": payload[32:],
        }


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frames", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def decode_metadata(media: DataFrame, backend: DecodeBackend | None = None) -> DataFrame:
    """Decode → typed metadata struct (mapInPandas, Arrow-batched)."""
    be = backend or DecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = be.decode(bytes(payload) if payload is not None else None)
                rows.append(
                    {
                        "media_id": mid,
                        "ok": d["ok"],
                        "kind": d.get("kind"),
                        "width": d.get("width", 0),
                        "height": d.get("height", 0),
                        "frames": d.get("frames", 0),
                        "n_bytes": len(payload) if payload is not None else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    # uniform repartition before the decode stage: media shards can be
    # pathologically skewed by source; media_id is uniform
    return media.select("media_id", "payload").repartition(
        F.col("media_id")
    ).mapInPandas(run, DECODE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame, dim: int = 16, backend: DecodeBackend | None = None
) -> DataFrame:
    """Deterministic feature vector per media row (fake embedding: byte
    histogram folded to ``dim``); the real backend would run a vision/audio
    encoder here — the signature and batch shape are identical."""
    be = backend or DecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = be.decode(bytes(payload) if payload is not None else None)
                vec = [0.0] * dim
                if d["ok"]:
                    for i, b in enumerate(d.get("body", b"")):
                        vec[i % dim] += b / 255.0
                    n = max(1, len(d.get("body", b"")))
                    vec = [round(v * dim / n, 6) for v in vec]
                out.append({"media_id": mid, "feature": vec})
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    fps: float = 30.0,
    backend: DecodeBackend | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per kept frame (the 1→N
    table-function shape; real backend would also emit the frame bytes)."""
    be = backend or DecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = be.decode(bytes(payload) if payload is not None else None)
                if d["ok"] and d["kind"] == "video":
                    for idx in range(0, d["frames"], every_n):
                        out.append(
                            {"media_id": mid, "frame_idx": idx, "ts_sec": round(idx / fps, 6)}
                        )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "ts_sec"])

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def resize_images(
    media: DataFrame, max_side: int = 256, backend: DecodeBackend | None = None
) -> DataFrame:
    """Resize: computes target dims in the UDF; with the ``bmp`` backend
    the payload is REALLY re-encoded (numpy nearest-neighbor) — the fake
    backend passes payload through, the PIL backend would re-encode with
    the library."""
    be = backend or DecodeBackend()
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("new_width", T.IntegerType()),
            T.StructField("new_height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = be.decode(bytes(payload) if payload is not None else None)
                if not d["ok"] or d["kind"] not in ("image", "bmp"):
                    continue
                w, h = d["width"], d["height"]
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                if d["kind"] == "bmp" and (nw, nh) != (w, h):
                    new_payload = resize_bmp(bytes(payload), nw, nh)
                else:
                    new_payload = payload  # fake/PIL seam: pass-through
                out.append(
                    {
                        "media_id": mid,
                        "new_width": nw,
                        "new_height": nh,
                        "payload": new_payload,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return media.select("media_id", "payload").mapInPandas(run, schema)


def generate_fake_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table (images/audio/video cycling)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 64 + (i % 8) * 32, 48 + (i % 5) * 32
        frames = 30 * (1 + i % 4) if kind == "video" else (1 if kind == "image" else 0)
        rows.append(
            (i, kind, encode_fake_media(kind, w, h, frames, seed + i), {"src": f"s{i%7}"})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
