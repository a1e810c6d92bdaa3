"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched UDFs.

What is REAL here: container-header decode (PNG/JPEG/GIF dims, WAV
audio params, MP4 duration/dims — :func:`decode_headers`), the default
feature extractor built on it (:func:`header_feature` — integer-valued
header stats, exactly oracle-checkable), the asset schema, the
partitioning strategy (bucket by asset id so a re-run co-locates), the
``mapInPandas`` batch shapes, and the feature-table contract
downstream ops consume (fixed-length ``array<float>`` + metadata map).

What is STUBBED (no media codecs ship in this container): pixel /
sample / frame CONTENT decode — ``decode_stub`` raises, and
``sample_frames``' pixel payload plus :func:`fake_feature` are
clearly-marked deterministic fakes kept only where actual content
decoding would be required.  Swap ``FEATURE_FN`` / the frame decoder
for a real binding (PIL/torchaudio/decord) when deploying; nothing
else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = ("asset_id string, kind string, bytes binary, "
                "meta map<string,string>")
FEATURE_DIM = 16
FEATURES_SCHEMA = (f"asset_id string, kind string, "
                   f"feature array<float>, n_bytes long")


def decode_stub(data: bytes, kind: str):
    """Full pixel/sample decode goes here (PIL/torchaudio/decord).
    Not available in this environment — header-level metadata decode
    IS available, see :func:`decode_headers`."""
    raise NotImplementedError(
        f"no media codec available in this environment for kind={kind!r}"
    )


def decode_headers(data: bytes, kind: str | None = None) -> dict:
    """Pure-Python container-header decode: PNG / JPEG / GIF
    dimensions, WAV channel/rate/duration.  No codec dependencies —
    this is the real (non-stub) metadata path in this environment.

    Returns {'format', 'width', 'height'} for images or {'format',
    'channels', 'sample_rate_hz', 'bits_per_sample', 'duration_ms'}
    for WAV.  Raises ValueError on unrecognized or truncated input.
    """
    import struct

    if data is None or len(data) < 12:
        raise ValueError("too short to identify container")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is required first chunk: length(4) type(4) data
        if data[12:16] != b"IHDR" or len(data) < 24:
            raise ValueError("PNG without leading IHDR")
        w, h = struct.unpack(">II", data[16:24])
        return {"format": "png", "width": w, "height": h}
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h}
    if data[:2] == b"\xff\xd8":  # JPEG SOI; scan for a frame header
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            # 0xFF fill bytes before a marker are legal padding
            # (ITU T.81 B.1.1.2) — skip to the real marker byte
            while i + 9 <= len(data) and data[i + 1] == 0xFF:
                i += 1
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
            # SOF0-3, 5-7, 9-11, 13-15 carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                         0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return {"format": "jpeg", "width": w, "height": h}
            i += 2 + seglen
        raise ValueError("JPEG without SOF marker")
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        i = 12
        fmt = {}
        data_size = None
        while i + 8 <= len(data):
            cid = data[i:i + 4]
            csize = struct.unpack("<I", data[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(data):
                (_, channels, rate, _, _, bits) = struct.unpack(
                    "<HHIIHH", data[i + 8:i + 24])
                fmt = {"channels": channels, "sample_rate_hz": rate,
                       "bits_per_sample": bits}
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize % 2)
        if not fmt or data_size is None:
            raise ValueError("WAV without fmt/data chunks")
        bytes_per_s = (fmt["channels"] * fmt["sample_rate_hz"]
                       * fmt["bits_per_sample"] // 8)
        fmt["duration_ms"] = (int(round(1000 * data_size / bytes_per_s))
                              if bytes_per_s else 0)
        fmt["format"] = "wav"
        return fmt
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return _decode_mp4(data)
    raise ValueError(f"unrecognized container (kind hint: {kind!r})")


def _decode_mp4(data: bytes) -> dict:
    """Minimal ISO-BMFF (MP4) walk: moov → mvhd gives
    timescale/duration; the first video tkhd gives width/height
    (16.16 fixed point).  Header-level only, like the image/audio
    paths — no codec work."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[i:i + 8])
            hdr = 8
            if size == 1 and i + 16 <= end:  # 64-bit largesize
                size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
                hdr = 16
            if size < hdr or i + size > end:
                break
            yield btype, i + hdr, i + size
            i += size

    out = {"format": "mp4"}
    for btype, s, e in boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in boxes(data, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                ver = data[cs]
                if ver == 1:
                    # v1 layout needs 32 content bytes; a truncated v1
                    # box is malformed input, not a crash
                    if ce - cs < 32:
                        raise ValueError("truncated v1 mvhd box")
                    ts, dur = struct.unpack(">IQ", data[cs + 20:cs + 32])
                else:
                    ts, dur = struct.unpack(">II", data[cs + 12:cs + 20])
                if ts:
                    out["duration_ms"] = int(round(1000 * dur / ts))
            elif ctype == b"trak":
                for t, ts_, te in boxes(data, cs, ce):
                    if t == b"tkhd" and te - ts_ >= 84 \
                            and "width" not in out:
                        w, h = struct.unpack(">II", data[te - 8:te])
                        if w and h:
                            out["width"] = w >> 16
                            out["height"] = h >> 16
    if "duration_ms" not in out:
        raise ValueError("MP4 without moov/mvhd")
    return out


MEDIA_META_SCHEMA = ("asset_id string, kind string, format string, "
                     "width long, height long, channels long, "
                     "sample_rate_hz long, duration_ms long, "
                     "n_bytes long, error string")


def extract_media_meta(assets: DataFrame) -> DataFrame:
    """assets → typed header metadata via :func:`decode_headers`,
    one Arrow-batched Python hop (mapInPandas); undecodable rows carry
    the error instead of failing the job."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"],
                                       pdf["bytes"]):
                row = {"asset_id": aid, "kind": kind, "format": None,
                       "width": None, "height": None, "channels": None,
                       "sample_rate_hz": None, "duration_ms": None,
                       "n_bytes": len(data or b""), "error": None}
                try:
                    row.update(decode_headers(data, kind))
                # struct.error covers any malformed-container unpack a
                # guard missed — untrusted crawl bytes must produce an
                # error row, never fail the job (struct.error does NOT
                # subclass ValueError)
                except (ValueError, struct.error) as e:
                    row["error"] = str(e)
                rows.append(row)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def fake_feature(data: bytes, kind: str, dim: int = FEATURE_DIM):
    """Deterministic stand-in for a CONTENT (pixel/sample) feature
    extractor: sha256 bytes → unit vector. Pure function of the asset
    bytes, so tests can pin outputs. Kept only for content-level
    features (which need codecs this container lacks); the default
    ``FEATURE_FN`` is the real :func:`header_feature`."""
    h = hashlib.sha256(kind.encode() + b"\x00" + (data or b"")).digest()
    v = np.frombuffer(h[: dim * 2], dtype=np.uint16).astype(np.float32)
    v = v - v.mean()
    n = np.linalg.norm(v)
    return (v / n if n else v).tolist()


_FORMAT_CODE = {"png": 1, "gif": 2, "jpeg": 3, "wav": 4, "mp4": 5}


def header_feature(data: bytes, kind: str, dim: int = FEATURE_DIM):
    """REAL default feature extractor: a fixed-dim vector of decoded
    container-header stats —

      [0] decode_ok (1/0)      [1] format code (png1 gif2 jpeg3 wav4
      [2] width                    mp4 5; 0 on failure)
      [3] height               [4] channels
      [5] sample_rate_hz       [6] bits_per_sample
      [7] duration_ms          [8] n_bytes          [9..] zero pad

    Every component is integer-valued by construction (the
    cross-engine float-tie rule: exact equality survives any engine's
    float handling), so the driver oracle can predict the whole vector
    arithmetically from an asset table's generating parameters while
    THIS path earns it by parsing the actual bytes.  Undecodable input
    yields the zero vector with only n_bytes set — never an error."""
    import struct

    v = [0.0] * dim
    v[8] = float(len(data or b""))
    try:
        meta = decode_headers(data, kind)
    except (ValueError, struct.error):
        return v
    v[0] = 1.0
    v[1] = float(_FORMAT_CODE.get(meta.get("format"), 0))
    v[2] = float(meta.get("width", 0))
    v[3] = float(meta.get("height", 0))
    v[4] = float(meta.get("channels", 0))
    v[5] = float(meta.get("sample_rate_hz", 0))
    v[6] = float(meta.get("bits_per_sample", 0))
    v[7] = float(meta.get("duration_ms", 0))
    return v


FEATURE_FN = header_feature


def extract_features(assets: DataFrame,
                     feature_fn=None) -> DataFrame:
    """assets (asset_id, kind, bytes, meta) → fixed-dim features.

    One Python hop over Arrow batches; no per-row serde. Output is
    bucketable by asset_id for co-located joins with embeddings.
    """
    fn = feature_fn or FEATURE_FN

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(b, k) for b, k in zip(pdf["bytes"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(b or b"") for b in pdf["bytes"]],
                }
            )

    return assets.mapInPandas(gen, schema=FEATURES_SCHEMA)


def synth_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests/benchmarks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import random

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = random.Random((seed << 32) ^ int(i))
                kind = rng.choice(["image", "audio", "video"])
                payload = bytes(
                    rng.getrandbits(8) for _ in range(rng.randint(64, 256)))
                rows.append(
                    {
                        "asset_id": f"asset-{int(i):08d}",
                        "kind": kind,
                        "bytes": payload,
                        "meta": {"w": "640", "h": "480"}
                        if kind == "image" else {"dur_ms": "1500"},
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind",
                                              "bytes", "meta"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def synth_media_assets(keys: DataFrame) -> DataFrame:
    """Deterministic REAL container bytes from an integer key table
    ``(k long, c long)``: kind cycles GIF image / WAV audio / MP4
    video by ``k % 3``, and every container parameter is integer
    arithmetic on (k, c) —

      * GIF:  w = 1 + k%1024, h = 1 + c%1024
      * WAV:  channels 1 + k%2, rate 8000*(1 + c%3), 16-bit,
              n_samples 48*(5 + c%40) (48 divides evenly by every
              rate/1000, so duration_ms is an exact integer)
      * MP4:  mvhd timescale 1000, duration 500 + c%9999 ms
      * k%17==0 rows: headerless filler only (decode-error coverage)

    plus ``10 + k%100`` trailing filler bytes of value ``k%251``.
    Because the parameters are plain arithmetic, an external oracle
    (DuckDB) can predict :func:`header_feature`'s output per asset
    WITHOUT parsing bytes — while the Spark path must actually parse
    the real containers it builds here.  Used by the
    ``multimodal_features`` driver oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def build(k: int, c: int) -> tuple[str, bytes]:
            kind = ("image", "audio", "video")[k % 3]
            filler = bytes([k % 251]) * (10 + k % 100)
            if k % 17 == 0:
                return kind, filler
            if kind == "image":
                w, h = 1 + k % 1024, 1 + c % 1024
                return kind, b"GIF89a" + struct.pack("<HH", w, h) + filler
            if kind == "audio":
                ch, rate = 1 + k % 2, 8000 * (1 + c % 3)
                n_samples = 48 * (5 + c % 40)
                dsize = n_samples * ch * 2
                fmt = struct.pack("<HHIIHH", 1, ch, rate,
                                  ch * rate * 2, ch * 2, 16)
                body = (b"fmt " + struct.pack("<I", 16) + fmt
                        + b"data" + struct.pack("<I", dsize)
                        + bytes([k % 251]) * dsize)
                return kind, (b"RIFF" + struct.pack("<I", 4 + len(body))
                              + b"WAVE" + body)
            dur = 500 + c % 9999
            mvhd = (struct.pack(">I", 28) + b"mvhd" + b"\x00\x00\x00\x00"
                    + struct.pack(">IIII", 0, 0, 1000, dur))
            moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
            ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
            return kind, ftyp + moov + filler

        for pdf in batches:
            rows = []
            for k, c in zip(pdf["k"], pdf["c"]):
                kind, blob = build(int(k), int(c))
                rows.append({"asset_id": f"m{int(k)}", "kind": kind,
                             "bytes": blob, "meta": {}})
            yield pd.DataFrame(rows, columns=["asset_id", "kind",
                                              "bytes", "meta"])

    return keys.select("k", "c").mapInPandas(gen, schema=ASSET_SCHEMA)


def bucketed(assets: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Partitioning strategy: stable hash-bucket by asset id (Iceberg
    ``bucket(n, asset_id)`` analogue)."""
    return assets.withColumn(
        "bucket", F.pmod(F.xxhash64("asset_id"), F.lit(n_buckets)))


FRAME_SCHEMA = ("asset_id string, frame_idx long, ts_ms long, "
                "frame binary")


def sample_frames(assets: DataFrame, every_ms: int = 1000,
                  max_frames: int = 16) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp.

    The Spark-side plumbing is real — header-decoded duration drives
    the sample points, the hop is one Arrow-batched ``mapInPandas``,
    and output rows are (asset_id, frame_idx, ts_ms, frame binary),
    ready to feed ``extract_features``.  The pixel decode itself is a
    deterministic fake (sha256 of asset_id/frame_idx — this container
    ships no video codecs); swap ``_fake_frame`` for a real decoder
    binding on a cluster with codecs installed."""

    def _fake_frame(asset_id: str, idx: int) -> bytes:
        return hashlib.sha256(
            f"{asset_id}\x00{idx}".encode()).digest()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["bytes"]):
                try:
                    meta = decode_headers(data)
                    dur = meta.get("duration_ms") or 0
                except ValueError:
                    dur = 0
                n = min(max_frames, max(1, dur // every_ms + 1))
                for i in range(int(n)):
                    rows.append({"asset_id": aid, "frame_idx": i,
                                 "ts_ms": i * every_ms,
                                 "frame": _fake_frame(aid, i)})
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "ts_ms",
                               "frame"])

    return assets.select("asset_id", "bytes").mapInPandas(
        gen, schema=FRAME_SCHEMA)
