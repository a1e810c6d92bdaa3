"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched UDFs.

The decode step is STUBBED — the image/audio libraries are not in this
container — behind ``decode_stub`` (NotImplementedError) and a
deterministic fake used by tests/benchmarks. What IS real and tested:
the asset schema, the partitioning strategy (bucket by asset id so a
re-run co-locates), the ``mapInPandas`` batch shapes, and the
feature-table contract downstream ops consume (fixed-length
``array<float>`` + metadata map).

Swap ``FEATURE_FN`` for a real decoder (PIL/torchaudio/decord) when
deploying; nothing else changes.
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
    """Real decoder goes here (image decode / audio resample / video
    frame-sample). Not available in this environment."""
    raise NotImplementedError(
        f"no media codec available in this environment for kind={kind!r}"
    )


def fake_feature(data: bytes, kind: str, dim: int = FEATURE_DIM):
    """Deterministic stand-in feature extractor: sha256 bytes → unit
    vector. Pure function of the asset bytes, so tests can pin
    outputs."""
    h = hashlib.sha256(kind.encode() + b"\x00" + (data or b"")).digest()
    v = np.frombuffer(h[: dim * 2], dtype=np.uint16).astype(np.float32)
    v = v - v.mean()
    n = np.linalg.norm(v)
    return (v / n if n else v).tolist()


FEATURE_FN = fake_feature


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


def bucketed(assets: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Partitioning strategy: stable hash-bucket by asset id (Iceberg
    ``bucket(n, asset_id)`` analogue)."""
    return assets.withColumn(
        "bucket", F.pmod(F.xxhash64("asset_id"), F.lit(n_buckets)))
