"""Property-based tests (hypothesis) for the engine's pure functions:
container-header decode round-trips and the assignment solver against
brute force.  No SparkSession — these run in milliseconds."""

import struct
import zlib
from itertools import permutations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neleval_spark.functions.assignment import (
    max_weight_assignment_total, min_cost_assignment)
from neleval_spark.functions.multimodal import decode_headers


@given(w=st.integers(1, 2**31 - 1), h=st.integers(1, 2**31 - 1))
def test_png_roundtrip(w, h):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    assert decode_headers(data) == {"format": "png", "width": w,
                                    "height": h}


@given(w=st.integers(1, 65535), h=st.integers(1, 65535))
def test_gif_roundtrip(w, h):
    data = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6
    assert decode_headers(data) == {"format": "gif", "width": w,
                                    "height": h}


@given(rate=st.sampled_from([8000, 16000, 44100, 48000]),
       channels=st.integers(1, 2), bits=st.sampled_from([8, 16]),
       n_samples=st.integers(1, 10**6))
def test_wav_roundtrip(rate, channels, bits, n_samples):
    size = n_samples * channels * bits // 8
    data = (b"RIFF" + struct.pack("<I", 36 + size) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
            + b"data" + struct.pack("<I", size))
    meta = decode_headers(data)
    assert meta["format"] == "wav"
    assert meta["channels"] == channels
    assert meta["sample_rate_hz"] == rate
    want_ms = int(round(1000 * size / (channels * rate * bits / 8)))
    assert abs(meta["duration_ms"] - want_ms) <= 1


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 5).flatmap(lambda n: st.lists(
    st.lists(st.integers(0, 100), min_size=n, max_size=n),
    min_size=n, max_size=n)))
def test_assignment_matches_brute_force(rows):
    """The shortest-augmenting-path solver equals exhaustive search on
    every square matrix up to 5x5."""
    cost = np.array(rows, dtype=float)
    n = cost.shape[0]
    r, c = min_cost_assignment(cost)
    got = cost[r, c].sum()
    best = min(sum(cost[i, p[i]] for i in range(n))
               for p in permutations(range(n)))
    assert got == best
    # and the max-weight wrapper agrees on the complementary problem
    assert max_weight_assignment_total(-cost) == -best
