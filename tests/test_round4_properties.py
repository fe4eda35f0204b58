"""Property tests for round-4 kernels: BPE merge fold, ring stats."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SYM = st.sampled_from(["a", "b", "ab", "ba", "x", "</w>"])


def _merge_py(syms: list[str], left: str, right: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.lists(SYM, min_size=0, max_size=8), min_size=1, max_size=6),
    SYM,
    SYM,
)
def test_merge_pair_fold_equals_reference_loop(spark, rows, left, right):
    from landlensdb_spark.operators.bpe import _merge_pair

    df = spark.createDataFrame(
        [(i, syms) for i, syms in enumerate(rows)], "id long, syms array<string>"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", _merge_pair(F.col("syms"), left, right).alias("m")
        ).collect()
    }
    for i, syms in enumerate(rows):
        assert got[i] == _merge_py(syms, left, right), (syms, left, right)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=8,
        unique=True,
    )
)
def test_ring_stats_matches_numpy_shoelace(spark, pts):
    """Closed ring from arbitrary integer points: the Spark fold equals
    the numpy shoelace/centroid (skipping zero-area degenerate rings)."""
    from landlensdb_spark.geo.polygon import ring_stats

    ring = [list(map(float, p)) for p in pts] + [list(map(float, pts[0]))]
    xs = np.array([p[0] for p in ring], dtype=float)
    ys = np.array([p[1] for p in ring], dtype=float)
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    area = cross.sum() / 2.0
    if abs(area) < 1e-9:
        return  # degenerate: centroid undefined
    cx = ((xs[:-1] + xs[1:]) * cross).sum() / (6.0 * area)
    cy = ((ys[:-1] + ys[1:]) * cross).sum() / (6.0 * area)

    df = spark.createDataFrame([(ring,)], "ring array<array<double>>")
    r = df.select(ring_stats(F.col("ring")).alias("s")).collect()[0]["s"]
    assert abs(r["area"] - area) < 1e-9
    assert abs(r["cx"] - cx) < 1e-9
    assert abs(r["cy"] - cy) < 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=8, max_value=24),
    st.integers(min_value=8, max_value=24),
    st.booleans(),
    st.integers(min_value=0, max_value=255),
)
def test_mjpeg_avi_roundtrip_property(n_frames, h, w, color, seed):
    """Arbitrary frame stacks survive the AVI container: meta matches,
    every frame chunk is the byte-exact JPEG the encoder produced, and
    decoding through the container equals decoding the frame directly."""
    from landlensdb_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
    )
    from landlensdb_spark.operators.video import (
        avi_meta,
        encode_mjpeg_avi,
        mjpeg_frames,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    frames = [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n_frames)]
    blob = encode_mjpeg_avi(frames, fps=12)
    assert avi_meta(blob)[:3] == (w, h, n_frames)
    chunks = mjpeg_frames(blob)
    assert len(chunks) == n_frames
    enc = encode_jpeg_color if color else encode_jpeg_gray
    for f, c in zip(frames, chunks):
        assert c == enc(f, 85)  # container adds nothing, drops nothing
        assert np.array_equal(decode_jpeg(c), decode_jpeg(enc(f, 85)))
