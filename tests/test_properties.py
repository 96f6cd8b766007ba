"""Property-based tests (hypothesis) for the pure-Python kernels whose
correctness the SQL oracles rely on: split-bound arithmetic and the
dependency-free BMP/WAV codecs. No SparkSession — these run per
generated example, so they stay in pure Python."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from group5_spark.extensions.multimodal import (
    bmp_stride,
    decode_audio,
    decode_image,
    make_bmp,
    make_wav,
)
from group5_spark.extensions.splits import split_bounds

# a dict of 1-4 split names with weights that will be normalized to ~1
_splits = st.lists(
    st.tuples(st.text("abcdefgh", min_size=1, max_size=5),
              st.integers(min_value=1, max_value=100)),
    min_size=1, max_size=4, unique_by=lambda t: t[0],
).map(lambda items: {
    name: w / sum(w2 for _, w2 in items) for name, w in items
})


@given(_splits)
def test_split_bounds_cover_keyspace_monotonically(splits):
    bounds = split_bounds(splits)
    cuts = [int(h, 16) for _, h in bounds]
    # last cut always closes the full hash keyspace → no key unassigned
    assert cuts[-1] == (1 << 32) - 1
    # strictly ordered cut points ⇔ buckets are disjoint intervals
    assert all(a <= b for a, b in zip(cuts, cuts[1:]))
    # each split's share of the keyspace tracks its fraction (±1%)
    lo = 0
    for (name, _), cut in zip(bounds, cuts):
        share = (cut - lo + 1) / (1 << 32)
        assert abs(share - splits[name]) < 0.01 + 1e-9, name
        lo = cut + 1


@settings(max_examples=50)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_bmp_roundtrip_any_geometry(width, height, fill):
    payload = make_bmp(width, height, fill)
    # spec invariants: declared file size matches actual bytes; rows
    # are 4-byte aligned
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
    assert bmp_stride(width) % 4 == 0
    w, h, mean = decode_image(payload)
    assert (w, h) == (width, height)
    assert abs(mean - fill) < 1e-9  # solid fill → exact mean


@settings(max_examples=50)
@given(st.integers(min_value=0, max_value=10_000))
def test_wav_roundtrip_matches_declared_formula(media_id):
    payload = make_wav(media_id)
    ch, rate, n, dur, rms = decode_audio(payload)
    assert ch == 1
    assert rate == 8000 + (media_id % 3) * 4000
    assert n == 400 + (media_id % 200)
    assert abs(dur - n / rate) < 1e-9
    # RMS of the deterministic ramp recomputed independently
    samples = [((i * 37 + media_id * 11) % 201) - 100 for i in range(n)]
    want = (sum(s * s for s in samples) / n) ** 0.5
    assert abs(rms - want) < 1e-6


@given(st.binary(max_size=64))
def test_decoders_never_raise_on_garbage(blob):
    w, h, _ = decode_image(blob)
    assert (w, h) == (0, 0) or blob[:2] in (b"BM", b"P6")
    ch, rate, n, _, _ = decode_audio(blob)
    assert (ch, rate, n) == (0, 0, 0) or blob[:4] == b"RIFF"


@settings(max_examples=50)
@given(st.integers(min_value=0, max_value=10_000))
def test_bmpv_video_roundtrip_matches_formula(media_id):
    from group5_spark.extensions.multimodal import decode_video, make_bmpv

    payload = make_bmpv(media_id)
    n_frames, fps, w, h, dur, mean = decode_video(payload)
    assert n_frames == 6 + media_id % 10
    assert fps == 10 + (media_id % 3) * 5
    assert (w, h) == (4 + media_id % 5, 3 + media_id % 4)
    assert abs(dur - n_frames / fps) < 1e-9
    fills = [(media_id * 7 + f * 13) % 256 for f in range(n_frames)]
    assert abs(mean - sum(fills) / len(fills)) < 1e-9


@given(st.binary(max_size=64))
def test_video_decoder_never_raises_on_garbage(blob):
    from group5_spark.extensions.multimodal import decode_video

    n, fps, w, h, _, _ = decode_video(blob)
    assert (n, fps, w, h) == (0, 0, 0, 0) or blob[:4] == b"BMPV"
