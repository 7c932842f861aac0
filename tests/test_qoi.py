"""QOI codec tests (operators/qoi.py): spec-op coverage, hypothesis
roundtrip, error paths, multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from strawboat_spark.operators.qoi import (
    decode_qoi,
    decode_qoi_pixels,
    encode_qoi,
    synthesize_qoi_bytes,
)


def test_all_ops_exercised_roundtrip():
    # long runs (RUN), tiny diffs (DIFF), luma-range diffs (LUMA),
    # cache revisits (INDEX), raw drops (RGB), alpha change (RGBA)
    px = np.zeros((4, 70, 4), dtype=np.uint8)
    px[..., 3] = 255
    px[0, :] = (10, 20, 30, 255)                 # run
    px[1, :] = (11, 21, 31, 255)                 # diff from prev row end
    px[2, ::2] = (10, 20, 30, 255)               # index hits
    px[2, 1::2] = (200, 100, 50, 255)            # rgb drops + index
    px[3, :] = (200, 100, 50, 128)               # rgba (alpha change)
    out = decode_qoi_pixels(encode_qoi(px))
    assert (out == px).all()


def test_rgb_only_images():
    px = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    out = decode_qoi_pixels(encode_qoi(px))
    assert out.shape == (5, 6, 3) and (out == px).all()


def test_error_paths():
    with pytest.raises(ValueError, match="magic"):
        decode_qoi_pixels(b"nope" + b"\x00" * 20)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    wire = bytearray(encode_qoi(px))
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi_pixels(bytes(wire[:15]))
    wire[-1] = 0x02  # break the end marker
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi_pixels(bytes(wire))


def test_run_overrun_is_diagnosed_not_clipped():
    """A corrupt RUN op past the pixel count must raise the overrun
    diagnostic, not be silently clipped by the numpy slice and surface
    later as a misleading 'missing end marker'."""
    import struct

    # header for a 2x2 RGB image, then a RUN of 62 pixels (0xC0 | 61)
    hdr = b"qoif" + struct.pack(">IIBB", 2, 2, 3, 0)
    wire = hdr + bytes([0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    with pytest.raises(ValueError, match="overruns pixel count"):
        decode_qoi_pixels(wire)


def test_property_random_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=16),
        ch=st.sampled_from([3, 4]),
        seed=st.integers(min_value=0, max_value=2**31),
        low_entropy=st.booleans(),
    )
    def check(w, h, ch, seed, low_entropy):
        rng = np.random.default_rng(seed)
        hi = 4 if low_entropy else 256  # low-entropy drives runs/index
        px = rng.integers(0, hi, (h, w, ch), dtype=np.uint8)
        out = decode_qoi_pixels(encode_qoi(px))
        assert out.shape == px.shape and (out == px).all()

    check()


def test_multimodal_dispatch():
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    payload = synthesize_qoi_bytes(7, 8, 5)
    assert _decode_image_bytes(payload, False) == decode_qoi(payload)


def test_fuzz_truncation_and_byteflips_never_hang_or_misdecode():
    """Adversarial inputs: every truncation raises cleanly; random
    byte flips either raise or decode to SOME image — never hang,
    never crash the interpreter (the page-file fuzz contract, applied
    to the media parser)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = synthesize_qoi_bytes(5, 8, 6)

    @settings(max_examples=120, deadline=None)
    @given(
        cut=st.integers(min_value=0, max_value=len(base) - 1),
        flip_at=st.integers(min_value=0, max_value=len(base) - 1),
        flip_val=st.integers(min_value=1, max_value=255),
        mode=st.sampled_from(["truncate", "flip"]),
    )
    def check(cut, flip_at, flip_val, mode):
        if mode == "truncate":
            data = base[:cut]
        else:
            b = bytearray(base)
            b[flip_at] ^= flip_val
            data = bytes(b)
        try:
            px = decode_qoi_pixels(data)
            assert px.dtype == np.uint8  # decoded: fine, bits were benign
        except (ValueError, IndexError):
            pass  # clean rejection

    check()
