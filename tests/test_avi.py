"""AVI/MJPEG container tests (operators/avi.py): RIFF tree walk,
header fields, idx1 cross-check, frame sampling, error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from strawboat_spark.operators.avi import (
    decode_avi_frames,
    parse_avi,
    synthesize_avi_mjpeg_bytes,
)


def test_parse_header_fields():
    p = synthesize_avi_mjpeg_bytes(7, 16, 8, 5, fps=25)
    m = parse_avi(p)
    assert (m["width"], m["height"], m["n_frames"], m["handler"], m["fps"]) == (
        16, 8, 5, "MJPG", 25,
    )
    assert m["n_frames_hdr"] == 5
    # every frame is a standalone JPEG
    assert all(f[:2] == b"\xff\xd8" and f[-2:] == b"\xff\xd9" for f in m["frames"])


def test_frame_means_match_analytic():
    doc, w, h, nf = 11, 24, 16, 6
    p = synthesize_avi_mjpeg_bytes(doc, w, h, nf)
    nb = (w // 8) * (h // 8)
    for every_n in (1, 2, 3):
        for k, fw, fh, mean in decode_avi_frames(p, every_n=every_n):
            exp = round(float(np.mean((np.arange(nb) * 41 + doc + 13 * k) % 256)), 4)
            assert (fw, fh, mean) == (w, h, exp)


def test_riff_padding_survives_odd_chunks():
    """JPEG payloads have arbitrary parity; RIFF pads odd chunks with
    one byte that must not shift the walk."""
    for doc in range(8):
        p = synthesize_avi_mjpeg_bytes(doc, 8, 8, 3)
        m = parse_avi(p)
        assert m["n_frames"] == 3


def test_rejects_bad_magic_and_handler():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFX" + b"\x00" * 32)
    p = bytearray(synthesize_avi_mjpeg_bytes(1, 8, 8, 2))
    i = p.find(b"MJPG")  # strh handler fourcc
    p[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPEG"):
        decode_avi_frames(bytes(p))


def test_idx1_count_mismatch_detected():
    p = bytearray(synthesize_avi_mjpeg_bytes(1, 8, 8, 2))
    i = p.find(b"idx1")
    # shrink idx1 to one entry (16 bytes) and splice the container
    (old_len,) = struct.unpack_from("<I", p, i + 4)
    assert old_len == 32
    struct.pack_into("<I", p, i + 4, 16)
    p2 = bytes(p[: i + 8 + 16])
    # fix RIFF size
    p2 = p2[:4] + struct.pack("<I", len(p2) - 8) + p2[8:]
    with pytest.raises(ValueError, match="idx1"):
        parse_avi(p2)


def test_fuzz_truncation_and_byteflips_never_hang():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = synthesize_avi_mjpeg_bytes(3, 8, 8, 2)

    @settings(max_examples=100, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=1, max_value=255),
        mode=st.sampled_from(["truncate", "flip"]),
    )
    def check(pos, val, mode):
        data = base[:pos] if mode == "truncate" else bytes(
            bytearray(base[:pos]) + bytes([base[pos] ^ val]) + bytearray(base[pos + 1:])
        )
        try:
            frames = decode_avi_frames(data)
            assert isinstance(frames, list)
        except (ValueError, IndexError, struct.error, KeyError):
            pass

    check()
