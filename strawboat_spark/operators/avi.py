"""AVI (RIFF) container with MJPEG video streams — pure stdlib/numpy,
public spec (Microsoft AVI RIFF form, 'vids'/'MJPG'; OpenDML for the
extensions we don't need).

Motion-JPEG sidesteps the H.264 seam honestly: every frame is an
independent baseline JPEG, decodable with the engine's own T.81
decoder (operators/jpeg.py) — no inter-frame state, which is also the
scale story: frame extraction from an MJPEG corpus is
embarrassingly parallel inside Arrow batches, exactly like the Y4M
path (multimodal.py). H.264/H.265 remain declared seams: inter-frame
prediction needs a full reference-frame DPB and the entropy coders'
normative tables, out of scope offline.

Reference parity: the reference engine (strawboat columnar format,
Rust) ships no media codecs; this extends SURVEY §2C's multimodal
column story.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def synthesize_avi_mjpeg_bytes(
    doc_id: int, width: int, height: int, n_frames: int, fps: int = 10
) -> bytes:
    """Deterministic MJPEG AVI: frame k is the DC-only grayscale JPEG
    whose 8x8 block j is constant ((j*41 + doc_id + 13*k) % 256) — the
    same exactness trick as synthesize_jpeg_bytes, shifted per frame,
    so every sampled frame's mean is an analytic function of
    (doc_id, k) an SQL oracle can replay."""
    from strawboat_spark.operators.jpeg import encode_jpeg_gray

    if width % 8 or height % 8:
        raise ValueError("width/height must be multiples of 8")
    bw_, bh_ = width // 8, height // 8
    frames = []
    for k in range(n_frames):
        vals = (np.arange(bw_ * bh_, dtype=np.int64) * 41 + doc_id + 13 * k) % 256
        px = np.repeat(np.repeat(vals.reshape(bh_, bw_), 8, axis=0), 8, axis=1)
        frames.append(encode_jpeg_gray(px.astype(np.uint8)))

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # usec per frame
        0,  # max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n_frames,
        0,  # initial frames
        1,  # streams
        max(len(f) for f in frames) if frames else 0,
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1, fps,  # scale, rate -> fps
            0, n_frames,  # start, length
            max(len(f) for f in frames) if frames else 0,
            0xFFFFFFFF,  # quality
            0,  # sample size
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_body) + 4, len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln) for off, ln in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def parse_avi(payload: bytes) -> dict:
    """Walk the RIFF tree: returns {width, height, n_frames, fps,
    handler, frames: [bytes]} for the first video stream. Frames come
    from the movi '..dc'/'..db' chunks (idx1, when present, is
    cross-checked for count)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    out = {"frames": [], "handler": None, "fps": None}
    n_idx = None

    def walk(buf, pos, end):
        nonlocal n_idx
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            if fourcc == b"LIST":
                ltype = buf[body_start : body_start + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_start + size)
            elif fourcc == b"avih":
                fields = struct.unpack_from("<14I", buf, body_start)
                out["n_frames_hdr"] = fields[4]
                out["width"] = fields[8]
                out["height"] = fields[9]
            elif fourcc == b"strh":
                if buf[body_start : body_start + 4] == b"vids":
                    out["handler"] = buf[body_start + 4 : body_start + 8].decode("ascii")
                    scale, rate = struct.unpack_from("<II", buf, body_start + 20)
                    out["fps"] = rate // scale if scale else 0
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                out["frames"].append(bytes(buf[body_start : body_start + size]))
            elif fourcc == b"idx1":
                n_idx = size // 16
            pos = body_start + size + (size & 1)

    walk(payload, 12, len(payload))
    if "width" not in out:
        raise ValueError("AVI missing avih header")
    if n_idx is not None and n_idx != len(out["frames"]):
        raise ValueError(f"idx1 lists {n_idx} frames but movi holds {len(out['frames'])}")
    out["n_frames"] = len(out["frames"])
    return out


def decode_avi_frames(payload: bytes, every_n: int = 1) -> list[tuple]:
    """Frame-sample an MJPEG AVI: every_n-th frame decoded through the
    engine's baseline-JPEG decoder. Returns [(frame_idx, width,
    height, mean)] — the Y4M frame-sampling contract, for compressed
    input."""
    from strawboat_spark.operators.jpeg import decode_jpeg

    meta = parse_avi(payload)
    if meta["handler"] not in ("MJPG", "mjpg"):
        raise ValueError(f"only MJPEG AVI decode supported (handler {meta['handler']!r})")
    out = []
    for k in range(0, meta["n_frames"], every_n):
        w, h, mean = decode_jpeg(meta["frames"][k])
        out.append((k, w, h, mean))
    return out
