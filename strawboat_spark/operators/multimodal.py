"""Multimodal column plumbing (SURVEY.md §2C ⊕ multimodal).

Design: media rides in opaque BinaryType payload columns with a typed
metadata struct alongside — the strawboat format stores BinaryType
natively (§1.2), so payloads round-trip through format("strawboat")
unchanged. Decode / feature-extract run as Arrow-batched mapInPandas
stages. Decode is REAL — pure numpy, no external libraries — for binary PPM
`P6` + 24-bit BMP + baseline JPEG (operators/jpeg.py, full T.81
Huffman+IDCT) + PNG (operators/png.py, stdlib-zlib inflate +
unfilter) + GIF (operators/gif.py, variable-width LZW) images,
RIFF/PCM16 WAV audio, and YUV4MPEG2 (Y4M) video,
each gated by an exact analytic DuckDB oracle
(`multimodal_image_decode`, `multimodal_jpeg_decode`,
`multimodal_png_decode`, `multimodal_gif_decode`,
`multimodal_wav_decode`, `multimodal_video_frames`). MP3's
deterministic surface (ID3 + frame walk + duration/bitrate stats) is
REAL and exactly gated (operators/mp3.py, `multimodal_mp3_frames`);
MP3/H.264 PCM/pixel decode is DECIDED OUT (COVERAGE.md: float
IMDCT/inter-frame paths cannot be exactly oracled in SQL and no
conformance vectors ship here) — those sample paths raise a declared
NotImplementedError (or a deterministic fake under
`deterministic_fake=True`), and swapping in ffmpeg later touches only
the `_decode_*` seams.

Scale notes: payload columns dominate bytes, so every stage keeps
them in Arrow batches (no per-row Python), prunes the payload as early
as possible (`drop("payload")` right after feature extraction), and
never groups by payload — only by compact ids/fingerprints.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def pack_media(df: DataFrame, payload_col: str, mime: str) -> DataFrame:
    """Attach the typed metadata struct to a binary payload column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def synthesize_ppm_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic P6 PPM image: pixel i (channel-flattened) is
    ((i*31 + doc_id) % 256). Used to exercise the REAL decoder with an
    SQL-computable expected mean."""
    import numpy as np

    header = f"P6\n{width} {height}\n255\n".encode()
    px = ((np.arange(width * height * 3, dtype=np.int64) * 31 + doc_id) % 256).astype(np.uint8)
    return header + px.tobytes()


def synthesize_bmp_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic uncompressed 24-bit BMP: pixel byte i (row-major,
    bottom-up, no padding — width must be a multiple of 4 so rows are
    4-byte aligned) is ((i*17 + doc_id) % 256). Used to exercise the
    REAL BMP decoder with an SQL-computable expected mean."""
    import struct as _struct

    import numpy as np

    if width % 4:
        raise ValueError("width must be a multiple of 4 (padless rows)")
    n_px = width * height * 3
    data_off = 14 + 40
    header = b"BM" + _struct.pack("<IHHI", data_off + n_px, 0, 0, data_off)
    header += _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, n_px, 2835, 2835, 0, 0)
    px = ((np.arange(n_px, dtype=np.int64) * 17 + doc_id) % 256).astype(np.uint8)
    return header + px.tobytes()


def _decode_ppm(payload: bytes):
    """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    comment/whitespace handling, then raw RGB rows. Pure numpy."""
    import numpy as np

    pos = 2  # past b"P6"
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, round(float(px.astype(np.float64).mean()), 4) if len(px) else 0.0


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): rows bottom-up,
    padded to 4 bytes. Pure numpy."""
    import struct as _struct

    import numpy as np

    data_off = _struct.unpack_from("<I", payload, 10)[0]
    w = _struct.unpack_from("<i", payload, 18)[0]
    h_raw = _struct.unpack_from("<i", payload, 22)[0]
    bpp = _struct.unpack_from("<H", payload, 28)[0]
    comp = _struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = rows.reshape(h, row_bytes)[:, : w * 3]
    return w, h, round(float(px.astype(np.float64).mean()), 4)


def _decode_image_bytes(payload: bytes, deterministic_fake: bool):
    """Image decode: REAL for binary PPM `P6`, uncompressed 24-bit BMP,
    baseline JPEG (pure-numpy Huffman+IDCT, operators/jpeg.py),
    PNG (operators/png.py, stdlib-zlib inflate + numpy unfilter),
    GIF (operators/gif.py, variable-width LZW + palettes + interlace),
    and TIFF (operators/tiff.py, strips + PackBits/LZW + predictor);
    remaining formats (WebP/...) need an imaging library this
    container doesn't ship — they fall back to a stable pseudo-decode
    when deterministic_fake=True, else raise. The mapInPandas plumbing
    is identical either way, so swapping in PIL later only touches
    this function."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from strawboat_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"\x89PNG":
        from strawboat_spark.operators.png import decode_png

        return decode_png(payload)
    if payload[:4] == b"GIF8":
        from strawboat_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from strawboat_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"qoif":
        from strawboat_spark.operators.qoi import decode_qoi

        return decode_qoi(payload)
    if not deterministic_fake:
        raise NotImplementedError(
            "only PPM(P6)/BMP(24bpp)/baseline-JPEG/PNG/GIF/TIFF/QOI decode natively; "
            "other formats need an imaging library (PIL/opencv) not "
            "present in this environment; pass deterministic_fake=True "
            "to exercise the pipeline with stable fake features"
        )
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean = (sum(payload[:256]) / max(min(n, 256), 1)) if n else 0.0
    return width, height, round(mean, 4)


IMAGE_FEATURES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_intensity", DoubleType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def extract_image_features(
    df: DataFrame, id_col: str, payload_col: str, deterministic_fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each worker receives column batches; payload bytes
    never pass through the driver and are dropped from the output."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, mean = _decode_image_bytes(b, deterministic_fake)
                rows.append((doc_id, w, h, mean, len(b)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_intensity", "n_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=IMAGE_FEATURES)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx) pairs a
    decoder stage would fill; the fan-out is expressed relationally so
    Spark parallelizes frames, not whole videos."""
    n_frames = (F.length(payload_col) / 1024 + 1).cast("int")  # stub: 1 frame/KiB
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_chunk_plan(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    chunk_bytes: int = 4096,
) -> DataFrame:
    """Audio chunking plumbing: fan a payload out into fixed-size byte
    windows — (id, chunk_idx, byte_start, byte_len, chunk binary).

    The slice itself is F.substring on BinaryType — JVM-side, no
    Python; a decoder stage (resample/transcribe) would mapInPandas
    over `chunk`. Expressed relationally so Spark parallelizes chunks,
    not whole files: a 4-hour recording becomes thousands of
    independent rows instead of one straggler task.
    """
    n = F.length(payload_col).cast("long")
    n_chunks = F.ceil(n / F.lit(chunk_bytes)).cast("int")
    e = df.select(
        F.col(id_col),
        F.col(payload_col).alias("__payload"),
        n.alias("__n"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
        ).alias("chunk_idx"),
    )
    byte_start = (F.col("chunk_idx").cast("long") * chunk_bytes).alias("byte_start")
    byte_len = F.least(
        F.lit(chunk_bytes).cast("long"), F.col("__n") - F.col("chunk_idx") * chunk_bytes
    ).alias("byte_len")
    return e.select(
        id_col,
        "chunk_idx",
        byte_start,
        byte_len,
        F.substring(
            F.col("__payload"), F.col("chunk_idx") * chunk_bytes + 1, F.lit(chunk_bytes)
        ).alias("chunk"),
    )


AUDIO_FEATURES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("rms", DoubleType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def extract_audio_features(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched per-chunk feature stub (true RMS over the raw
    bytes interpreted as u8 samples — deterministic, library-free;
    swap the inner two lines for a real DSP call to go live)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, idx, chunk in zip(pdf[id_col], pdf["chunk_idx"], pdf["chunk"]):
                b = np.frombuffer(bytes(chunk or b""), dtype=np.uint8).astype(np.float64)
                rms = float(np.sqrt(np.mean(b**2))) if len(b) else 0.0
                rows.append((doc_id, idx, round(rms, 4), len(b)))
            yield pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "rms", "n_bytes"])

    return chunks.select(id_col, "chunk_idx", "chunk").mapInPandas(gen, schema=AUDIO_FEATURES)


def synthesize_wav_bytes(doc_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: sample i is
    ((i*37 + doc_id*11) % 2048) - 1024. Exercises the REAL RIFF parser
    with an SQL-computable expected RMS."""
    import struct as _struct

    import numpy as np

    samples = ((np.arange(n_samples, dtype=np.int64) * 37 + doc_id * 11) % 2048 - 1024).astype(
        "<i2"
    )
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    hdr += b"data" + _struct.pack("<I", len(data))
    return hdr + data


def decode_wav(payload: bytes):
    """RIFF/WAVE parse, pure numpy: walks chunks (fmt /data, any
    order, extension-tolerant), returns (sample_rate, n_samples,
    duration_sec, rms). Mono or interleaved multi-channel (RMS over
    all channels). Sample codings: PCM16 (format tag 1), the G.711
    telephony laws — A-law (tag 6) and μ-law (tag 7), decoded through
    operators/g711.py's exact integer arithmetic — and IMA ADPCM
    (tag 0x11) through operators/adpcm.py's block decoder."""
    import struct as _struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif audio_format == 6 and bits == 8:
        from strawboat_spark.operators.g711 import alaw_to_linear

        samples = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    elif audio_format == 7 and bits == 8:
        from strawboat_spark.operators.g711 import ulaw_to_linear

        samples = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    elif audio_format == 0x11 and bits == 4:
        from strawboat_spark.operators.adpcm import decode_ima_wav

        _, samples = decode_ima_wav(payload)
    else:
        raise ValueError(
            f"only PCM16/A-law/mu-law/IMA-ADPCM supported "
            f"(format={audio_format}, bits={bits})"
        )
    n_frames = len(samples) // max(n_channels, 1)
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    return sample_rate, n_frames, round(n_frames / sample_rate, 6), round(rms, 4)


def synthesize_g711_wav_bytes(doc_id: int, n_samples: int, law: str = "ulaw",
                              sample_rate: int = 8000) -> bytes:
    """Deterministic G.711 mono WAV: code byte i is ((i*7 + doc_id) % 256).
    Decode is exact integer arithmetic, so the expected RMS is an SQL
    formula over the same code sequence (the multimodal_g711_decode
    oracle replicates the μ-law bit fields literally)."""
    import struct as _struct

    import numpy as np

    codes = ((np.arange(n_samples, dtype=np.int64) * 7 + doc_id) % 256).astype(np.uint8)
    data = codes.tobytes()
    tag = 7 if law == "ulaw" else 6
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, tag, 1, sample_rate, sample_rate, 1, 8)
    hdr += b"data" + _struct.pack("<I", len(data))
    return hdr + data


def synthesize_y4m_bytes(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Deterministic YUV4MPEG2 (4:2:0) clip: luma pixel i of frame f is
    ((i*13 + f*7 + doc_id) % 256); chroma planes constant 128. The one
    video container a header-only numpy parser can decode for real."""
    import numpy as np

    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode())
    luma_n = width * height
    chroma = bytes([128] * ((width // 2) * (height // 2) * 2))
    idx = np.arange(luma_n, dtype=np.int64) * 13
    for f in range(n_frames):
        out += b"FRAME\n"
        out += ((idx + f * 7 + doc_id) % 256).astype(np.uint8).tobytes()
        out += chroma
    return bytes(out)


def decode_y4m_frames(payload: bytes, every_n: int = 1):
    """YUV4MPEG2 parse, pure numpy: header (W/H/C tags), then
    `FRAME\\n`-delimited uncompressed planes. Returns
    (width, height, n_frames, [(frame_idx, luma_mean) every Nth]).
    Only 4:2:0 (default) and 4:4:4 subsampling are supported."""
    import numpy as np

    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    c420 = True
    for tag in head[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            if tag[1:4] == b"444":
                c420 = False
            elif tag[1:4] != b"420":
                raise ValueError(f"unsupported chroma mode {tag!r}")
    if not w or not h:
        raise ValueError("missing W/H header tags")
    luma_n = w * h
    frame_bytes = luma_n + (2 * (w // 2) * (h // 2) if c420 else 2 * luma_n)
    pos = nl + 1
    frames = []
    idx = 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params (if any) end at \n
        if idx % every_n == 0:
            luma = np.frombuffer(payload, dtype=np.uint8, count=luma_n, offset=pos)
            frames.append((idx, round(float(luma.astype(np.float64).mean()), 4)))
        pos += frame_bytes
        idx += 1
    return w, h, idx, frames
