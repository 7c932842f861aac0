"""Archive-shard plumbing for training corpora (WebDataset layout).

Large multimodal corpora ship as tar shards whose members are grouped
by a shared key prefix (`000123.jpg`, `000123.txt`, `000123.json` =
one sample). The operators here explode shard payloads into one row
per member — relationally, so Spark parallelizes members, not whole
shards — and regroup members into samples JVM-side.

Scale shape: the shard payload enters one mapInPandas stage and is
dropped immediately after member extraction (the exploded rows carry
only member bytes); grouping to samples is a map_from_entries over a
groupBy on the compact (shard_id, sample_key) pair, never on payloads.
Everything is stdlib tarfile/gzip — no external dependencies.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TAR_MEMBERS = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("member_name", StringType(), False),
        StructField("member_size", LongType(), False),
        StructField("member_bytes", BinaryType(), False),
    ]
)


def explode_tar_members(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """One row per regular tar member: (shard_id, member_name,
    member_size, member_bytes). Compression is sniffed by tarfile
    (`r:*` — plain tar, tar.gz, tar.bz2, tar.xz all work)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                with tarfile.open(fileobj=io.BytesIO(bytes(payload)), mode="r:*") as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        data = tf.extractfile(m).read()
                        rows.append((int(sid), m.name, len(data), data))
            yield pd.DataFrame(
                rows, columns=["shard_id", "member_name", "member_size", "member_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=TAR_MEMBERS)


def group_webdataset_samples(members: DataFrame) -> DataFrame:
    """WebDataset regrouping: members sharing the name prefix before
    the first dot form one sample; the result is one row per
    (shard_id, sample_key) with a map from extension to bytes.
    Pure built-in expressions — no Python after the explode."""
    keyed = members.select(
        "shard_id",
        F.regexp_extract("member_name", r"^([^.]+)\.", 1).alias("sample_key"),
        F.regexp_extract("member_name", r"^[^.]+\.(.+)$", 1).alias("ext"),
        "member_bytes",
    )
    return (
        keyed.groupBy("shard_id", "sample_key")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("ext", "member_bytes")))
            ).alias("parts"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
    )


def synthesize_tar_bytes(shard_id: int, n_samples: int, compress: bool = False) -> bytes:
    """Deterministic WebDataset-style shard: sample s has members
    `{shard_id:06d}-{s:04d}.bin` (byte j = (j*19 + shard_id + s) % 256,
    length 64 + (s*7) % 32) and `...txt` (b"doc-<shard>-<s>"). Fixed
    mtime/uid keep the bytes reproducible; gzip uses mtime=0."""
    import numpy as np

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for s in range(n_samples):
            key = f"{shard_id:06d}-{s:04d}"
            size = 64 + (s * 7) % 32
            body = ((np.arange(size, dtype=np.int64) * 19 + shard_id + s) % 256).astype(
                np.uint8
            ).tobytes()
            txt = f"doc-{shard_id}-{s}".encode()
            for name, data in ((f"{key}.bin", body), (f"{key}.txt", txt)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if compress:
        import gzip

        return gzip.compress(raw, compresslevel=6, mtime=0)
    return raw
