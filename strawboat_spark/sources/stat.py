"""Page introspection — reference `stat_simple`/`stat_body`
(src/stat.rs:63-152): per-leaf codec usage, page sizes, null counts,
and the persisted min/max. Useful for verifying the adaptive chooser
picked what you expect on real data.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from strawboat_spark.sources.codecs import HEADER_SIZE, Codec
from strawboat_spark.sources.pagefile import FileMeta, read_footer


@dataclass
class LeafStat:
    name: str
    n_pages: int
    total_compressed: int
    total_values: int
    null_count: int
    codecs: dict = field(default_factory=dict)  # codec name -> page count
    min: object = None
    max: object = None
    dict_unique: int = 0  # sum of dictionary sizes over DICT pages
    freq_exceptions: int = 0  # sum of exception counts over FREQ pages


def stat_file(path: str) -> list[LeafStat]:
    from strawboat_spark.sources.fileio import get_fs

    with get_fs(path).open_read(path) as f:
        schema, meta = read_footer(f)
        out: list[LeafStat] = []
        for lf in meta.leaves:
            st = LeafStat(
                name=lf.name,
                n_pages=len(lf.pages),
                total_compressed=sum(p.length for p in lf.pages),
                total_values=sum(p.num_values for p in lf.pages),
                null_count=sum(p.null_count for p in lf.pages),
            )
            mins = [p.min for p in lf.pages if p.min is not None]
            maxs = [p.max for p in lf.pages if p.max is not None]
            st.min = min(mins) if mins else None
            st.max = max(maxs) if maxs else None
            pos = lf.offset
            for p in lf.pages:
                if p.length == 0:
                    pos += p.length
                    continue
                f.seek(pos)
                head = f.read(4 + 1)
                (vlen,) = struct.unpack_from("<I", head, 0)
                f.seek(pos + 4 + vlen)
                block = f.read(HEADER_SIZE)
                if len(block) >= HEADER_SIZE:
                    codec = Codec(block[0]).name
                    # DICT/FREQ payload structure (reference stat_body:
                    # dict unique counts, freq exception counts)
                    if block[0] in (Codec.DICT, Codec.FREQ):
                        body_head = f.read(8)
                        if block[0] == Codec.DICT and len(body_head) >= 4:
                            st.dict_unique += struct.unpack_from("<I", body_head, 0)[0]
                        elif block[0] == Codec.FREQ and len(body_head) >= 8:
                            # int/double freq: top(8B) then n_exc; binary
                            # freq: top_len(4B)|top|n_exc — report the
                            # numeric-family count only (cheap parse)
                            f.seek(pos + 4 + vlen + HEADER_SIZE + 8)
                            exc_raw = f.read(4)
                            if len(exc_raw) == 4:
                                st.freq_exceptions += struct.unpack("<I", exc_raw)[0]
                        f.seek(pos + 4 + vlen + HEADER_SIZE)
                    # Binary pages carry TWO codec blocks (offsets then
                    # values — reference binary/mod.rs layout); report
                    # the pair so dict-encoded values aren't hidden
                    # behind the offsets codec.
                    (csize,) = struct.unpack_from("<I", block, 1)
                    next_pos = pos + 4 + vlen + HEADER_SIZE + csize
                    if next_pos + HEADER_SIZE <= pos + p.length:
                        f.seek(next_pos)
                        b2 = f.read(HEADER_SIZE)
                        if len(b2) >= 1:
                            try:
                                codec = f"{codec}+{Codec(b2[0]).name}"
                            except ValueError:
                                pass
                    st.codecs[codec] = st.codecs.get(codec, 0) + 1
                pos += p.length
            out.append(st)
        return out


def print_stat(path: str) -> None:
    for st in stat_file(path):
        print(
            f"{st.name}: pages={st.n_pages} bytes={st.total_compressed} "
            f"values={st.total_values} nulls={st.null_count} codecs={st.codecs} "
            f"min={st.min!r} max={st.max!r}"
        )


if __name__ == "__main__":
    import sys

    print_stat(sys.argv[1])
