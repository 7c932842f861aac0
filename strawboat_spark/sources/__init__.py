"""The strawboat columnar file format (pyarrow/numpy implementation)
and its Spark integration.

Layering (mirrors the reference's module split, SURVEY.md §0):
  codecs.py     adaptive per-page compression — the btrblocks design:
                stats → eligibility → analytic/sampled ratio → codec
  pagefile.py   file layout: magic | per-column page streams | footer
                (Arrow IPC schema + column/page metas + sizes + EOS)
  stat.py       page introspection (codec tree, sizes, min/max)
  datasource.py Spark Python DataSource: format("strawboat") read/write
                with column pruning + filter pushdown → page skipping
"""
