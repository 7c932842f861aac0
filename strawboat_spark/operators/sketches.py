"""Frequency-sketch operators: exact two-pass heavy hitters.

Misra-Gries (1982) per-partition summaries -> guaranteed candidate
superset -> exact broadcast recount. The classic shape for "which
tokens/domains/urls dominate this 100 TB corpus":

- Pass 1 (mapInPandas, one state per input partition): an MG summary
  with k counters per partition. Guarantee: any item whose PARTITION
  count exceeds n_p/k survives that partition's summary, so by the
  averaging argument any item with GLOBAL count > N/k survives in at
  least one partition — the union of summaries is a certified
  candidate superset for every threshold >= N/k. Output is bounded at
  k rows per partition regardless of input cardinality: the full
  groupBy(col).count() shuffle an exact one-pass answer would need —
  quadrillions of distinct URLs — never happens.
- Pass 2: exact counts for candidates only (broadcast semi-join, size
  bounded by partitions * k), integer threshold filter. The output is
  therefore EXACT — deterministic counts, no estimation error — which
  is what makes a value-hash oracle possible for a sketch-based plan.

The per-partition total rides along as a sentinel row (item NULL), so
the operator reads the source ONCE for the sketch and once for the
recount — no separate count() job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _mg_partition(col: str, k: int):
    """Arrow-native MG pass (r17 opt, guide §4.2): per-batch counting
    runs in pyarrow's C++ value_counts over the raw Arrow column — only
    the ≤ (k + batch-distinct) SURVIVING values ever materialize as
    Python objects, where the former pandas formulation converted every
    input row to an object-dtype cell first. Decrement logic (and so
    the superset guarantee) is unchanged; the final operator output is
    an exact recount either way."""

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        counters: dict = {}
        n_p = 0
        for rb in batches:
            vc = pc.value_counts(rb.column(0).drop_null())
            cnts = vc.field("counts")
            n_p += int(pc.sum(cnts).as_py() or 0)
            for item, c in zip(vc.field("values").to_pylist(), cnts.to_pylist()):
                counters[item] = counters.get(item, 0) + c
            if len(counters) > k:
                # MG decrement: subtract the (k+1)-largest count from
                # everyone and drop the non-positive — one vectorized
                # step per batch instead of per-item decrements
                s = sorted(counters.values(), reverse=True)
                cut = s[k]
                counters = {i: c - cut for i, c in counters.items() if c > cut}
        yield pa.record_batch(
            [
                pa.array(list(counters.keys()) + [None], type=pa.string()),
                pa.array([int(c) for c in counters.values()] + [n_p], type=pa.int64()),
            ],
            names=[col, "c"],
        )

    return gen


def heavy_hitters(
    df: DataFrame, col: str, min_frac_num: int = 1, min_frac_den: int = 100
) -> DataFrame:
    """Items of `df[col]` occurring at least (min_frac_num /
    min_frac_den) of the time, with EXACT counts. Integer-rational
    threshold (default 1/100) keeps both engines' filters identical —
    no float comparison at the boundary.

    k is 2x the information-theoretic minimum (den/num) so the
    candidate set comfortably covers the threshold even with skewed
    partition splits."""
    k = 2 * ((min_frac_den + min_frac_num - 1) // min_frac_num)
    sketch = df.select(F.col(col).cast("string").alias(col)).mapInArrow(
        _mg_partition(col, k), schema=f"{col} string, c long"
    )
    sketch = sketch.localCheckpoint(eager=True)  # one sketch pass, reused twice
    total = sketch.filter(F.col(col).isNull()).agg(F.sum("c").alias("n"))
    cands = sketch.filter(F.col(col).isNotNull()).select(col).distinct()
    # No forced broadcast on the candidate side: the superset is bounded
    # by partitions * k, which at 100 TB (~800k input splits, k=200) is
    # ~1.6e8 strings — far past safe broadcast.  A plain leftsemi lets
    # AQE broadcast when the candidate set is actually small and fall
    # back to a shuffled semi-join when it isn't; exactness is
    # unaffected (the recount is a full second pass either way).
    exact = (
        df.select(F.col(col).cast("string").alias(col))
        .join(cands, col, "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * min_frac_den >= F.col("n") * min_frac_num)
        .select(col, "cnt")
        .orderBy(F.desc("cnt"), col)
    )
