"""Distributed BPE tokenizer training + encoding (SURVEY.md §2C ⊕
text analysis — the trainable complement to functions/text.token_count's
whitespace proxy).

Algorithm (Sennrich et al. 2016, the public BPE formulation): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. The standard scale trick: training runs over the WORD-FREQUENCY
table, not the corpus — pair counts are weighted by word frequency, so
each merge round costs O(vocabulary), and the 100 TB corpus is touched
exactly once (the word-count shuffle).

Scale design:
- one corpus-wide shuffle builds (word, freq); every training round
  then shuffles only the vocabulary-sized symbol table.
- pair extraction and merge application are higher-order array
  expressions (transform / aggregate folds) — JVM-evaluated, no Python
  worker in the loop.
- the per-round argmax is a deterministic 1-row collect
  (count desc, pair asc tiebreak) — the only driver round-trip.
- each round persists the new symbol table and unpersists the old one;
  for merge counts in the hundreds, localCheckpoint every ~16 rounds
  would bound expression-tree depth (documented, not needed at the
  round counts the gates use).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from strawboat_spark.functions.text import tokens


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-wide shuffle."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs() -> Column:
    """array<struct<left,right>> of adjacent symbol pairs of the
    `__sym` column (JVM-side; transform lambdas can't capture an outer
    array column by Column object, so the name is fixed)."""
    return F.expr(
        "transform(slice(__sym, 1, size(__sym) - 1), "
        "(s, i) -> struct(s AS left, element_at(__sym, i + 2) AS right))"
    )


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — an aggregate() fold, JVM-evaluated. Overlaps resolve
    left-first, matching the reference BPE behavior ('aaa' + (a,a)
    -> ['aa', 'a'])."""
    l_lit, r_lit = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l_lit) & (s == r_lit),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def chars_of(word: Column) -> Column:
    """Initial symbol sequence: the word's characters."""
    return F.filter(F.split(word, ""), lambda c: c != "")


def train_bpe(wc: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Learn n_merges merge rules from a (word, freq) table.

    Returns the ordered merge list. Deterministic: ties on pair count
    break on (left, right) ascending."""
    # r17 opt: ONE distributed job per round instead of two.  The
    # pair-count argmax is the round's only action; it also materializes
    # the (lazily) persisted symbol table it reads, so the former
    # dedicated `nxt.count()` job is gone — and the PREVIOUS round's
    # cache is unpersisted only after its child materialized, so no
    # fold lineage ever recomputes.  The final round's merge is never
    # applied at all (its result was never read).  Per-round cost is
    # halved; semantics (deterministic argmax, greedy left-first merge)
    # are unchanged.
    sym = wc.select(chars_of(F.col("word")).alias("__sym"), "freq").persist()
    merges: list[tuple[str, str]] = []
    prev: DataFrame | None = None
    try:
        for i in range(n_merges):
            best = (
                sym.select(F.explode(_adjacent_pairs()).alias("p"), "freq")
                .groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), "left", "right")
                .limit(1)
                .collect()
            )
            # sym is materialized now; its parent cache can go
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best or best[0]["n"] <= 0:
                break
            left, right = best[0]["left"], best[0]["right"]
            merges.append((left, right))
            if i == n_merges - 1:
                break  # last merge learned: applying it is dead work
            nxt = sym.select(
                _merge_fold(F.col("__sym"), left, right).alias("__sym"), "freq"
            ).persist()
            prev, sym = sym, nxt
    finally:
        sym.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def encode_bpe(df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """(id, n_tokens, roundtrip_ok): encode each document with the
    learned merges and verify losslessness (symbols re-concatenate to
    the original words). Pure array algebra — no shuffle at all; the
    merge list rides into the plan as literals."""
    words = F.filter(tokens(text_col), lambda w: w != "")

    def _encode_word(w: Column) -> Column:
        s = chars_of(w)
        for left, right in merges:
            s = _merge_fold(s, left, right)
        return F.struct(
            F.size(s).alias("n"), (F.concat_ws("", s) == w).alias("ok")
        )

    enc = F.transform(words, _encode_word)
    return df.select(
        id_col,
        F.aggregate(enc, F.lit(0), lambda acc, e: acc + e["n"]).alias("n_tokens"),
        F.aggregate(enc, F.lit(True), lambda acc, e: acc & e["ok"]).alias(
            "roundtrip_ok"
        ),
        F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")).alias(
            "n_chars"
        ),
    )


def encode_bpe_pandas(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Arrow-batched twin of encode_bpe for PRODUCTION merge counts:
    the fold form compiles one nested aggregate per merge (fine at the
    tens-of-merges the gates use; a 32k-merge vocabulary would blow up
    the expression tree), while this applies the merge list with a
    rank dict per batch — same greedy left-first semantics, verified
    by a parity test. Output schema matches encode_bpe."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str) -> list[str]:
        sym = list(word)
        # repeatedly apply the lowest-rank applicable merge (Sennrich's
        # reference order: merge priority = learning order)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pair = (sym[best_i], sym[best_i + 1])
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    @pandas_udf("struct<n_tokens: int, roundtrip_ok: boolean, n_chars: int>")
    def encode(texts: pd.Series) -> pd.DataFrame:
        n_toks, oks, n_chars = [], [], []
        for t in texts:
            words = (t or "").lower().strip().split()
            total, ok, chars = 0, True, 0
            for w in words:
                sym = _encode_word(w)
                total += len(sym)
                ok = ok and ("".join(sym) == w)
                chars += len(w)
            n_toks.append(total)
            oks.append(ok)
            n_chars.append(chars)
        return pd.DataFrame({"n_tokens": n_toks, "roundtrip_ok": oks, "n_chars": n_chars})

    e = df.select(F.col(id_col), encode(F.col(text_col)).alias("e"))
    return e.select(id_col, "e.n_tokens", "e.roundtrip_ok", "e.n_chars")
