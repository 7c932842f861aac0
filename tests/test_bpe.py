"""BPE trainer/encoder (operators/bpe.py): hand-checked merge order,
greedy overlap resolution, lossless encoding, degenerate corpora, and
the all-JVM encode plan."""

import collections

import pyspark.sql.functions as F

from strawboat_spark.operators.bpe import encode_bpe, train_bpe, word_counts


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _reference_bpe(corpus: dict[str, int], n_merges: int):
    """Plain-python Sennrich-style reference implementation."""
    vocab = {tuple(w): f for w, f in corpus.items()}
    merges = []
    for _ in range(n_merges):
        cnt = collections.Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                cnt[(a, b)] += f
        if not cnt:
            break
        (l, r), _n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((l, r))
        new_vocab = {}
        for sym, f in vocab.items():
            out = []
            for s in sym:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_merge_sequence_matches_reference(spark):
    texts = ["low low low lower lowest", "new newer newest low", "wider wide new"]
    corpus = collections.Counter(w for t in texts for w in t.split())
    expected = _reference_bpe(dict(corpus), 6)
    got = train_bpe(word_counts(_df(spark, texts), "text"), 6)
    assert got == expected, (got, expected)


def test_overlapping_pairs_merge_left_first(spark):
    # 'aaaa' + merge (a,a) must give [aa, aa]; 'aaa' gives [aa, a]
    df = _df(spark, ["aaaa aaa"])
    enc = encode_bpe(df, "doc_id", "text", [("a", "a")]).collect()[0]
    assert enc.n_tokens == 2 + 2  # [aa,aa] + [aa,a]
    assert enc.roundtrip_ok


def test_zero_merges_token_count_is_char_count(spark):
    df = _df(spark, ["spark engine", "x"])
    rows = encode_bpe(df, "doc_id", "text", []).orderBy("doc_id").collect()
    assert [r.n_tokens for r in rows] == [11, 1]
    assert [r.n_chars for r in rows] == [11, 1]
    assert all(r.roundtrip_ok for r in rows)


def test_training_stops_on_exhausted_corpus(spark):
    # single-char words have no adjacent pairs: zero merges learnable
    assert train_bpe(word_counts(_df(spark, ["a b c a"]), "text"), 5) == []


def test_encode_plan_is_all_jvm(spark):
    df = _df(spark, ["low lower", "newest low"])
    merges = [("l", "o"), ("lo", "w"), ("e", "s")]
    enc = encode_bpe(df, "doc_id", "text", merges)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0
    assert "Exchange" not in plan  # encoding is narrow: zero shuffles


def test_pandas_encoder_matches_fold_encoder(spark):
    """The Arrow-batched production encoder and the JVM fold encoder
    must agree exactly — including on texts where merge ORDER matters
    (a later merge consuming the output of an earlier one)."""
    from strawboat_spark.operators.bpe import encode_bpe_pandas

    texts = ["low lower lowest", "newest low wide", "aaaa aaa a",
             "spark engine strawboat", ""]
    df = _df(spark, texts)
    merges = train_bpe(word_counts(df, "text"), 8)
    fold = {r.doc_id: (r.n_tokens, r.roundtrip_ok, r.n_chars)
            for r in encode_bpe(df, "doc_id", "text", merges).collect()}
    arrow = {r.doc_id: (r.n_tokens, r.roundtrip_ok, r.n_chars)
             for r in encode_bpe_pandas(df, "doc_id", "text", merges).collect()}
    assert fold == arrow, (fold, arrow)
