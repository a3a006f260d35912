"""Distributed BPE training vs a pure-Python reference implementation:
identical merge sequences and identical segmentation counts — the Spark
version's explode+agg+top-1 rounds reproduce classic BPE exactly."""

from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def ref_bpe_train(texts, n_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, cnt in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        maxn = max(pc.values())
        if maxn < min_pair_count:
            break
        best = min((p for p, n in pc.items() if n == maxn),
                   key=lambda p: p[0] + " " + p[1])
        merges.append(best)
        a, b = best
        for w in vocab:
            s = vocab[w]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            vocab[w] = res
    return merges


def ref_segment_count(text, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    total = 0
    for w in text.split(" "):
        if not w:
            continue
        s = list(w)
        while len(s) > 1:
            cands = [(ranks[(s[i], s[i + 1])], i) for i in range(len(s) - 1)
                     if (s[i], s[i + 1]) in ranks]
            if not cands:
                break
            r, _ = min(cands)
            a, b = merges[r]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            s = res
        total += len(s)
    return total


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bpe_train_matches_reference(spark, docs):
    from cogger_spark.operators.bpe import bpe_train
    texts = [r.text for r in docs.select("text").collect()]
    want = ref_bpe_train(texts, n_merges=15)
    got = bpe_train(docs, n_merges=15)
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_bpe_segment_matches_reference(spark, docs):
    from cogger_spark.operators.bpe import bpe_segment, bpe_train
    merges = bpe_train(docs, n_merges=15)
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_segment(docs, merges).collect()}
    for r in docs.select("doc_id", "text").limit(50).collect():
        n_words = len([w for w in r.text.split(" ") if w])
        assert got[r.doc_id] == (n_words, ref_segment_count(r.text, merges)), \
            r.doc_id


def test_bpe_merges_compress(spark, docs):
    """Merges must reduce token counts vs characters and never go below one
    token per word."""
    from cogger_spark.operators.bpe import bpe_segment, bpe_train
    import pyspark.sql.functions as F
    merges = bpe_train(docs, n_merges=15)
    seg = bpe_segment(docs, merges)
    row = seg.agg(F.sum("n_bpe_tokens").alias("bpe"),
                  F.sum("n_words").alias("w")).first()
    chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("c")).first()
    assert row["w"] <= row["bpe"] < chars["c"]
