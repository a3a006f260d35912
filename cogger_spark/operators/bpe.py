"""Distributed BPE tokenizer training over the documents table.

The classic scale trick: corpus-scale work happens ONCE (count distinct
words), and the merge rounds iterate over the WEIGHTED VOCABULARY — at 10^12
documents the distinct-word table is millions of rows, not trillions, so
each merge round is a small explode + hash aggregate + top-1, and the merge
application is one Arrow-batched kernel pass over the vocab.

Semantics (pinned by a pure-Python reference implementation in tests):
* words = whitespace tokens; initial symbols = characters;
* each round counts adjacent symbol pairs weighted by word frequency,
  picks the most frequent pair (ties: lexicographically smallest "a b"),
  and merges it left-to-right non-overlapping in every word;
* training stops after n_merges rounds or when no pair repeats.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, StringType


def _chars(col):
    """Word → character array, JVM-side."""
    return F.transform(F.sequence(F.lit(1), F.length(col)),
                       lambda i: F.substring(col, i, 1))


def _pairs(syms):
    return F.zip_with(F.slice(syms, 1, F.size(syms) - 1),
                      F.slice(syms, 2, F.size(syms) - 1),
                      lambda a, b: F.concat_ws(" ", a, b))


def merge_pair_udf(a: str, b: str):
    """Merge every left-to-right non-overlapping adjacent (a, b) into a+b."""
    @F.pandas_udf(ArrayType(StringType()))
    def _merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            res = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)
    return _merge


def word_vocab(docs: DataFrame) -> DataFrame:
    """(word, cnt, syms): the weighted vocabulary the merge rounds iterate
    on. One corpus-scale explode + hash aggregate (map-side partials)."""
    toks = F.split(F.col("text"), " ")
    return (docs.select(F.explode(toks).alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("syms", _chars(F.col("word"))))


def bpe_train(docs: DataFrame, n_merges: int = 30,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges. Each round: weighted pair counts over
    the vocab (explode + agg), deterministic top-1 to the driver (1 row),
    merge applied vocab-side; lineage cut per round. Returns the ordered
    merge list [(a, b), ...]."""
    vocab = word_vocab(docs).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (vocab.select(F.explode(_pairs(F.col("syms"))).alias("pair"),
                            F.col("cnt"))
               .groupBy("pair").agg(F.sum("cnt").alias("n"))
               .orderBy(F.col("n").desc(), F.col("pair").asc())
               .limit(1).collect())
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        vocab = (vocab.withColumn("syms", merge_pair_udf(a, b)("syms"))
                 .localCheckpoint())
    return merges


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list: (doc_id, n_words, n_bpe_tokens) with the
    REAL token count (replaces the ceil(len/4) proxy when a trained
    tokenizer exists). Distinct words are segmented once and joined back —
    corpus text is never re-scanned per merge."""
    ranks = {f"{a} {b}": i for i, (a, b) in enumerate(merges)}

    @F.pandas_udf("int")
    def _n_syms(words: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for w in words:
            n = cache.get(w)
            if n is None:
                s = list(w)
                while len(s) > 1:
                    best, best_rank = None, None
                    for i in range(len(s) - 1):
                        r = ranks.get(s[i] + " " + s[i + 1])
                        if r is not None and (best_rank is None or r < best_rank):
                            best, best_rank = i, r
                    if best is None:
                        break
                    a, b = merges[best_rank]
                    res, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                n = len(s)
                cache[w] = n
            out.append(n)
        return pd.Series(out)

    toks = F.split(F.col("text"), " ")
    exploded = (docs.select("doc_id", F.explode(toks).alias("word"))
                .filter(F.length("word") > 0))
    per_word = exploded.withColumn("n_syms", _n_syms("word"))
    return (per_word.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
            .withColumn("n_words", F.col("n_words").cast("long")))
