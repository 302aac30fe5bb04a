"""Byte-pair-encoding tokenizer training and application at corpus scale.

Beyond-reference operator (driver north star): training a BPE vocabulary is
a standard early stage of an LLM data pipeline (Sennrich et al. 2016;
GPT-2's byte-level variant). The classic algorithm is a merge loop over the
WORD-TYPE frequency table, not the raw corpus — which gives the natural
Spark split:

- **Corpus-scale** (distributed): one word-count aggregation — the only
  pass whose cost grows with corpus size. The type table is Zipf-bounded
  (a few million types for any natural-language corpus) and further capped
  by ``max_types``/``min_count`` before it reaches the driver.
- **Driver-scale** (bounded): the merge loop over the capped type table —
  pure Python over at most ``max_types`` entries, the same shape every
  production tokenizer trainer uses (HuggingFace tokenizers, SentencePiece
  both train on a word-frequency table).
- **Corpus-scale again** (map-side): applying the trained merges
  (`bpe_encode`) streams through Arrow batches with a per-batch
  word -> tokens memo — no shuffle; Zipf makes the memo hit rate high.

``bpe_pair_counts`` exposes the FIRST merge step (adjacent character-pair
counting) as a pure DataFrame aggregation — the SQL-expressible surrogate
the cross-engine gate checks, exactly the distributed stage a fully
shuffle-parallel trainer would iterate.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import let_expr, tokens_expr

END_OF_WORD = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Distributed word-type frequency table: (word, cnt). One explode +
    one hash aggregate (map-side partial combine collapses the token
    stream)."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    return (
        df.select(F.explode(tokens_expr(text)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def char_pairs_expr(word: Column) -> Column:
    """Adjacent character pairs of a word as 'a b' strings (let-bound so an
    expression-valued input is evaluated once, not per index)."""

    def _pairs(w: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(w) - 1)
        return F.when(
            F.length(w) >= 2,
            F.transform(
                idx,
                lambda i: F.concat(
                    F.substring(w, i, 1), F.lit(" "), F.substring(w, i + 1, 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let_expr(word, _pairs)


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide adjacent character-pair counts — the first BPE merge
    step as a pure DataFrame aggregation: word-count first (so the pair
    explode runs over TYPES weighted by frequency, not raw tokens — the
    Zipf trick that makes iterated merging tractable), then pair explode +
    weighted sum. Returns (pair, cnt) with cnt >= min_count."""
    wc = word_counts(df, text_col, lowercase)
    pairs = wc.select(
        "cnt", F.explode(char_pairs_expr(F.col("word"))).alias("pair")
    )
    out = pairs.groupBy("pair").agg(F.sum("cnt").alias("cnt"))
    return out.filter(F.col("cnt") >= min_count)


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    n = len(symbols)
    a, b = pair
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _pair_stats(types: dict[tuple[str, ...], int]) -> Counter:
    stats: Counter = Counter()
    for symbols, cnt in types.items():
        for i in range(len(symbols) - 1):
            stats[(symbols[i], symbols[i + 1])] += cnt
    return stats


def bpe_train(
    df: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 2,
    max_types: int = 1_000_000,
    end_of_word: str = END_OF_WORD,
) -> list[tuple[str, str]]:
    """Train a BPE merge table (Sennrich et al. 2016): the word-type table
    is aggregated distributed (capped at the ``max_types`` most frequent
    types, ties broken lexicographically, so the collect is bounded), then
    the merge loop runs driver-side over that table. Each word ends with
    ``end_of_word`` so merges can capture suffixes. Deterministic: merge
    ties break on the lexicographically smallest pair.

    Returns the ordered merge list [(left, right), ...] — rank = index —
    to feed :func:`bpe_encode`.
    """
    wc = (
        word_counts(df, text_col, lowercase)
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), "word")
        .limit(max_types)
        .collect()
    )
    types: dict[tuple[str, ...], int] = {}
    for r in wc:
        types[(*r["word"], end_of_word)] = r["cnt"]

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(types)
        if not stats:
            break
        best_cnt = max(stats.values())
        best = min(p for p, c in stats.items() if c == best_cnt)
        merges.append(best)
        types = {
            _merge_word(sym, best): cnt for sym, cnt in types.items()
        }
    return merges


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str = END_OF_WORD,
) -> list[str]:
    """Apply ranked merges to one word (lowest-rank mergeable pair first —
    the standard greedy BPE application)."""
    symbols = [*word, end_of_word]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Tokenize documents with a trained merge table: map-side Arrow pass,
    per-batch word -> tokens memo (Zipf makes the hit rate high), no
    shuffle. Returns (id, tokens array<string>, n_bpe_tokens)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out = []
            counts = []
            for text in pdf[text_col]:
                t = (text or "")
                if lowercase:
                    t = t.lower()
                toks: list[str] = []
                for w in t.split():
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, ranks, end_of_word)
                        memo[w] = got
                    toks.extend(got)
                toks_out.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "tokens": toks_out,
                    "n_bpe_tokens": counts,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        encode,
        schema=f"{id_col} {id_type}, tokens array<string>, "
        "n_bpe_tokens long",
    )
