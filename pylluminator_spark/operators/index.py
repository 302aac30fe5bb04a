"""Inverted index construction: token -> positional posting lists.

Beyond-reference operator (driver north star): the retrieval side of a
corpus pipeline (BM25 serving, phrase search, contamination lookups)
needs token -> [(doc, [positions])] postings. The plan is explode +
two-level aggregation, all built-ins:

1. ``posexplode`` the token stream (position = 0-based token offset);
2. per (token, doc): ``sort_array(collect_list(pos))`` — bounded by the
   document length;
3. per token: postings = ``sort_array(collect_list(struct(doc,
   positions)))`` plus doc/collection frequencies.

Skew: stopword-grade tokens concentrate mass; ``max_df`` drops tokens
appearing in more than that fraction of documents BEFORE the final
collect (the standard IR cap), so no single posting list explodes. The
document count for the cap is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_positions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = r"\s+",
) -> DataFrame:
    """(doc, token, pos) stream — posexplode of the split, 0-based."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), pattern)).alias(
            "pos", "token"
        ),
    ).where(F.length("token") > 0)


def build_inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = r"\s+",
    max_df: float | None = None,
) -> DataFrame:
    """The index: (token, n_docs, n_occurrences, postings) where postings
    is a doc-sorted array of (doc, positions). ``max_df`` (0, 1] drops
    tokens whose document frequency exceeds that fraction of the corpus."""
    toks = tokenize_positions(
        docs, id_col=id_col, text_col=text_col, pattern=pattern
    )
    per_doc = toks.groupBy("token", "doc").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count(F.lit(1)).alias("_tf"),
    )
    idx = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tf").alias("n_occurrences"),
        F.sort_array(
            F.collect_list(F.struct("doc", "positions"))
        ).alias("postings"),
    )
    if max_df is not None:
        n_total = docs.select(id_col).distinct().count()
        idx = idx.where(F.col("n_docs") <= int(max_df * n_total))
    return idx


def phrase_search(
    index: DataFrame, phrase_tokens: list[str]
) -> DataFrame:
    """Documents containing the exact token phrase, via positional
    intersection of the phrase tokens' posting lists: join the postings
    (the phrase's tokens only — a handful of index rows), then check that
    token i+1 occurs at position p+1 for some chain. Returns (doc,
    n_matches)."""
    if not phrase_tokens:
        raise ValueError("phrase_search: empty phrase")
    first = (
        index.where(F.col("token") == phrase_tokens[0])
        .select(F.explode("postings").alias("p"))
        .select(
            F.col("p.doc").alias("doc"),
            F.explode("p.positions").alias("pos"),
        )
    )
    chain = first
    for i, tok in enumerate(phrase_tokens[1:], start=1):
        nxt = (
            index.where(F.col("token") == tok)
            .select(F.explode("postings").alias("p"))
            .select(
                F.col("p.doc").alias("doc"),
                F.explode("p.positions").alias("_np"),
            )
        )
        chain = chain.join(
            nxt.withColumn("pos", F.col("_np") - i).drop("_np"),
            ["doc", "pos"],
        )
    return chain.groupBy("doc").agg(F.count(F.lit(1)).alias("n_matches"))
