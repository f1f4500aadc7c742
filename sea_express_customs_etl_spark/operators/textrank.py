"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
PageRank over the word co-occurrence graph — words that many other
well-connected words sit next to are the document collection's
keywords. Re-expressed on the engine's existing weighted-PageRank
trajectory (``operators/graph.py:pagerank_weighted`` — exact integer
micro-units, DECIMAL(38,0) products, unrolled-sweep oracle), so the
whole trained artifact is hash-checked, not just "looks plausible".

Beyond reference parity: the reference has no keyword layer; this
pairs with RAKE (``operators/rake.py``) as the graph-based member of
the keyword family (RAKE is frequency/degree heuristic, TextRank is
stationary-mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def word_cooccurrence_edges(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Adjacent-token co-occurrence edges (window = 2, the TextRank
    default) with corpus-wide counts as weights, both directions
    (PageRank wants a directed walk; undirected co-occurrence = both
    arcs). Tokenization matches the corpus-vocab convention
    (lower, trim, split on whitespace).

    The pair list is built MAP-SIDE with CODEGEN-ONLY expressions: the
    token array is staged as a named column, then
    ``arrays_zip(slice(arr, 1, n-1), slice(arr, 2, n-1))`` emits the
    adjacent-pair structs and a single explode unnests them — no
    token-grain self-join, and no interpreted higher-order lambda (a
    ``transform``-built pair list measured 10× slower over the same
    corpus: HOFs run the interpreter per element). ``slice`` is
    guarded by ``n >= 2``. Self-pairs ("the the") and empty tokens
    (only the degenerate empty-text row produces one) are dropped, as
    the oracle does. One partial-aggregated groupBy produces the
    weighted edge list.
    """
    toks = df.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_arr")
    )
    staged = toks.select(
        F.when(
            F.size("_arr") >= 2, F.expr("slice(_arr, 1, size(_arr) - 1)")
        )
        .otherwise(F.array())
        .alias("_a1"),
        F.when(
            F.size("_arr") >= 2, F.expr("slice(_arr, 2, size(_arr) - 1)")
        )
        .otherwise(F.array())
        .alias("_a2"),
    )
    pairs = (
        staged.select(F.explode(F.arrays_zip("_a1", "_a2")).alias("_p"))
        .select(F.col("_p._a1").alias("src"), F.col("_p._a2").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != ""))
    )
    both = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return both.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )


def textrank_keywords(
    df: DataFrame, text_col: str = "text", top_n: int = 20, iters: int = 3
) -> DataFrame:
    """Top-``top_n`` corpus keywords by TextRank stationary mass.
    Output: word, rank_u6 — ties broken by word; the final top-n is
    orderBy+limit (TakeOrderedAndProject, map-side partial top-k).

    Scale shape: edge building is map-side + one groupBy; each sweep
    is one edge⋈rank join + partial-aggregated groupBy on a
    VOCABULARY-grained frame (Heaps-law sublinear in corpus size) —
    the same plan the co-purchase weighted PageRank runs at part
    grain.
    """
    from ..plans.cache import tracked_persist
    from .graph import pagerank_weighted

    # pagerank_weighted scans its input three ways (out-weight sums,
    # the persisted edge⋈W frame, the rank init) — pin the edge list
    # so the corpus explode + groupBy runs ONCE, not per scan
    # (27.8 s → edge build once at sf0.1)
    edges = tracked_persist(word_cooccurrence_edges(df, text_col))
    ranks = pagerank_weighted(edges, iters)
    return (
        ranks.select(F.col("node").alias("word"), "rank_u6")
        .orderBy(F.desc("rank_u6"), "word")
        .limit(top_n)
    )
