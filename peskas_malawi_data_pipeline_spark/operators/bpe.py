"""BPE vocabulary induction (Sennrich et al. 2016) at corpus scale.

The reference pipeline has no tokenizer-training stage; a training-data
engine needs one. The structure that makes BPE tractable at 100 TB is that
after ONE distributed pass (word counts), every merge round operates on
the weighted VOCABULARY — orders of magnitude smaller than the corpus —
so the iterative part is k cheap aggregations over a frame that keeps
shrinking in symbol count, never a corpus rescan.

Symbols are encoded as a marker-prefixed space-joined string
(``\\x1f`` + symbol, joined by single spaces): the marker makes the merge
a plain non-overlapping left-to-right string ``replace`` — exactly the
textbook greedy merge — with no lookaround regex (which RE2-based oracle
engines lack) and no false suffix matches (``xa b`` can never match the
pattern for ``a b`` because markers only occur at symbol starts). Marker
characters are stripped from input words first, so adversarial input
cannot forge symbol boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.barrier import materialize
from ..functions import text as T

MARKER = "\x1f"


def _sym_expr(word_col):
    """Marker-encoded symbolization of a word column — THE shared
    encoding: fit and encode must agree byte-for-byte or learned merges
    silently stop matching (n_subwords would degrade to char counts with
    no error), so both build it here."""
    clean = F.regexp_replace(word_col, MARKER, "")
    chars = F.filter(F.split(clean, "(?!^)"), lambda c: c != "")
    return F.concat_ws(" ", F.transform(
        chars, lambda c: F.concat(F.lit(MARKER), c)))


def _symbolized_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Weighted vocabulary with each word as a marker-encoded symbol
    string: ``(syms, cnt)``. The ONLY corpus-scale step."""
    words = (df.select(F.explode(T.tokens(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    return (words.select(_sym_expr(F.col("w")).alias("syms"), "cnt")
            .filter(F.length("syms") > 0))


def bpe_fit(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus: per round, count
    adjacent symbol pairs weighted by word frequency, take the most
    frequent (ties broken by pair string — fully deterministic), rewrite
    the vocabulary with the merged symbol, repeat. Returns
    ``(merge_rank, pair, new_symbol, pair_count)`` — markers stripped.

    Plan: one corpus shuffle (word counts), then per round one
    vocabulary-sized pair aggregation + a 1-row argmax collected to the
    driver (the collected row IS the result being learned) + one pure-map
    rewrite. Each round's vocabulary is re-materialized so the k-deep
    rewrite chain never re-executes upstream rounds."""
    spark = df.sparkSession
    vocab = materialize(_symbolized_vocab(df, text_col))
    t = F.split(F.col("syms"), " ")
    # sequence(1, 0) counts DOWN in Spark, so single-symbol words need an
    # explicit empty-pairs branch, not a clamped upper bound
    pair_list = T.bound(t, lambda s: F.when(
        F.size(s) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat(F.get(s, i - 1), F.lit(" "), F.get(s, i))))
        .otherwise(F.array().cast("array<string>")))
    merges = []
    for rank in range(1, k + 1):
        top = (vocab.select(F.explode(pair_list).alias("pair"), "cnt")
               .groupBy("pair").agg(F.sum("cnt").alias("n"))
               .orderBy(F.desc("n"), "pair").limit(1).collect())
        if not top:
            break
        pair, n = top[0].pair, top[0].n
        new_sym = pair.replace(" " + MARKER, "")
        merges.append((rank, pair.replace(MARKER, ""),
                       new_sym.replace(MARKER, ""), int(n)))
        vocab = materialize(vocab.withColumn(
            "syms", F.replace(F.col("syms"), F.lit(pair), F.lit(new_sym))))
    return spark.createDataFrame(
        merges,
        "merge_rank long, pair string, new_symbol string, pair_count long")


def bpe_apply_counts(df: DataFrame, merges, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Apply learned merges to the corpus and count subwords per document
    — the ENCODE side of BPE, and the real token-budget number a packing/
    mixing stage needs (whitespace counts over-estimate once a subword
    vocab exists). ``merges`` is the (pair, new_symbol) sequence from
    :func:`bpe_fit` (display form, no markers).

    Plan: the merge chain runs over the DISTINCT-WORD table, not the
    corpus — k chained literal replaces on a vocabulary-sized frame —
    and the corpus is touched by one explode + one join against that
    (word → subword-count) map (broadcast when the vocabulary is small,
    plain shuffle join otherwise) + one per-doc aggregation. Words
    emptied by marker sanitization drop out of both sides identically."""
    words = (df.select(F.explode(T.tokens(F.col(text_col))).alias("w"))
             .distinct())
    enc = words.select("w", _sym_expr(F.col("w")).alias("syms")) \
        .filter(F.length("syms") > 0)
    col = F.col("syms")
    for pair, new_symbol in merges:
        a, b = pair.split(" ", 1)
        col = F.replace(col, F.lit(f"{MARKER}{a} {MARKER}{b}"),
                        F.lit(f"{MARKER}{new_symbol}"))
    wl = enc.select("w", F.size(F.split(col, " ")).cast("long")
                    .alias("n_sub"))
    tok = df.select(F.col(id_col), F.explode(T.tokens(F.col(text_col)))
                    .alias("w"))
    return (tok.join(wl, "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_sub").cast("long").alias("n_subwords")))
