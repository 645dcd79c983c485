"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — all as DataFrame expressions over md5-based
32-bit hashes (functions.text.hash32_md5), which makes every signature
bit-identical in any engine with md5 and therefore oracle-checkable.

Scale notes (100 TB):
- exact dedup shuffles on a 16-byte digest — narrow key, near-uniform
  distribution, no skew;
- MinHash-LSH's only wide operation is the band-bucket self-join; band keys
  are hashes (uniform), and the candidate-pair explosion is bounded by
  bucket size — cap monster buckets (boilerplate docs) with ``max_bucket``;
- SimHash is a pure map (one pass, no shuffle) producing a 64-bit sketch;
  near-dup lookup is a self-join on rotated prefixes (not implemented here;
  signature generation is the per-row operator);
- n-gram Jaccard is the *verify* stage run only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep: str = "min") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one survivor per
    fingerprint, deterministically the smallest (or largest) id.

    groupBy on the digest + broadcast-free semi-join-by-window; a single
    shuffle on the fingerprint. ``dropDuplicates`` would be nondeterministic
    about which row survives — training-data pipelines want stable output.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    fp = df.withColumn("__fp", T.fingerprint(F.col(text_col)))
    survivors = fp.groupBy("__fp").agg(agg.alias(id_col)).select(id_col)
    return df.join(survivors, id_col, "left_semi")


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: array of ``num_hashes`` minima of seeded
    32-bit shingle hashes. Pure map — higher-order functions over the
    shingle array, no explode, no shuffle.
    """
    sh = T.word_shingles(F.col(text_col), shingle_n)

    # NB: PySpark HOF lambdas must declare exactly the HOF's arity (extra
    # default args make pyspark pass the element *index* into them).
    def hasher(seed: int):
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"mh{seed}:"), s)), 1, 8),
            16, 10).cast("long")

    sig = F.array(*[F.array_min(F.transform(sh, hasher(i)))
                    for i in range(num_hashes)])
    return df.withColumn("minhash", sig)


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 8,
                      band_size: int = 2, shingle_n: int = 3,
                      max_bucket: int | None = 1000) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs: band the signature, self-join
    on (band index, band key), emit distinct (id_a < id_b) pairs.

    The self-join shuffles both sides on the band key (uniform hash values →
    no skew); ``max_bucket`` drops pathological buckets before the join so a
    degenerate shingle (empty docs) cannot produce an O(n²) bucket.
    """
    assert num_hashes % band_size == 0
    sigs = minhash_signature(df.select(id_col, text_col), text_col,
                             num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    bands = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col("minhash")[b * band_size + r].cast("string")
                               for r in range(band_size)])
            for b in range(n_bands)
        ])).alias("band_id", "band_key"),
    )
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key")
        bands = (bands.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
                 .filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n"))
    left = bands.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_a"))
    right = bands.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_b"))
    pairs = (left.join(right, ["band_id", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    return pairs


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash sketch over word tokens: each token hashes to ``bits``
    bits (md5-derived); each bit position accumulates +1/−1 across distinct
    tokens; the sign vector packs into one integer. Pure map, no shuffle.
    """
    # Hash each distinct token once, then take 16 bit-votes over the hash
    # array — not one md5 per (token, bit).
    hashes = F.transform(
        F.array_distinct(T.tokens(F.col(text_col))),
        lambda t: F.conv(F.substring(F.md5(F.concat(F.lit("sh:"), t)), 1, 8), 16, 10).cast("long"))
    tmp = df.withColumn("__th", hashes)

    def voter(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(1) == 1, F.lit(1)).otherwise(F.lit(-1))

    value = None
    for b in range(bits):
        vote = F.aggregate(F.col("__th"), F.lit(0), voter(b))
        bit = F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        value = bit if value is None else value + bit
    return tmp.withColumn("simhash", value.cast("long")).drop("__th")


def jaccard_pairs(df: DataFrame, block_col: str, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs within a blocking key
    (e.g. MinHash band bucket, source, or length band): shuffle both sides on
    the block key, join, compute |∩|/|∪| of distinct shingle sets with
    array_intersect/array_union — JVM-side set ops, no UDF.
    """
    sh = df.select(
        F.col(block_col).alias("__block"),
        F.col(id_col).alias("id_a"),
        T.word_shingles(F.col(text_col), shingle_n).alias("sh_a"),
    )
    other = sh.select(F.col("__block"), F.col("id_a").alias("id_b"),
                      F.col("sh_a").alias("sh_b"))
    pairs = sh.join(other, "__block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (pairs.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             block_col: str | None = None,
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key (or LSH
    bucket from similarity.hyperplane_lsh_buckets). Cosine is computed with
    higher-order functions (zip_with dot product) — JVM-side, no UDF.
    """
    from .similarity import cosine_similarity

    base = df.select(
        *( [F.col(block_col).alias("__block")] if block_col else [F.lit(1).alias("__block")] ),
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    other = base.select(F.col("__block"), F.col("id_a").alias("id_b"),
                        F.col("v_a").alias("v_b"))
    pairs = base.join(other, "__block").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity(F.col("v_a"), F.col("v_b"))
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))
