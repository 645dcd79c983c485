"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — all as DataFrame expressions over md5-based
32-bit hashes (functions.text.md5_prefix_hash), which makes every signature
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

import itertools
import logging
from typing import Sequence

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..core.barrier import materialize
from ..functions import text as T

_CAP_LOG = logging.getLogger(__name__)
_CAP_SEQ = itertools.count()

# site -> {"dropped_rows", "total_rows", "cap"} for the most recent run of
# each capped candidate generator in this process (see last_cap_drops).
_LAST_CAP_DROPS: dict[str, dict] = {}


# site -> most recent pre-shuffle cost forecast (see last_cost_reports).
_LAST_COST_REPORTS: dict[str, dict] = {}


def last_cost_reports() -> dict[str, dict]:
    """Pre-shuffle cost-forecast audit — the sibling channel to
    :func:`last_cap_drops` for operators that stay EXACT rather than
    capping: for each forecasting operator that has run in this process,
    the most recent estimate (e.g. ``prefix_jaccard_pairs`` records
    ``{"est_candidate_pairs", "max_bucket", "budget"}``). An estimate
    over budget also logs a warning at forecast time naming the scale
    alternative; this accessor is for tests and monitoring glue."""
    return {k: dict(v) for k, v in _LAST_COST_REPORTS.items()}


def last_cap_drops() -> dict[str, dict]:
    """Cap-drop audit: for each capped candidate generator that has run in
    this process, the most recent ``{"dropped_rows": n, "total_rows": n,
    "cap": c}``. ``dropped_rows > 0`` means the hot-bucket / stop-shingle
    cap actually triggered, so the similarity the operator reported is a
    LOWER bound (pairs whose entire evidence sat in capped buckets were
    missed). A warning is also logged at trigger time; this accessor is
    for tests and monitoring glue."""
    return {k: dict(v) for k, v in _LAST_CAP_DROPS.items()}


def _capped_barrier(df: DataFrame, partition_cols: Sequence[str],
                    cap: int | None, site: str,
                    weight_col: str | None = None) -> DataFrame:
    """Materialize a derived index, dropping rows in over-``cap`` buckets
    of ``partition_cols`` — with the drop count OBSERVED, not silent.

    The bucket-size window runs INSIDE the barrier (once, upstream of the
    self-join that reads the index twice), and an :class:`Observation`
    attached upstream of the filter counts rows sitting in over-cap
    buckets. Because the barrier is eager, the metric resolves on the
    barrier's own job — zero extra Spark jobs for observability. The
    materialized index keeps hot-bucket rows (filtered after the barrier,
    from materialized blocks); index storage is O(corpus bands) either
    way, so this trades nothing for the audit.

    ``weight_col``: bucket size as Σ weight instead of a row count — how
    a COMPACTED index row standing for a whole historical bucket
    (:func:`compact_band_index`) keeps the cap triggering at exactly the
    original cardinality.
    """
    if cap is None:
        return _index_barrier(df)
    w = Window.partitionBy(*partition_cols)
    size = (F.sum(F.col(weight_col)).over(w) if weight_col
            else F.count(F.lit(1)).over(w))
    flagged = df.withColumn("__bucket_n", size)
    obs = Observation(f"cap:{site}:{next(_CAP_SEQ)}")
    flagged = flagged.observe(
        obs,
        F.sum((F.col("__bucket_n") > cap).cast("long")).alias("dropped_rows"),
        F.count(F.lit(1)).alias("total_rows"))
    out = materialize(flagged)
    m = dict(obs.get)
    m = {"dropped_rows": int(m["dropped_rows"] or 0),
         "total_rows": int(m["total_rows"] or 0), "cap": cap}
    _LAST_CAP_DROPS[site] = m
    if m["dropped_rows"]:
        _CAP_LOG.warning(
            "%s: hot-bucket cap (%d) dropped %d of %d index rows — reported "
            "similarity is a lower bound for pairs in the capped buckets",
            site, cap, m["dropped_rows"], m["total_rows"])
    return out.filter(F.col("__bucket_n") <= cap).drop("__bucket_n")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep: str = "min") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one survivor per
    fingerprint, deterministically the smallest (or largest) id.

    groupBy on the digest + broadcast-free semi-join-by-window; a single
    shuffle on the fingerprint. ``dropDuplicates`` would be nondeterministic
    about which row survives — training-data pipelines want stable output.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    # NULL text means MISSING content, not identical content: such rows
    # must all pass through, not collapse into one "duplicate" group (the
    # fingerprint of NULL is NULL, and groupBy would make them one group)
    fp = (df.filter(F.col(text_col).isNotNull())
          .withColumn("__fp", T.fingerprint(F.col(text_col))))
    survivors = fp.groupBy("__fp").agg(agg.alias(id_col)).select(id_col)
    return (df.join(survivors, id_col, "left_semi")
            .unionByName(df.filter(F.col(text_col).isNull())))


# Universal-hash permutation constants: sig_i = min((A_i·h + B_i) mod P) over
# shingle hashes h. P is the smallest prime > 2^32; A_i < 2^30 keeps A·h+B
# inside int64 (h < 2^32 ⇒ product < 2^62). Fixed literals so the DuckDB
# oracle computes bit-identical signatures with plain integer arithmetic.
MINHASH_P = 4294967311
MINHASH_A = [387420489, 268435399, 536870909, 178956971,
             299999977, 479001599, 104395301, 217645177,
             370248451, 492366587, 413158511, 316272553,
             282475249, 200560490, 132049011, 500000003]
MINHASH_B = [98765431, 12345701, 87654323, 10000019,
             55555333, 31415927, 27182821, 161803399,
             77777677, 43112609, 94906249, 68718821,
             25964951, 30402457, 20996011, 85625159]


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: array of ``num_hashes`` minima of permuted
    32-bit shingle hashes. Pure map — no explode, no shuffle.

    Cost shape: md5 runs ONCE per shingle (the expensive part); the
    ``num_hashes`` permutations are integer multiply-add-mod applied inside a
    single fold over the hash array, so the per-row work is
    O(shingles · num_hashes) cheap int ops + O(shingles) hashes.
    """
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes > {len(MINHASH_A)} not supported")
    hashes = F.transform(T.word_shingles(F.col(text_col), shingle_n),
                         lambda s: T.md5_prefix_hash(s, "mh:"))
    a_arr = F.array(*[F.lit(a) for a in MINHASH_A[:num_hashes]])
    b_arr = F.array(*[F.lit(b) for b in MINHASH_B[:num_hashes]])
    p = F.lit(MINHASH_P)
    # Single aggregate fold: the hash array materializes once per row, then
    # each element updates all num_hashes running minima.
    sig = F.aggregate(
        hashes,
        F.array_repeat(p.cast("long"), num_hashes),
        lambda acc, h: F.transform(
            acc, lambda cur, i: F.least(cur, (h * F.get(a_arr, i) + F.get(b_arr, i)) % p)),
    )
    return df.withColumn("minhash", sig)


def _index_barrier(df: DataFrame) -> DataFrame:
    """Materialize a (small) derived index before a self-join.

    Catalyst does NOT reuse the exchange between the two sides of a
    self-join built from separately-aliased projections, so the full
    upstream pipeline (regex tokenize → shingle → hash) would run twice —
    measured 2× the whole query cost for the LSH operators. The banded /
    posting index is orders of magnitude smaller than the corpus (ids +
    band keys, no text), so an eager materialization is the scale-correct
    barrier: no driver collect, lineage truncated (local blocks, or the
    reliable checkpoint store when the session configures one —
    core.barrier).
    """
    return materialize(df)


def minhash_bands(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", num_hashes: int = 8,
                  band_size: int = 2, shingle_n: int = 3) -> DataFrame:
    """The banded MinHash signature index: (id, band_id, band_key) rows,
    ``num_hashes/band_size`` per doc. This is the PERSISTABLE artifact of
    LSH dedup — write it once per corpus snapshot and new batches join
    against it (:func:`incremental_lsh_pairs`) instead of re-sketching the
    whole corpus."""
    assert num_hashes % band_size == 0
    sigs = minhash_signature(df.select(id_col, text_col), text_col,
                             num_hashes, shingle_n)
    return bands_from_signature(sigs, id_col, num_hashes, band_size)


def bands_from_signature(sigs: DataFrame, id_col: str = "doc_id",
                         num_hashes: int = 8,
                         band_size: int = 2) -> DataFrame:
    """Band an ALREADY-computed :func:`minhash_signature` frame — the
    banding is a pure projection, so a consumer comparing several
    (band_size, n_bands) points (lsh_quality_sweep) materializes the
    signature once and re-bands it per arm instead of re-running the
    shingle → md5 → permute sketch map per arm (the sketch is the whole
    corpus-scale cost; r14)."""
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    return sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col("minhash")[b * band_size + r].cast("string")
                               for r in range(band_size)])
            for b in range(n_bands)
        ])).alias("band_id", "band_key"))


def incremental_lsh_pairs(new_bands: DataFrame, index_bands: DataFrame,
                          id_col: str = "doc_id",
                          max_bucket: int | None = 1000,
                          weight_col: str | None = None) -> DataFrame:
    """Candidate pairs for an INCREMENTAL batch against a persisted band
    index: every pair touches at least one new doc (new↔index and
    new↔new); settled index↔index pairs are never recomputed.

    This is the daily-run shape at 100 TB: the corpus sketch is computed
    once and persisted (:func:`minhash_bands`), each increment sketches
    only its own docs and band-joins the union — cost O(increment), not
    O(corpus). ``max_bucket`` caps hot buckets over the union, so the
    result equals a full-corpus run restricted to pairs involving new
    docs.

    ``weight_col``: set when ``index_bands`` is a COMPACTED index
    (:func:`compact_band_index`) whose rows carry a bucket-cardinality
    weight — the cap then counts Σ weight, so compaction never changes
    which buckets the cap suppresses. New-batch rows weigh 1; an index
    without the column gets weight 1 per row (uncompacted)."""
    if weight_col is not None:
        if weight_col not in index_bands.columns:
            index_bands = index_bands.withColumn(
                weight_col, F.lit(1).cast("long"))
        new_bands = new_bands.withColumn(weight_col, F.lit(1).cast("long"))
    u = (index_bands.withColumn("__new", F.lit(0))
         .unionByName(new_bands.withColumn("__new", F.lit(1))))
    u = _capped_barrier(u, ("band_id", "band_key"), max_bucket,
                        "incremental_lsh_pairs", weight_col=weight_col)
    left = u.filter(F.col("__new") == 1).select(
        "band_id", "band_key", F.col(id_col).alias("__ia"))
    right = u.select("band_id", "band_key", F.col(id_col).alias("__ib"))
    return (left.join(right, ["band_id", "band_key"])
            .filter(F.col("__ia") != F.col("__ib"))
            .select(F.least("__ia", "__ib").alias("id_a"),
                    F.greatest("__ia", "__ib").alias("id_b"))
            .distinct())


def compact_band_index(index: DataFrame, id_col: str = "doc_id",
                       weight_col: str = "band_weight") -> DataFrame:
    """RETENTION for the persisted LSH band index: collapse every
    (band_id, band_key) bucket to ONE row — the min-id member as the
    bucket REPRESENTATIVE, plus the bucket's cardinality as
    ``weight_col``. The streaming/incremental dedup state otherwise
    grows without bound (every batch appends its bands); compaction
    bounds it at one row per DISTINCT bucket while preserving all
    future results exactly:

    - **Connectivity**: every member of an under-cap bucket was, when it
      landed, band-joined against all earlier members
      (:func:`incremental_lsh_pairs` — bucket size only grows, so it was
      under the cap then too), hence the bucket's members are already
      pairwise CONNECTED in the component snapshot. A future doc
      colliding with the bucket pairs with the representative and merges
      into the one component all members share — identical final
      components, fewer (redundant) pairs. Pinned by a two-run replay
      test and by the `dedup_state_compaction` oracle checksum.
    - **Cap semantics**: the carried weight makes
      ``incremental_lsh_pairs(..., weight_col=...)`` count the bucket at
      its ORIGINAL cardinality, so a hot bucket the cap suppressed stays
      suppressed after compacting to one row (without the weight, a
      10⁶-row bucket would compact to 1 and silently start emitting
      pairs the uncompacted run never would).

    Idempotent (re-compacting a compacted index is a no-op: weights
    re-sum to themselves), and safe to interleave with appends — compact
    the (compacted ∪ new bands) union between batches. Plan: ONE
    groupBy shuffle on uniform (band_id, band_key) hash keys over the
    index (never the corpus); output ≤ input rows by construction."""
    w = (F.col(weight_col).cast("long")
         if weight_col in index.columns else F.lit(1).cast("long"))
    return (index.withColumn("__w", w)
            .groupBy("band_id", "band_key")
            .agg(F.min(id_col).alias(id_col),
                 F.sum("__w").cast("long").alias(weight_col)))


def split_pair_store(pairs: DataFrame, watermark_batch: int,
                     batch_col: str = "batch_id"
                     ) -> tuple[DataFrame, DataFrame]:
    """RETENTION for the accumulated pair store: split into (active,
    archive) at a batch watermark. Pairs are consumed exactly once — the
    micro-batch that discovers them feeds them to
    :func:`incremental_components`; afterwards the component snapshot IS
    the result and old pairs are pure audit trail. Archiving batches
    ``< watermark_batch`` keeps the active store O(recent batches) while
    the archive partition preserves the full provenance. Returns
    ``(active, archived)`` — two filters over one scan (write archive
    under e.g. ``pairs/archive/`` and truncate-and-load the active
    store)."""
    return (pairs.filter(F.col(batch_col) >= watermark_batch),
            pairs.filter(F.col(batch_col) < watermark_batch))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 8,
                      band_size: int = 2, shingle_n: int = 3,
                      max_bucket: int | None = 1000) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs: band the signature, self-join
    on (band index, band key), emit distinct (id_a < id_b) pairs.

    The heavy part (shingle → hash → signature) is a pure map evaluated
    ONCE into a materialized band index (ids + band keys only); the
    self-join shuffles that small index on uniform hash keys — no skew.
    ``max_bucket`` drops pathological buckets (degenerate shingles, empty
    docs) so one hot bucket cannot produce an O(n²) pair explosion.
    """
    assert num_hashes % band_size == 0
    bands = minhash_bands(df, id_col, text_col, num_hashes, band_size, shingle_n)
    return lsh_pairs_from_bands(bands, id_col, max_bucket)


def lsh_pairs_from_bands(bands: DataFrame, id_col: str = "doc_id",
                         max_bucket: int | None = 1000,
                         carry_cols: Sequence[str] = ()) -> DataFrame:
    """Candidate pairs from a prebuilt band index (:func:`minhash_bands`
    output) — use this when the index is computed once and consumed by
    several stages (e.g. full-corpus pairs AND the persisted side of an
    incremental join), so the expensive shingle → hash → signature map
    never re-runs per consumer.

    ``carry_cols``: extra columns that join into the bucket key and ride
    through to the output — a consumer sweeping several band layouts
    (lsh_quality_sweep) tags each layout's bands and gets all arms'
    pairs from ONE capped barrier + ONE self-join instead of one
    cascade per arm; the cap still applies per (tag, band) bucket,
    exactly the per-arm semantics."""
    # bucket-count window + cap filter live inside the barrier so the
    # count executes once, not once per self-join side; drops are observed
    # into last_cap_drops() instead of vanishing silently
    keys = [*carry_cols, "band_id", "band_key"]
    bands = _capped_barrier(bands, tuple(keys), max_bucket,
                            "lsh_pairs_from_bands")
    left = bands.select(*keys, F.col(id_col).alias("id_a"))
    right = bands.select(*keys, F.col(id_col).alias("id_b"))
    return (left.join(right, keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(*carry_cols, "id_a", "id_b").distinct())


def minhash_estimate_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 8,
                           band_size: int = 2, shingle_n: int = 3,
                           threshold: float = 0.5,
                           max_bucket: int | None = 1000) -> DataFrame:
    """LSH candidate pairs scored by the MinHash ESTIMATE — the fraction
    of agreeing signature slots, an unbiased estimator of Jaccard
    similarity (Broder 1997) — instead of an exact shingle re-verify.
    This is the 100 TB verify when re-reading text is the expensive part:
    the signature already sitting in the band index IS the verifier, so
    the corpus is touched exactly once (the signature map). Returns
    (id_a, id_b, n_agree, est_jaccard) with est_jaccard ≥ ``threshold``;
    n_agree/num_hashes is exactly representable for power-of-two
    num_hashes, keeping the estimate cross-engine bit-identical.

    Plan: one signature pass; the banded index CARRIES the signature so
    candidate scoring needs no second join against the corpus; hot
    buckets capped + audited like every other candidate generator
    (:func:`last_cap_drops`)."""
    assert num_hashes % band_size == 0
    sigs = minhash_signature(df.select(id_col, text_col), text_col,
                             num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    banded = sigs.select(
        id_col, "minhash",
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col("minhash")[b * band_size + r]
                               .cast("string") for r in range(band_size)])
            for b in range(n_bands)
        ])).alias("band_id", "band_key"))
    banded = _capped_barrier(banded, ("band_id", "band_key"), max_bucket,
                             "minhash_estimate_pairs")
    left = banded.select("band_id", "band_key",
                         F.col(id_col).alias("id_a"),
                         F.col("minhash").alias("__sa"))
    right = banded.select("band_id", "band_key",
                          F.col(id_col).alias("id_b"),
                          F.col("minhash").alias("__sb"))
    cand = (left.join(right, ["band_id", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__sa", "__sb").distinct())
    n_agree = F.aggregate(
        F.zip_with(F.col("__sa"), F.col("__sb"),
                   lambda x, y: (x == y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (cand.select("id_a", "id_b", n_agree.alias("n_agree"))
            .withColumn("est_jaccard",
                        F.col("n_agree") / F.lit(float(num_hashes)))
            .filter(F.col("est_jaccard") >= threshold))


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash sketch over word tokens: each token hashes to ``bits``
    bits (md5-derived); each bit position accumulates +1/−1 across distinct
    tokens; the sign vector packs into one integer. Pure map, no shuffle.

    ``bits`` up to 60 is supported — the sketch-width lever for corpora
    that saturate 32 bits (shared-vocabulary boilerplate; see SCALE.md
    §10). ≤32 bits reads 8 md5 hex chars (kept byte-stable for the
    cross-engine oracles); wider sketches read 15 hex chars (60 bits,
    still < 2^63 so the conv→long cast never overflows).
    """
    if bits > 60:
        raise ValueError(f"simhash bits must be <= 60, got {bits}")
    # Hash each distinct token once (one md5 per token, not per token×bit),
    # expand each hash to its ±1 bit-vote vector, then ONE fold accumulates
    # all `bits` votes per traversal step — the token array is walked once,
    # not once per bit (VERDICT r01 "What's wrong" #2).
    n_hex = 8 if bits <= 32 else 15
    hashes = F.transform(
        F.array_distinct(T.tokens(F.col(text_col))),
        lambda t: F.conv(F.substring(F.md5(F.concat(F.lit("sh:"), t)), 1, n_hex),
                         16, 10).cast("long"))
    bitvotes = F.transform(hashes, lambda h: F.array(*[
        F.when(F.shiftright(h, b).bitwiseAND(1) == 1, F.lit(1)).otherwise(F.lit(-1))
        for b in range(bits)]))
    votes = F.aggregate(
        bitvotes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x))
    tmp = df.withColumn("__votes", votes)
    # pack the sign vector into one integer with a second fold; 2^b via
    # pow(double) is a power of two, exactly representable for every b
    # here, and the long cast is safe for b <= 60
    packed = F.aggregate(
        F.col("__votes"),
        F.struct(F.lit(0).cast("long").alias("v"), F.lit(0).alias("b")),
        lambda acc, x: F.struct(
            (acc["v"] + F.when(x > 0, F.pow(F.lit(2.0), acc["b"]).cast("long"))
                         .otherwise(F.lit(0).cast("long"))).alias("v"),
            (acc["b"] + F.lit(1)).alias("b")),
        lambda acc: acc["v"])
    return tmp.withColumn("simhash", packed.cast("long")).drop("__votes")


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", bits: int = 16, bands: int = 4,
                  max_hamming: int = 3,
                  max_bucket: int | None = 1000) -> DataFrame:
    """SimHash near-duplicate pairs: band the ``bits``-bit sketch into
    ``bands`` contiguous bit-slices, self-join on (band index, band value) —
    any pair within ``max_hamming`` of each other collides on ≥1 band when
    ``max_hamming < bands`` (pigeonhole) — then verify with exact Hamming
    distance (bit_count of xor, JVM-side).

    Scale shape: the sketch is a pure map evaluated ONCE into a
    materialized (id, sketch, band) index; the only shuffle is the band
    equi-join on small uniform integer keys; the verify runs only on
    candidates. Returns (id_a, id_b, hamming).

    ``max_bucket`` caps hot band buckets, same as the MinHash twin
    (:func:`lsh_pairs_from_bands`): a band value shared by b docs —
    empty/near-empty docs all sketching to 0, or shared boilerplate
    saturating a narrow sketch — otherwise contributes O(b²) join rows
    with no bound (the repo's 10× probe measured an 86.6× wall blow-up on
    the uncapped join, SCALE.md §10d). Capping weakens the pigeonhole
    recall guarantee ONLY for docs inside capped buckets (their pairs may
    be missed — a lower bound, never false positives, since the Hamming
    verify still gates every emitted pair); drops are observed into
    :func:`last_cap_drops` and logged. ``max_bucket=None`` opts out.
    """
    sigs = simhash(df.select(id_col, text_col), text_col, bits)
    return sketch_hamming_pairs(sigs, "simhash", id_col, bits, bands,
                                max_hamming, max_bucket, "simhash_pairs")


def sketch_hamming_pairs(sigs: DataFrame, sketch_col: str,
                         id_col: str, bits: int, bands: int,
                         max_hamming: int, max_bucket: int | None,
                         site: str) -> DataFrame:
    """Banded Hamming near-dup join over ANY integer-sketch frame — the
    band/cap/verify machinery shared by text SimHash
    (:func:`simhash_pairs`) and perceptual image hashes
    (multimodal.perceptual_hash → queries ``image_near_dup``): band the
    ``bits``-bit sketch into ``bands`` contiguous bit-slices, self-join
    on (band index, band value) — any pair within ``max_hamming``
    collides on ≥1 band when ``max_hamming < bands`` (pigeonhole) — then
    verify with exact Hamming distance (bit_count of xor, JVM-side).
    Returns (id_a, id_b, hamming).

    The (id, sketch, band) index is materialized ONCE with hot band
    buckets capped and drops observed into :func:`last_cap_drops` under
    ``site`` (lower-bound recall only for capped buckets — the verify
    still gates every emitted pair; ``max_bucket=None`` opts out); the
    only shuffle is the band equi-join on small uniform integer keys.
    """
    assert bits % bands == 0
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}): the "
            f"pigeonhole recall guarantee (some band unchanged) only holds "
            f"when fewer differing bits than bands exist")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = _capped_barrier(sigs.select(
        F.col(id_col), F.col(sketch_col).alias("__sk"),
        F.posexplode(F.array(*[
            F.shiftright(F.col(sketch_col), b * band_bits)
            .bitwiseAND(F.lit(mask))
            for b in range(bands)
        ])).alias("band_id", "band_val")),
        ("band_id", "band_val"), max_bucket, site)
    left = banded.select(F.col("band_id"), F.col("band_val"),
                         F.col(id_col).alias("id_a"),
                         F.col("__sk").alias("sh_a"))
    right = banded.select(F.col("band_id"), F.col("band_val"),
                          F.col(id_col).alias("id_b"),
                          F.col("__sk").alias("sh_b"))
    cand = (left.join(right, ["band_id", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", hamming.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def jaccard_pairs(df: DataFrame, block_col: str, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  threshold: float = 0.2,
                  max_shingle_df: int | None = 10_000,
                  allow_all_pairs: bool = False) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key
    (e.g. MinHash band bucket, source, or length band).

    For ``threshold > 0`` this is an inverted-index plan: explode distinct
    shingles into a materialized posting index (evaluated once — the
    shingle pipeline never runs twice), self-join postings on (block,
    shingle), count shared shingles per pair, and derive |∩|/|∪| from the
    per-doc set sizes — only pairs sharing at least one shingle ever
    materialize, so the cost is Σ bucket² over *shingle* buckets instead
    of |block|² array intersections. At 100 TB, stop-shingle capping (drop
    shingles whose document frequency exceeds a cap) bounds the hot-shingle
    buckets; AQE skew-join splits the rest.

    ``max_shingle_df`` defaults ON (10 000), same rationale and lower-bound
    semantics as :func:`containment_pairs` (the 100× probe measured the
    uncapped posting join exhausting local disk, SCALE.md §10b); capped
    Jaccard can only shrink, so no false positives appear above any
    threshold. ``max_shingle_df=None`` opts out.

    The default ``threshold=0.2`` keeps the all-default call on the safe
    capped inverted-index path (matching the registry query).
    BREAKING CHANGE (round 6, recorded in CHANGES_r6/r7): the default was
    0.0 through round 5 — an all-default call now returns a SMALLER pair
    set (zero/low-overlap pairs dropped) on a different execution path;
    callers wanting the old behavior must pass ``threshold=0.0,
    allow_all_pairs=True`` explicitly.
    ``threshold <= 0`` must also emit zero-overlap pairs, so it falls back to
    the all-pairs block join with array_intersect/array_union — a path where
    ``max_shingle_df`` CANNOT apply (there is no posting index to cap), so
    the disk-exhaustion cliff the 100× probe measured on the uncapped join
    returns on large blocks. That path therefore requires the explicit
    ``allow_all_pairs=True`` opt-in; the default refuses with a ValueError
    rather than silently running an |block|² join at scale.
    """
    if threshold <= 0 and not allow_all_pairs:
        raise ValueError(
            "jaccard_pairs with threshold <= 0 emits zero-overlap pairs via an "
            "all-pairs block join on which max_shingle_df cannot apply — O(|block|^2) "
            "rows, measured to exhaust local disk at 100x scale (SCALE.md §10b). "
            "Pass allow_all_pairs=True to opt in on a block you know is small, "
            "or use threshold > 0 for the capped inverted-index plan.")
    sh = df.select(
        F.col(block_col).alias("__block"),
        F.col(id_col).alias("id_a"),
        T.word_shingles(F.col(text_col), shingle_n).alias("sh_a"),
    )
    if threshold <= 0:
        sh = _index_barrier(sh)      # shingle pipeline once, not per side
        other = sh.select(F.col("__block"), F.col("id_a").alias("id_b"),
                          F.col("sh_a").alias("sh_b"))
        pairs = sh.join(other, "__block").filter(F.col("id_a") < F.col("id_b"))
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
        return (pairs.select("id_a", "id_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))

    inter = _shingle_intersections(df, block_col, id_col, text_col,
                                   shingle_n, max_shingle_df)
    jac = (F.col("__inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("__inter")))
    return (inter.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def _shingle_intersections(df: DataFrame, block_col: str, id_col: str,
                           text_col: str, shingle_n: int,
                           max_shingle_df: int | None) -> DataFrame:
    """Shared inverted-index core for jaccard_pairs / containment_pairs:
    per ordered pair sharing ≥1 shingle within a block, the shingle-set
    sizes and intersection count (columns id_a, id_b, n_a, n_b, __inter).

    Only pairs sharing at least one shingle ever materialize, so the cost
    is Σ bucket² over *shingle* postings instead of |block|² intersections.
    """
    # The struct binding makes Catalyst materialize the shingle array once
    # per row even though it is referenced twice (size + explode) — without
    # it, projection collapse re-evaluates the whole shingle pipeline for
    # each reference (~5× slower scan).
    packed = df.select(
        F.col(block_col).alias("__block"),
        F.col(id_col).alias("id_a"),
        T.bound(T.word_shingles(F.col(text_col), shingle_n),
                lambda t: F.struct(F.size(t).alias("n"), t.alias("sh"))).alias("s"))
    # Stop-shingle capping (SCALE.md §4): a shingle present in more than
    # max_shingle_df docs of a block contributes O(df²) join rows while
    # carrying almost no similarity signal — drop it from the index.
    # |∩| can only shrink, so capped similarity is a LOWER bound: no
    # false positives are introduced, some hot-boilerplate pairs may be
    # missed. The document-frequency window runs inside the barrier (once,
    # not once per posting-join side) and drops are observed into
    # last_cap_drops().
    posts = _capped_barrier(
        packed.select("__block", "id_a", F.col("s.n").alias("n_a"),
                      F.explode("s.sh").alias("__shingle")),
        ("__block", "__shingle"), max_shingle_df, "shingle_postings")
    other = posts.select(F.col("__block"), F.col("__shingle"),
                         F.col("id_a").alias("id_b"), F.col("n_a").alias("n_b"))
    return (posts.join(other, ["__block", "__shingle"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("__inter")))


def containment_pairs(df: DataFrame, block_col: str, id_col: str = "doc_id",
                      text_col: str = "text", shingle_n: int = 3,
                      threshold: float = 0.5,
                      max_shingle_df: int | None = 10_000) -> DataFrame:
    """Overlap-coefficient ("containment") near-dup pairs within a blocking
    key: |A∩B| / min(|A|, |B|) ≥ threshold over word-shingle sets.

    Catches the partial duplicates Jaccard misses: a short document quoted
    whole inside a much longer one scores ~1.0 here while its |∩|/|∪| is
    crushed by the length difference — the standard containment check used
    for quote/subset dedup in web-corpus pipelines. Requires threshold > 0:
    the plan is the same materialized inverted-index join as jaccard_pairs
    (only pairs sharing ≥1 shingle materialize; stop-shingle capping bounds
    hot postings at scale), which cannot see zero-overlap pairs.

    ``max_shingle_df`` defaults ON (10 000): the repo's own 100× probe
    (SCALE.md §10b) measured the uncapped inverted index exhausting >30 GB
    of shuffle disk on a shared-vocabulary corpus while the capped run
    finished in ~150 s — beyond about one decade of growth the cap is
    mandatory, so the safe behavior is opt-out. Capping drops shingles
    whose block-level document frequency exceeds the cap, so the reported
    containment is a LOWER bound (no false positives; pairs whose entire
    overlap is hot boilerplate may be missed). Pass ``max_shingle_df=None``
    for the exact uncapped semantics on corpora known to be small.
    """
    if threshold <= 0:
        raise ValueError(
            "containment_pairs requires threshold > 0: the inverted-index "
            "plan only materializes pairs sharing at least one shingle")
    inter = _shingle_intersections(df, block_col, id_col, text_col,
                                   shingle_n, max_shingle_df)
    cont = (F.col("__inter").cast("double")
            / F.least(F.col("n_a"), F.col("n_b")))
    return (inter.select("id_a", "id_b", cont.alias("containment"))
            .filter(F.col("containment") >= threshold))


def duplicated_spans(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 5,
                     min_occurrences: int = 2) -> DataFrame:
    """Exact SUBSTRING dedup — the span-level third dedup modality of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", ExactSubstr) and RefinedWeb: find every maximal token span of
    length ≥ ``k`` whose k-token shingles each occur at least
    ``min_occurrences`` times in the corpus (total occurrences, so
    within-document self-repetition counts, as in Lee et al.). Returns one
    row per maximal span: (``id_col``, span_start, span_end, span_tokens),
    token indices 1-based inclusive.

    Plan (their global suffix array traded for Spark-native shuffles):

    1. explode each document's k-token shingles WITH their start
       positions — the position-aware posting frame, token-scale (same
       order of magnitude as any tokenization pass);
    2. one groupBy(shingle) count; hot boilerplate keys are absorbed by
       map-side partial aggregation (a count, not a pair join — nothing
       here is quadratic, unlike the pair-generating LSH buckets, so no
       ``max_bucket`` cap is needed); only shingles with
       occ ≥ min_occurrences survive;
    3. left-semi join postings against the surviving shingles (1:1 per
       posting) to mark duplicated start positions;
    4. per-document gaps-and-islands merge: all intervals are length
       ``k`` and sorted by start, so two duplicated starts belong to one
       maximal span iff their gap is ≤ k (overlap or adjacency); one
       window over ``id_col`` (documents are bounded, the window frame is
       per-doc duplicated positions only).
    """
    _validate_span_args(k, min_occurrences)
    posts = _span_posts(df, id_col, text_col, k)
    dup = (posts.groupBy("__sh").agg(F.count(F.lit(1)).alias("__occ"))
           .filter(F.col("__occ") >= min_occurrences).select("__sh"))
    marked = posts.join(dup, "__sh", "left_semi")
    return _spans_from_marked(marked, id_col, k)


def _validate_span_args(k: int, min_occurrences: int) -> None:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_occurrences < 2:
        raise ValueError(
            f"min_occurrences must be >= 2 (an occ-1 span is not a "
            f"duplicate), got {min_occurrences}")


def _span_posts(df: DataFrame, id_col: str, text_col: str,
                k: int) -> DataFrame:
    """Position-aware k-shingle posting frame: (__id, pos, __sh), 1-based
    start positions. Docs shorter than k tokens (or NULL text) yield NO
    shingles — the otherwise-empty branch matters because
    sequence(1, 0) would generate a DESCENDING [1, 0], not an empty
    array."""
    shingles_with_pos = T.bound(
        T.tokens(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= k,
            F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)),
                        lambda i: F.concat_ws(" ", F.slice(t, i, k))))
        .otherwise(F.array().cast("array<string>")))
    return (df.select(F.col(id_col).alias("__id"),
                      F.posexplode(shingles_with_pos).alias("__p0", "__sh"))
            .select("__id", (F.col("__p0") + 1).alias("pos"), "__sh"))


def _spans_from_marked(marked: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated start positions into maximal
    spans: all intervals are length k and sorted, so consecutive starts
    chain iff their gap is <= k (overlap or adjacency)."""
    w = Window.partitionBy("__id").orderBy("pos")
    prev = F.lag("pos").over(w)
    spans = (marked
             .withColumn("__new", F.when(prev.isNull()
                                         | (F.col("pos") - prev > k), 1)
                         .otherwise(0))
             .withColumn("__isl", F.sum("__new").over(
                 w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
             .groupBy("__id", "__isl")
             .agg(F.min("pos").alias("__start"), F.max("pos").alias("__last")))
    return spans.select(
        F.col("__id").alias(id_col),
        F.col("__start").cast("long").alias("span_start"),
        (F.col("__last") + (k - 1)).cast("long").alias("span_end"),
        (F.col("__last") + (k - 1) - F.col("__start") + 1).cast("long")
        .alias("span_tokens"))


def substring_posting_counts(df: DataFrame, text_col: str = "text",
                             k: int = 5) -> DataFrame:
    """The PERSISTABLE artifact of incremental substring dedup: corpus-wide
    (shingle, occ) counts — write once per corpus snapshot (bucket by
    ``shingle`` for shuffle-free daily joins: layout.bucketed_write) and
    let each increment join against it instead of re-scanning the corpus
    text (:func:`incremental_duplicated_spans`). Columns (shingle, occ)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # no positions needed for the index — plain shingle explode is cheaper
    sh = T.bound(
        T.tokens(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= k,
            F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)),
                        lambda i: F.concat_ws(" ", F.slice(t, i, k))))
        .otherwise(F.array().cast("array<string>")))
    return (df.select(F.explode(sh).alias("shingle"))
            .groupBy("shingle").agg(F.count(F.lit(1)).cast("long")
                                    .alias("occ")))


def incremental_duplicated_spans(new_df: DataFrame, index_counts: DataFrame,
                                 id_col: str = "doc_id",
                                 text_col: str = "text", k: int = 5,
                                 min_occurrences: int = 2) -> DataFrame:
    """Incremental exact-substring dedup — the daily-batch shape: maximal
    duplicated spans in the NEW batch, where a shingle counts as
    duplicated when its occurrences across (persisted corpus index ∪ new
    batch) reach ``min_occurrences``. Equals the full-corpus
    :func:`duplicated_spans` restricted to new docs (occurrence counts are
    global either way), at O(increment) cost: only the new batch is
    tokenized; the corpus contributes its pre-computed
    :func:`substring_posting_counts` (columns shingle, occ) through one
    equi-join — shuffle-free when both sides are bucketed by shingle."""
    _validate_span_args(k, min_occurrences)
    posts = _span_posts(new_df, id_col, text_col, k)
    new_counts = posts.groupBy("__sh").agg(
        F.count(F.lit(1)).alias("__new_occ"))
    idx = index_counts.select(F.col("shingle").alias("__sh"),
                              F.col("occ").alias("__idx_occ"))
    dup = (new_counts.join(idx, "__sh", "left")
           .filter(F.col("__new_occ") + F.coalesce(F.col("__idx_occ"),
                                                   F.lit(0))
                   >= min_occurrences)
           .select("__sh"))
    marked = posts.join(dup, "__sh", "left_semi")
    return _spans_from_marked(marked, id_col, k)


def substring_dedup_stats(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 5,
                          min_occurrences: int = 2) -> DataFrame:
    """Per-document outcome of span-level dedup (:func:`duplicated_spans`):
    (``id_col``, n_tokens, dup_span_tokens, kept_tokens). Every document
    appears, zero-span docs with dup_span_tokens=0 — the frame a pipeline
    joins to decide drop/trim, and the aggregate the removal report
    prints. One extra groupBy(id) of the answer-sized span frame plus a
    left join against the per-doc token counts."""
    spans = duplicated_spans(df, id_col, text_col, k, min_occurrences)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("__dup"))
    base = df.select(F.col(id_col),
                     T.token_count(F.col(text_col)).cast("long")
                     .alias("n_tokens"))
    return (base.join(per_doc, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce(F.col("__dup"), F.lit(0)).cast("long")
                    .alias("dup_span_tokens"),
                    (F.col("n_tokens") - F.coalesce(F.col("__dup"), F.lit(0)))
                    .cast("long").alias("kept_tokens")))


def remove_duplicated_spans(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 5,
                            min_occurrences: int = 2) -> DataFrame:
    """APPLY span-level dedup (:func:`duplicated_spans`): drop every token
    inside a duplicated span and return the cleaned documents —
    (``id_col``, clean_text, n_tokens, kept_tokens). ``clean_text`` is the
    kept token sequence re-joined with single spaces over the normalized
    (lower/trim/whitespace-split) token stream — the same normalization
    every shingle operator sees; NULL text stays NULL, fully-duplicated
    docs come back as ''.

    Plan: the span frame is answer-sized — collect it to a per-doc
    interval array, hash-join it back onto the corpus (broadcast at any
    realistic duplication rate), then ONE higher-order filter drops
    covered positions per row. The corpus token stream is never exploded
    or shuffled; per-row cost is O(n_tokens · spans_in_doc) with small
    span counts by construction (spans are maximal, so ≤ n_tokens/k).
    """
    spans = duplicated_spans(df, id_col, text_col, k, min_occurrences)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("span_start").alias("s"),
                                F.col("span_end").alias("e"))).alias("__spans"))
    joined = df.join(per_doc, id_col, "left")
    spans_arr = F.coalesce(F.col("__spans"),
                           F.array().cast("array<struct<s:bigint,e:bigint>>"))
    # F.filter's two-arg lambda exposes the 0-based element index; spans
    # are 1-based inclusive token intervals
    packed = T.bound(T.tokens(F.col(text_col)), lambda t: F.struct(
        F.size(t).alias("n"),
        F.filter(t, lambda tok, i: ~F.exists(
            spans_arr, lambda sp: (sp["s"] <= i + 1) & (i + 1 <= sp["e"])))
        .alias("kept")))
    # Generate barrier (same rationale as dataset_card): one tokenization
    # per row even though the struct is consumed three times
    staged = joined.select(F.col(id_col), F.col(text_col).alias("__text"),
                           F.explode(F.array(packed)).alias("__s"))
    return staged.select(
        F.col(id_col),
        F.when(F.col("__text").isNotNull(),
               F.concat_ws(" ", F.col("__s.kept"))).alias("clean_text"),
        F.col("__s.n").cast("long").alias("n_tokens"),
        F.size("__s.kept").cast("long").alias("kept_tokens"))


def decontaminate_spans(df: DataFrame, eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_text_col: str = "text", k: int = 5,
                        broadcast_eval: bool = True) -> DataFrame:
    """Span-level decontamination against an evaluation set — the
    RefinedWeb form that :func:`duplicated_spans`'s machinery was built
    to host: every maximal token span of a CORPUS document whose k-token
    shingles each occur anywhere in ``eval_df`` (the benchmark/eval
    suite). Doc-level overlap COUNTING is `decontaminate_ngram_overlap`;
    this marks the actual spans so they can be REMOVED
    (:func:`decontaminate_segments`) instead of dropping whole documents.
    Returns (``id_col``, span_start, span_end, span_tokens), 1-based
    inclusive token indices.

    Plan: the corpus pays the same position-aware shingle explode as
    :func:`duplicated_spans`; the eval side contributes its DISTINCT
    shingles (an eval suite is benchmark-sized — MBs against a 100 TB
    corpus — so the marking semi-join broadcasts by default; pass
    ``broadcast_eval=False`` for a pathologically large eval set), then
    the per-doc gaps-and-islands merge. No corpus-side pair join exists
    anywhere — cost is one tokenization pass + one broadcast semi-join.
    """
    _validate_span_args(k, 2)
    posts = _span_posts(df, id_col, text_col, k)
    ev = (substring_posting_counts(eval_df, eval_text_col, k)
          .select(F.col("shingle").alias("__sh")))
    if broadcast_eval:
        ev = F.broadcast(ev)
    marked = posts.join(ev, "__sh", "left_semi")
    return _spans_from_marked(marked, id_col, k)


def decontaminate_segments(df: DataFrame, eval_df: DataFrame,
                           id_col: str = "doc_id", text_col: str = "text",
                           eval_text_col: str = "text", k: int = 5,
                           broadcast_eval: bool = True) -> DataFrame:
    """APPLY span-level decontamination: SPLIT each corpus document at
    its contaminated spans (:func:`decontaminate_spans`) and return the
    kept segments, one row per segment — (``id_col``, seg_index,
    seg_start, seg_end, seg_tokens, seg_text), indices 1-based inclusive
    over the normalized token stream, ``seg_index`` ordered by position.

    Splitting (not re-joining, unlike :func:`remove_duplicated_spans`'s
    clean_text) is what makes the guarantee BY CONSTRUCTION: a segment is
    a contiguous run of original tokens none of whose k-shingle start
    positions was marked, so no k-shingle of any segment can appear in
    the eval set — re-joined text could mint NEW shingles across a cut.
    Documents with no tokens (or NULL text) yield no segments; fully
    contaminated documents disappear — both are "nothing to train on".

    Plan: the span frame is answer-sized — collected per doc as a sorted
    interval array and hash-joined back (broadcast at any realistic
    contamination rate); ONE higher-order ``aggregate`` folds the
    intervals into their complement, and the per-doc explode emits
    segment rows (answer-sized: segments per doc ≤ spans + 1). The
    corpus token stream is never exploded or shuffled.
    """
    spans = decontaminate_spans(df, eval_df, id_col, text_col,
                                eval_text_col, k, broadcast_eval)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("span_start").alias("s"),
            F.col("span_end").alias("e")))).alias("__spans"))
    joined = df.join(per_doc, id_col, "left")
    spans_arr = F.coalesce(F.col("__spans"),
                           F.array().cast("array<struct<s:bigint,e:bigint>>"))
    # Generate barrier (same rationale as remove_duplicated_spans): one
    # tokenization per row even though tokens/size feed several columns
    packed = T.bound(T.tokens(F.col(text_col)), lambda t: F.struct(
        F.size(t).cast("long").alias("n"), t.alias("toks")))
    staged = joined.select(F.col(id_col), spans_arr.alias("__sp"),
                           F.explode(F.array(packed)).alias("__s"))
    n = F.col("__s.n")
    # fold the sorted disjoint spans into their complement within [1, n]:
    # spans are maximal (gaps > k between them), so every emitted segment
    # is non-empty by construction
    init = F.struct(F.lit(1).cast("long").alias("cur"),
                    F.array().cast("array<struct<s:bigint,e:bigint>>")
                    .alias("segs"))
    segs = F.aggregate(
        F.col("__sp"), init,
        lambda acc, sp: F.struct(
            (sp["e"] + 1).alias("cur"),
            F.when(acc["cur"] < sp["s"],
                   F.concat(acc["segs"], F.array(F.struct(
                       acc["cur"].alias("s"),
                       (sp["s"] - 1).alias("e")))))
            .otherwise(acc["segs"]).alias("segs")),
        lambda acc: F.when(acc["cur"] <= n,
                           F.concat(acc["segs"], F.array(F.struct(
                               acc["cur"].alias("s"), n.alias("e")))))
        .otherwise(acc["segs"]))
    out = staged.select(
        F.col(id_col), F.col("__s.toks").alias("__toks"),
        F.posexplode(segs).alias("__i", "__seg"))
    length = (F.col("__seg.e") - F.col("__seg.s") + 1)
    return out.select(
        F.col(id_col),
        (F.col("__i") + 1).cast("long").alias("seg_index"),
        F.col("__seg.s").cast("long").alias("seg_start"),
        F.col("__seg.e").cast("long").alias("seg_end"),
        length.cast("long").alias("seg_tokens"),
        F.concat_ws(" ", F.slice(F.col("__toks"),
                                 F.col("__seg.s").cast("int"),
                                 length.cast("int"))).alias("seg_text"))


def decontaminate_stats(df: DataFrame, eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_text_col: str = "text", k: int = 5,
                        broadcast_eval: bool = True) -> DataFrame:
    """Per-document decontamination outcome — the report a release prints
    and the frame a pipeline joins to decide drop/trim/keep: every corpus
    document with (``id_col``, n_tokens, contaminated_tokens,
    kept_tokens, n_spans). Zero-hit docs appear with 0/0; NULL-text docs
    appear with NULL token counts (mirrors substring_dedup_stats). One
    groupBy of the answer-sized span frame + a left join against per-doc
    token counts."""
    spans = decontaminate_spans(df, eval_df, id_col, text_col,
                                eval_text_col, k, broadcast_eval)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("__dup"),
        F.count(F.lit(1)).alias("__n"))
    base = df.select(F.col(id_col),
                     T.token_count(F.col(text_col)).cast("long")
                     .alias("n_tokens"))
    dup = F.when(F.col("n_tokens").isNotNull(),
                 F.coalesce(F.col("__dup"), F.lit(0))).cast("long")
    return (base.join(per_doc, id_col, "left")
            .select(id_col, "n_tokens",
                    dup.alias("contaminated_tokens"),
                    (F.col("n_tokens") - dup).cast("long")
                    .alias("kept_tokens"),
                    F.when(F.col("n_tokens").isNotNull(),
                           F.coalesce(F.col("__n"), F.lit(0))).cast("long")
                    .alias("n_spans")))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 25,
                         check_interval: int = 2) -> DataFrame:
    """Duplicate GROUPS from candidate pairs: connected components by
    iterative min-label propagation — each node repeatedly adopts the
    minimum label among its neighborhood until fixpoint, which is the
    minimum id in its component (the canonical keeper).

    This is the step that turns pairwise near-dup evidence (MinHash/SimHash/
    Jaccard) into dedup decisions. Formulated over the symmetrized edge set
    PLUS a self-loop per node, one propagation step is exactly
    ``edges ⋈ labels → groupBy(src).min(comp)`` — the self-loop folds the
    node's own label into the neighborhood min, so ``labels`` is referenced
    ONCE per step and consecutive steps fuse lazily into a single job
    (the two-reference least/left-join formulation forces a
    materialization per step or double-computes). Convergence is an
    order-insensitive checksum (count + hash sum, as in
    ``connected_components_star``) every ``check_interval`` steps; up to
    ``check_interval − 1`` propagation steps run redundantly after the
    true fixpoint — measured strictly cheaper than materializing every
    step (noop-drain: 1.2 s → 0.9 s at sf0.1; 6.3 s → 3.7 s on the 10×
    probe, where the candidate graph's diameter reaches ~21 hops — the
    win grows with scale because each skipped materialization costs
    O(|nodes|)). Iterations needed =
    graph diameter in min-label hops (dup clusters are shallow —
    boilerplate stars converge in 2-3; long transitive chains are the
    ``connected_components_star`` regime). Returns (id, component) for
    every node in ``pairs``.
    """
    # edges joins into EVERY iteration — without the checkpoint each round
    # would re-run the whole upstream candidate pipeline (minhash/bands/
    # verify), turning k iterations into k full corpus passes. ONE
    # barrier builds the symmetrized+self-looped edge set (r14: this was
    # two chained materializations — sym, then edges = sym ∪ self-loops —
    # caching the edge bytes twice and paying two full action cascades;
    # the distinct's exchange is shared by both union branches, so one
    # barrier runs the candidate pipeline once). Self-loops may duplicate
    # an (x,x) row a caller's pairs already contained (incremental stars
    # carry them): harmless — every consumer is a min-aggregation, and
    # `nodes` derives from the self-loop rows themselves.
    sym = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
           .union(pairs.select(F.col(id_b).alias("src"),
                               F.col(id_a).alias("dst")))
           .distinct())
    edges = materialize(
        sym.union(sym.select(F.col("src"), F.col("src").alias("dst"))
                  .distinct()))
    labels = (edges.where(F.col("src") == F.col("dst"))
              .select(F.col("src").alias("id"))
              .withColumn("comp", F.col("id")))
    from pyspark.sql import Observation
    prev_chk = None
    for i in range(max_iter):
        labels = (edges.join(labels, edges.dst == labels.id)
                  .groupBy("src").agg(F.min("comp").alias("comp"))
                  .withColumnRenamed("src", "id"))
        if (i + 1) % check_interval == 0 or i + 1 == max_iter:
            # convergence checksum rides the materialize action as an
            # Observation (CollectMetrics) — the separate count+hash
            # job (and its driver-turnaround gap) per check is gone
            obs = Observation()
            labels = materialize(labels.observe(
                obs, F.count(F.lit(1)).alias("cnt"),
                # decimal accumulator: a long sum of 64-bit hashes
                # overflows
                F.sum(F.xxhash64("id", "comp").cast("decimal(27,0)"))
                .alias("hsh")))
            m = obs.get
            chk = (m["cnt"], m["hsh"])
            if chk == prev_chk:
                break
            prev_chk = chk
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def incremental_components(prior: DataFrame, new_pairs: DataFrame,
                           id_a: str = "id_a", id_b: str = "id_b",
                           max_iter: int = 25,
                           check_interval: int = 2) -> DataFrame:
    """Update persisted duplicate-group assignments with a new batch's
    candidate pairs — the daily-run companion to
    :func:`incremental_lsh_pairs`, closing the incremental dedup loop
    (sketch increment → candidate pairs → GROUP assignment) without ever
    re-running components over the historical corpus graph.

    ``prior`` is a stored (id, component) frame from an earlier run;
    ``new_pairs`` are candidate pairs involving the increment (every pair
    ``incremental_lsh_pairs`` emits touches ≥1 new doc). Each prior
    assignment IS a star edge (member → component minimum), so the union
    of prior stars + new pairs is a graph whose min-label propagation
    converges in O(diameter of the NEW linkage) rounds — prior components
    are depth-1 already, and a new pair bridging two old components
    propagates the smaller minimum across both stars in 2 hops. Cost per
    run: O(|prior| + |new pairs|) rows through ~2-3 fused propagation
    steps, independent of how many historical batches built ``prior``.

    Returns (id, component) covering every prior id and every id in
    ``new_pairs`` — singleton prior components keep their row (their star
    edge is a self-loop), so the output is a full replacement snapshot.
    Proven equal to a from-scratch ``connected_components`` over the full
    pair history by test.
    """
    stars = prior.select(F.col("id").alias(id_a),
                         F.col("component").alias(id_b))
    return connected_components(
        stars.unionByName(new_pairs.select(F.col(id_a), F.col(id_b))),
        id_a=id_a, id_b=id_b, max_iter=max_iter,
        check_interval=check_interval)


def pinned_incremental_split(prior_split: DataFrame, components: DataFrame,
                             new_docs: DataFrame, doc_id: str = "doc_id",
                             seed: str = "split:", train_pct: int = 80,
                             valid_pct: int = 10) -> DataFrame:
    """Incremental leakage-safe split with PINNED assignments — the
    eval-set-stability companion to the batch group-aware split: when
    tomorrow's batch adds a document that bridges two duplicate
    components, the merged component's hash bucket moves, and a naive
    re-run would silently migrate previously-assigned documents across
    train/test — invalidating every metric computed on the old eval set.
    Here previously-assigned documents KEEP their split unconditionally;
    only new documents take a decision:

    - a new doc whose (possibly merged) component contains previously
      assigned docs INHERITS their pin — when the merge united prior
      components with DIFFERENT pins, the pin of the smallest prior
      group_key wins (deterministic in any engine), and every doc in
      that component is flagged ``pin_conflict`` (the merge created
      cross-split near-duplicates among OLD docs — unavoidable without
      moving them; the flag is the audit trail an eval owner filters
      on). Conflicts are answer-sized: derive the report with
      ``out.filter("pin_conflict").select("group_key").distinct()``.
    - a new doc in an all-new component gets the batch hash rule on its
      component key (same md5 bucket arithmetic as ``hash_split``).

    ``prior_split`` is the stored (doc_id, group_key, split[,
    pin_conflict]) snapshot from the previous run (the flag column is
    optional — a first batch coming from the batch split has none);
    ``components`` the UPDATED (id, component) snapshot from
    :func:`incremental_components` (docs with no pairs may be absent —
    they key on their own id); ``new_docs`` the increment (ids already
    in ``prior_split`` are ignored, so at-least-once replay is
    absorbed). Returns the full replacement snapshot
    (doc_id, group_key, split, pin_conflict). The flag is STICKY across
    batches: once a component spans two splits it stays flagged in every
    later snapshot (and infects components it later merges into) — an
    eval owner must be able to trust a False at any point in history.

    Scale shape: the DECISION work is O(increment + old docs in
    increment-touched components) — the pin table is built only for
    components the increment touches (broadcast semi-join; a component
    the batch never touches cannot CHANGE its conflict state: its
    membership is unchanged, so its stored flag passes through), then
    broadcast into both output branches. The O(prior) part is only the
    passthrough re-emit of the stored snapshot with refreshed group
    keys — the same full-replacement contract as
    :func:`incremental_components`. By-construction properties (pinned
    by tests): no previously-assigned doc ever changes split across
    replays, and a component never spans two splits unless
    ``pin_conflict`` says so."""
    prior_flag = (F.coalesce(F.col("pin_conflict").cast("boolean"),
                             F.lit(False))
                  if "pin_conflict" in prior_split.columns
                  else F.lit(False))
    comp = components.select(F.col("id").alias(doc_id), "component")
    old_keyed = (prior_split.join(comp, doc_id, "left")
                 .select(F.col(doc_id),
                         F.coalesce("component", F.col("group_key"))
                         .cast("long").alias("group_key"),
                         F.col("group_key").alias("__prior_gk"),
                         "split", prior_flag.alias("__prior_cf")))
    new_keyed = (new_docs.select(F.col(doc_id))
                 .join(prior_split.select(doc_id), doc_id, "left_anti")
                 .join(comp, doc_id, "left")
                 .select(F.col(doc_id),
                         F.coalesce("component", F.col(doc_id))
                         .cast("long").alias("group_key")))
    # touched = components containing a new doc PLUS components whose old
    # membership changed vs the prior snapshot (group_key moved). In
    # contract the second set is a subset of the first (components only
    # change through increment pairs), but an out-of-contract snapshot
    # that merged old docs via pairs not involving any new doc would
    # otherwise slip past the pin logic and silently break the
    # "one component, one split unless flagged" guarantee.
    touched = (new_keyed.select("group_key")
               .unionByName(old_keyed
                            .filter(F.col("group_key")
                                    != F.col("__prior_gk"))
                            .select("group_key"))
               .distinct())
    # pins only for increment-touched components: min prior group key's
    # split wins; the flag = (any member already flagged) OR (>1
    # distinct prior split — this merge created the conflict just now).
    # min_by ties are benign — equal __prior_gk rows share one split.
    pins = (old_keyed.join(F.broadcast(touched), "group_key")
            .groupBy("group_key")
            .agg(F.min_by("split", "__prior_gk").alias("__pin"),
                 ((F.countDistinct("split") > 1) | F.max("__prior_cf"))
                 .alias("pin_conflict")))
    h = T.md5_prefix_hash(F.col("group_key").cast("string"), seed) % 100
    hash_rule = (F.when(h < train_pct, "train")
                 .when(h < train_pct + valid_pct, "valid")
                 .otherwise("test"))
    old_out = (old_keyed.join(F.broadcast(pins.drop("__pin")),
                              "group_key", "left")
               .select(doc_id, "group_key", "split",
                       F.coalesce("pin_conflict", F.col("__prior_cf"))
                       .alias("pin_conflict")))
    new_out = (new_keyed.join(F.broadcast(pins), "group_key", "left")
               .select(F.col(doc_id), F.col("group_key"),
                       F.coalesce("__pin", hash_rule).alias("split"),
                       F.coalesce("pin_conflict", F.lit(False))
                       .alias("pin_conflict")))
    return old_out.unionByName(new_out)


def fused_near_dup(corpus: DataFrame, edges: dict[str, DataFrame],
                   richness: Column,
                   id_col: str = "doc_id") -> DataFrame:
    """CROSS-MODAL near-dup verdict: a real multimodal corpus dedups on
    EITHER signal — two documents sharing an image are duplicates even
    when their captions differ, and vice versa — but separate pair
    streams (text MinHash, image perceptual hash, …) each only see their
    own modality. This fuses them: union the edge streams with modality
    provenance, run ONE connected-components pass over the fused graph
    (so a text-dup chained to an image-dup lands in one group — pinned
    by test), then pick each group's survivor by the ``richness``
    expression (higher keeps; ties → lowest id) — the "prefer the richer
    document" policy, e.g. byte size or modality count.

    ``edges``: {modality_name: (id_a, id_b) candidate-pair frame}.
    Returns one row per corpus doc: (``id_col``, group_key,
    survivor_id, n_edges_<modality>…) — the edge counts are the
    per-group provenance audit (which signal(s) formed the group);
    singletons get their own id and zero counts.

    Scale shape: the fused edge set is Σ answer-sized pair streams, the
    component frame is duplicate-members-sized — every join against the
    corpus broadcasts and the corpus itself never shuffles; the survivor
    argmax runs over members only (not the corpus), and provenance
    counts over the edge frames themselves."""
    mods = sorted(edges)
    tagged = None
    for m in mods:
        # normalize to distinct undirected (least, greatest) pairs per
        # modality: a caller emitting both orientations or duplicate rows
        # would otherwise inflate the n_edges_* provenance counts
        part = (edges[m]
                .select(F.least("id_a", "id_b").alias("id_a"),
                        F.greatest("id_a", "id_b").alias("id_b"),
                        F.lit(m).alias("__mod"))
                .distinct())
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("fused_near_dup: no edge frames")
    tagged = materialize(tagged)
    comp = materialize(
        connected_components_star(tagged.select("id_a", "id_b")))
    keyed = (corpus
             .join(F.broadcast(comp.withColumnRenamed("id", id_col)),
                   id_col, "left")
             .select(F.col(id_col),
                     F.coalesce("component", F.col(id_col)).cast("long")
                     .alias("group_key"),
                     # NULL richness (e.g. length(NULL) text) would make
                     # the max_by struct comparison NULL-order-dependent;
                     # a -1 sentinel ranks NULL below every real value
                     F.coalesce(richness.cast("long"), F.lit(-1))
                     .alias("__rich")))
    # survivor argmax over DUP MEMBERS only (answer-sized): max richness,
    # ties → lowest id via the lexicographic (rich, -id) struct max
    members = keyed.join(
        F.broadcast(comp.select(F.col("id").alias(id_col))), id_col)
    surv = (members.groupBy("group_key")
            .agg(F.max_by(id_col,
                          F.struct(F.col("__rich").alias("r"),
                                   (-F.col(id_col)).alias("negid")))
                 .alias("survivor_id")))
    ec = (tagged.join(F.broadcast(comp),
                      tagged["id_a"] == comp["id"])
          .groupBy(F.col("component").alias("group_key"))
          .agg(*[F.sum(F.when(F.col("__mod") == m, 1).otherwise(0))
                 .cast("long").alias(f"n_edges_{m}") for m in mods]))
    return (keyed.join(F.broadcast(surv), "group_key", "left")
            .join(F.broadcast(ec), "group_key", "left")
            .select(F.col(id_col), F.col("group_key"),
                    F.coalesce("survivor_id", F.col(id_col)).cast("long")
                    .alias("survivor_id"),
                    *[F.coalesce(f"n_edges_{m}", F.lit(0)).cast("long")
                      .alias(f"n_edges_{m}") for m in mods]))


def connected_components_star(pairs: DataFrame, id_a: str = "id_a",
                              id_b: str = "id_b",
                              max_rounds: int = 12) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewrites (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14) — converges in O(log² n) rounds regardless of graph
    diameter, vs. diameter-many rounds for plain min-label propagation
    (``connected_components``). The 100 TB choice when dup chains can be
    long (shingled boilerplate, transitive near-dup chains), where
    diameter-bound propagation would run tens of iterations.

    Each round is two edge rewrites; each rewrite is ONE window-aggregate
    shuffle on the node id plus a distinct. Edges only ever move toward the
    component minimum, so the edge set shrinks toward a star per component;
    fixpoint is detected with an order-independent checksum (count +
    xxhash64 sum) instead of a compare-join. Returns (id, component) for
    every node appearing in ``pairs`` — identical output contract to
    ``connected_components``.
    """
    def canon(df: DataFrame) -> DataFrame:
        """Both orientations, self-loops dropped, deduped."""
        fwd = df.select(F.col("src"), F.col("dst"))
        return (fwd.union(fwd.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
                .filter(F.col("src") != F.col("dst")).distinct())

    # checkpoint before the loop: round 1 and the node frame otherwise each
    # re-evaluate the upstream candidate pipeline. The node set comes from
    # the BASE frame (before canon drops self-loops): a node whose only
    # pair is (x, x) — e.g. a singleton star edge from a prior snapshot —
    # must still get its output row, matching connected_components.
    base = materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"),
                            F.col(id_a).alias("dst")))
        .distinct())
    # nodes is consumed exactly once (the final left join) and derives
    # from the materialized base blocks — a second barrier here bought
    # nothing and cost a full action cascade (r14)
    nodes = base.select(F.col("src").alias("id")).distinct()
    edges = base.filter(F.col("src") != F.col("dst"))

    from pyspark.sql import Observation
    prev_chk = None
    for _ in range(max_rounds):
        # large-star: every neighbor v > u re-points at m = min(Γ(u) ∪ {u}).
        # Emitted edges always run big→small, which is exactly the
        # orientation small-star consumes — both phases compose lazily into
        # ONE plan per round, materialized once (a single lineage-truncating
        # checkpoint per round, not one per phase).
        w = Window.partitionBy("src")
        m = F.least(F.min("dst").over(w), F.col("src"))
        large = (edges.withColumn("m", m)
                 .filter(F.col("dst") > F.col("src"))
                 .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
        # small-star: smaller neighbors L = {v < u} and u itself re-point at
        # min(L); emitted per edge (v, m) plus one (u, m) per node. canon's
        # distinct here bounds edge growth round-over-round (measured: the
        # extra shuffle costs nothing against the window pass, and without
        # it duplicate edges inflate the next round's window input).
        lo = canon(large).filter(F.col("dst") < F.col("src"))
        mn = F.min("dst").over(Window.partitionBy("src"))
        lo = lo.withColumn("m", mn)
        small = (lo.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                 .union(lo.select(F.col("src"), F.col("m").alias("dst"))))
        # fixpoint checksum rides the materialize action as an
        # Observation — no separate count+hash job per round.
        # decimal accumulator: a long sum of 64-bit hashes overflows ANSI
        obs = Observation()
        edges = materialize(canon(small).observe(
            obs, F.count(F.lit(1)).alias("cnt"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(27,0)"))
            .alias("hsh")))
        met = obs.get
        chk = (met["cnt"], met["hsh"])
        if chk == prev_chk:
            break
        prev_chk = chk

    comp = edges.groupBy("src").agg(F.min("dst").alias("__mn"))
    return (nodes.join(comp, nodes.id == comp.src, "left")
            .select(F.col("id"),
                    F.least(F.coalesce(F.col("__mn"), F.col("id")),
                            F.col("id")).alias("component")))


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             block_col: str | None = None,
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key (or LSH
    bucket from similarity.hyperplane_lsh_buckets). Cosine is computed with
    higher-order functions (zip_with dot product) — JVM-side, no UDF.

    Norms are computed once per vector BEFORE the self-join (one dot product
    per pair instead of three); cos = dot(a,b)/(‖a‖·‖b‖) evaluates the same
    double arithmetic as the naive form, so results are bit-identical.
    """
    from .similarity import dot, l2_norm

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # _index_barrier: without it the cast+norm projection (and whatever
    # produced df) evaluates once per self-join SIDE — the "norms computed
    # once per vector" claim only holds against a materialized frame
    base = _index_barrier(df.select(
        *( [F.col(block_col).alias("__block")] if block_col else [F.lit(1).alias("__block")] ),
        F.col(id_col).alias("id_a"), vd.alias("v_a"), l2_norm(vd).alias("nrm_a")))
    other = base.select(F.col("__block"), F.col("id_a").alias("id_b"),
                        F.col("v_a").alias("v_b"), F.col("nrm_a").alias("nrm_b"))
    pairs = base.join(other, "__block").filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("nrm_a") * F.col("nrm_b")
    cos = F.when(denom > 0, dot(F.col("v_a"), F.col("v_b")) / denom)
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def _prefix_posting_frames(df: DataFrame, id_col: str, text_col: str,
                           shingle_n: int,
                           tau_ppm: int) -> tuple[DataFrame, DataFrame]:
    """Shared construction for the AllPairs/PPJoin family: the
    materialized shingle-set frame ``(id, s, n)`` and the LAZY
    prefix-posting frame ``(id, n, pos0, tok)`` under the rarest-first
    (df, tok) total order with exact integer-ppm prefix lengths. Both
    :func:`prefix_jaccard_pairs` and :func:`prefix_join_cost_report`
    build from here, so the cost estimate prices exactly the posting
    frame the join would shuffle."""
    sets = materialize(df.select(
        F.col(id_col).alias("id"),
        T.word_shingles(F.col(text_col), shingle_n).alias("s"))
        # long from the start: every ppm bound below multiplies n by up to
        # 1e6, which overflows int32 at ~2148 shingles — ANSI job crash,
        # or silent filter falsehood (dropped qualifying pairs) without
        .withColumn("n", F.size("s").cast("long"))
        .filter(F.col("n") > 0))
    post = sets.select("id", F.explode("s").alias("tok"))
    dfreq = post.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # rarest-first rank per doc; (df, tok) is a total order so prefixes
    # are deterministic in both engines
    ranked = (post.join(dfreq, "tok")
              .groupBy("id")
              .agg(F.array_sort(F.collect_list(F.struct("df", "tok")))
                   .alias("ordered")))
    # ⌈τ·n⌉ in exact integer ppm arithmetic: a double τ·n landing one ulp
    # ABOVE an integer would over-ceil and shorten the prefix — a silent
    # completeness hole. (One ulp below only lengthens it: still exact.)
    ceil_tau_n = F.expr(f"(({tau_ppm} * n) + 999999) div 1000000")
    pref = (sets.join(ranked, "id")
            .select("id", "n",
                    F.slice(F.col("ordered"), 1,
                            (F.col("n") - ceil_tau_n + 1)
                            .cast("int")).alias("prefix")))
    posting = pref.select(
        "id", "n", F.posexplode("prefix.tok").alias("pos0", "tok"))
    return sets, posting


def prefix_join_cost_report(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", shingle_n: int = 3,
                            threshold: float = 0.5) -> DataFrame:
    """Answer-sized (1-row) cost estimate for the prefix-filtered join
    BEFORE its candidate shuffle runs: how many candidate matches the
    prefix-posting self-join would generate on THIS corpus at THIS
    threshold. :func:`prefix_jaccard_pairs` is deliberately uncapped (its
    algebraic completeness is the point), so its safety valve is this
    forecast, not a lossy drop: on a saturated corpus — flat shingle-df
    distribution, where rarest-first prefixes have nothing rare to pick
    (SCALE.md §10f measured 5.9× at 10×) — the estimate goes superlinear
    and the engine says so up front, naming the banded MinHash path
    (:func:`minhash_lsh_pairs`) as the scale alternative.

    Columns: ``n_docs`` (docs with ≥1 shingle — every one contributes ≥1
    prefix posting), ``n_prefix_postings``, ``n_prefix_tokens`` (distinct
    bucket keys), ``max_bucket`` (hottest prefix bucket), and
    ``est_candidate_pairs`` = Σ c·(c−1)/2 over prefix buckets — the EXACT
    row count the candidate join produces before its size/positional
    filters (same-id and duplicate-token collisions included, which is
    what the shuffle pays for). One posting-frame aggregation; everything
    after is answer-sized.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tau_ppm = int(round(threshold * 1_000_000))
    sets, posting = _prefix_posting_frames(
        df, id_col, text_col, shingle_n, tau_ppm)
    buckets = posting.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    stats = buckets.agg(
        F.count(F.lit(1)).cast("long").alias("n_prefix_tokens"),
        F.sum("c").cast("long").alias("n_prefix_postings"),
        F.max("c").cast("long").alias("max_bucket"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        .alias("est_candidate_pairs"))
    docs = sets.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return docs.crossJoin(stats).select(
        "n_docs", "n_prefix_postings", "n_prefix_tokens", "max_bucket",
        "est_candidate_pairs")


def prefix_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", shingle_n: int = 3,
                         threshold: float = 0.5,
                         candidate_budget: int | None = 100_000_000
                         ) -> DataFrame:
    """EXACT all-pairs Jaccard ≥ ``threshold`` over the whole corpus via
    prefix filtering (AllPairs/PPJoin, Xiao et al. WWW'08) — no blocking
    key, no LSH recall loss: the completeness guarantee is algebraic.

    EAGER BY DEFAULT: with ``candidate_budget`` set (the default),
    CONSTRUCTING this DataFrame materializes the posting frame and runs
    the forecast aggregate (Spark jobs at call time, before the returned
    frame is ever executed) — measured ~1.75× call-to-first-result at
    sf0.1 vs the lazy path, amortizing as the join grows because both
    self-join sides reuse the materialized blocks. Pass
    ``candidate_budget=None`` for a fully lazy plan with no forecast.

    Two shingle sets with J ≥ τ overlap in ≥ ⌈τ·|x|⌉ elements, so under
    any global total order of shingles, each set's PREFIX — its first
    ``|x| − ⌈τ·|x|⌉ + 1`` elements — must intersect the other's (skipping
    a whole prefix leaves too few elements to reach the bound). Ordering
    shingles rarest-first makes prefixes the LEAST collide-prone elements:
    the posting index inverts only prefixes, and stop-shingle hot buckets
    disappear by construction rather than by cap — which is what keeps
    this path exact while ``jaccard_pairs``'s full inverted index needs
    ``max_shingle_df``. The size filter (min ≥ τ·max, checked in exact
    integer ppm) prunes candidates before verification, and PPJoin's
    positional filter tightens it: a match on the token at 1-based prefix
    position i of x / j of y bounds the pair's overlap by
    ``min(i, j) + min(|x|−i, |y|−j)`` (≤ min(i,j)−1 shared tokens can
    precede the match, the match itself is 1, ≤ min of the suffix sizes
    can follow), which must reach the pair's equivalent overlap bound
    ``⌈τ·(|x|+|y|)/(1+τ)⌉``. The bound is true for EVERY match — not just
    the pair's first shared token — so filtering each match and
    de-duplicating keeps completeness. All bounds are exact integer
    ppm arithmetic (no float boundary can drop a qualifying pair).

    Plan: one document-frequency aggregation over postings, one shuffle
    join to rank shingles, one prefix-posting self-join (Σ prefix-bucket²,
    bounded by rare-first ordering), then exact verification ONLY on
    candidates via set intersection. Output: (id_a, id_b, n_inter,
    n_union, jac_ppm) — integers, engine-exact.

    ``candidate_budget``: before the candidate shuffle runs, the posting
    frame is materialized and priced (:func:`prefix_join_cost_report`'s
    aggregate — exact Σ c·(c−1)/2 over prefix buckets); the figure is
    recorded in :func:`last_cost_reports` and a warning naming the banded
    MinHash alternative is logged when it exceeds the budget. The
    operator still runs — completeness is its contract; the forecast
    exists so a saturated corpus is flagged BEFORE the shuffle, not
    after. ``None`` disables the check (and the posting materialization).
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tau_ppm = int(round(threshold * 1_000_000))
    sets, posting = _prefix_posting_frames(
        df, id_col, text_col, shingle_n, tau_ppm)
    if candidate_budget is not None:
        # materialize once: the forecast aggregate and both self-join
        # sides then read the same blocks instead of re-deriving the
        # dfreq/rank/slice lineage
        posting = materialize(posting)
        est = (posting.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.sum(F.expr("c * (c - 1) div 2")).cast("long")
                    .alias("p"),
                    F.max("c").cast("long").alias("m")).collect()[0])
        report = {"est_candidate_pairs": int(est["p"] or 0),
                  "max_bucket": int(est["m"] or 0),
                  "budget": candidate_budget}
        _LAST_COST_REPORTS["prefix_jaccard_pairs"] = report
        if report["est_candidate_pairs"] > candidate_budget:
            _CAP_LOG.warning(
                "prefix_jaccard_pairs: forecast %d candidate matches "
                "exceeds budget %d — the corpus's shingle-frequency "
                "distribution is too flat for prefix filtering (hottest "
                "prefix bucket: %d postings); use the banded MinHash "
                "path (minhash_lsh_pairs) as the candidate generator and "
                "keep this operator as the exact verify inside blocks "
                "(SCALE.md §10f)",
                report["est_candidate_pairs"], candidate_budget,
                report["max_bucket"])
    # equivalent-overlap bound o_min = ⌈τ(n_a+n_b)/(1+τ)⌉, exact in ppm
    o_min = F.expr(f"(({tau_ppm} * (a.n + b.n)) + {1_000_000 + tau_ppm} - 1) "
                   f"div {1_000_000 + tau_ppm}")
    # positional upper bound from this match (pos0 is 0-based; i = pos0+1)
    o_ub = (F.least(F.col("a.pos0"), F.col("b.pos0")) + 1
            + F.least(F.col("a.n") - (F.col("a.pos0") + 1),
                      F.col("b.n") - (F.col("b.pos0") + 1)))
    cand = (posting.alias("a")
            .join(posting.alias("b"), "tok")
            .filter(F.col("a.id") < F.col("b.id"))
            .filter(F.least(F.col("a.n"), F.col("b.n")) * 1_000_000
                    >= F.lit(tau_ppm)
                    * F.greatest(F.col("a.n"), F.col("b.n")))
            .filter(o_ub >= o_min)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    verify = (cand
              .join(sets.select(F.col("id").alias("id_a"),
                                F.col("s").alias("__sa"),
                                F.col("n").alias("n_a")), "id_a")
              .join(sets.select(F.col("id").alias("id_b"),
                                F.col("s").alias("__sb"),
                                F.col("n").alias("n_b")), "id_b"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("long")
    scored = verify.select(
        "id_a", "id_b", inter.alias("n_inter"),
        (F.col("n_a") + F.col("n_b") - inter).cast("long").alias("n_union"))
    return (scored
            .filter(F.col("n_inter") * 1_000_000
                    >= F.lit(tau_ppm) * F.col("n_union"))
            .select("id_a", "id_b", "n_inter", "n_union",
                    F.expr("n_inter * 1000000 div n_union")
                    .alias("jac_ppm")))
