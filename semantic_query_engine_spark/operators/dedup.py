"""Deduplication operators for large-scale training-data pipelines —
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
(North-star extensions beyond the reference surface, BASELINE.json:6.)

Scale notes (the part that matters at 100 TB):
- exact: hash the body to a 128-bit digest FIRST, then group on the
  digest — the shuffle carries 16 bytes + key, not document bodies.
- jaccard: never all-pairs.  Explode shingles and self-join on the
  shingle (candidate pairs share >=1 shingle), count shared shingles
  with one aggregation, then filter on the Jaccard floor.  Shuffle is
  keyed by shingle; frequent shingles are the skew risk -> drop
  top-frequency shingles (stop-shingles) before the join.
- minhash/simhash: signature computation is map-only; banding turns
  near-dup detection into an equality join on (band, band_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, words_of
from ..functions.vectors import cosine_from_norms, l2_norm
from ..functions.plan import truncate_plan


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group
    (dup keyed on the md5 fingerprint of normalized text).

    Plan shape: the shuffle carries ONLY (16-byte digest, id) into a
    map-side-combined min() aggregation; document bodies stay in their
    input splits and the survivors are recovered with a semi join on id.
    (A window over full rows would shuffle every body — the difference
    between GBs and TBs of shuffle at corpus scale.)"""
    fp = docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingle array for one document."""
    ws = words_of(text_col)
    count = F.greatest(F.lit(1), F.size(ws) - F.lit(n - 1))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
    )
    return F.array_distinct(grams)


def shingle_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded table + per-doc shingle counts."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
    truncate: bool = True,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    Plan shape: explode shingles -> self-join keyed on shingle (only
    pairs sharing a shingle are candidates) -> count intersections in one
    agg -> join the two per-doc set sizes -> Jaccard filter.  Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    max_shingle_freq is the skew valve: a shingle appearing in more than
    that many documents (a "stop-shingle" — boilerplate, headers) would
    contribute O(freq²) candidate pairs on one join key.  Dropping it
    from BOTH the join and the per-doc sizes computes Jaccard over the
    reduced shingle space — a documented approximation that bounds the
    hottest reduce task; with no shingle above the cap the result is
    exactly the unfiltered Jaccard.
    """
    sh = shingle_table(docs, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        keep = freq.filter(F.col("__df") <= max_shingle_freq).select("shingle")
        sh = sh.join(keep, "shingle", "left_semi")
    # Truncate the exploded shingle table (r14, guide §8 fingerprint-
    # pass shape): `sh` feeds the per-doc sizes AND both self-join
    # sides, so the tokenize+shingle+explode chain (and the stop-
    # shingle semi join, when capped) ran 3x per document.  (id,
    # shingle) is the lightweight proxy a staged dedup run writes
    # anyway; payload text never enters it.  truncate=False skips the
    # checkpoint so plan tests can see the pre-truncation shape (the
    # valve's LeftSemi etc.) that the checkpoint otherwise hides behind
    # a Scan ExistingRDD.
    if truncate:
        sh = sh.transform(truncate_plan)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("nb"))
    # sizes is one row per DOCUMENT — at the corpus scale this module
    # targets that exceeds any broadcast budget, so leave the join
    # strategy to Catalyst/AQE (it broadcasts when genuinely small).
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def _p64(col) -> F.Column:
    """md5-derived signed 64-bit hash (DuckDB-reproducible) — see
    simhash.portable_word_hash."""
    from .simhash import portable_word_hash

    return portable_word_hash(col)


def minhash_band_table(
    docs: DataFrame,
    num_perm: int = 64,
    n_bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    portable: bool = False,
) -> DataFrame:
    """(id, band, key) minhash-LSH banding table, computed entirely in
    whole-stage codegen — no fitted model, no VectorUDT.

    The num_perm permutations are xxhash64(shingle, i) for i in
    0..num_perm-1; the signature is ONE map-side-combined aggregation of
    num_perm min()s over the exploded shingle table.  Bands pack
    num_perm/n_bands adjacent signature slots into one xxhash64 key, so
    near-dup candidate generation becomes an equality join on
    (band, key).  For a pair at Jaccard s the detect probability is
    1-(1-s^r)^b (r=4, b=16: s=0.8 -> 0.9998, s=0.15 -> 0.008 — high
    recall at the near-dup range, tiny false-candidate rate)."""
    if num_perm % n_bands:
        raise ValueError("num_perm must divide into n_bands")
    r = num_perm // n_bands
    sh = shingle_table(docs, text_col, id_col, n)
    # The signature is an element-wise min over num_perm hash slots.
    # r14 shape: ONE posexplode of a num_perm-wide hash array + ONE
    # min() aggregate keyed (id, slot), reassembled per id with
    # array_sort(collect_list(struct)).  The previous shape — num_perm
    # separate min() aggregates in one groupBy — generated a whole-
    # stage-codegen class so large that javac+JIT warmup dominated the
    # first executions (measured 7.6/3.3/2.7/2.4 s across runs at
    # sf0.1 vs 6.7/5.4/1.8/1.8 for this shape) and steady state was
    # ~25% slower.  Values are identical: min per slot is min per
    # slot, whatever the grouping.  Shuffle volume is the same
    # (id, slot, min-hash) triples after map-side combine vs one
    # num_perm-wide row per id.
    if portable:
        # permutation i = md5-derived hash of "i|shingle"; band key =
        # the r signature slots rendered as one string (an equality key
        # needs no hashing — portable mode trades key bytes for a
        # DuckDB-reproducible pipeline; production mode hashes them)
        hs = F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: _p64(
                F.concat(i.cast("string"), F.lit("|"), F.col("shingle"))
            ),
        )
        key_of = lambda b: F.concat_ws(  # noqa: E731
            ",", *[F.col("a")[b * r + j]["mh"].cast("string") for j in range(r)]
        )
    else:
        # xxhash64(shingle, i): i rides as an INT column element, the
        # same type (and therefore the same hash) as the old F.lit(i)
        hs = F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda i: F.xxhash64(F.col("shingle"), i),
        )
        key_of = lambda b: F.xxhash64(  # noqa: E731
            *[F.col("a")[b * r + j]["mh"] for j in range(r)]
        )
    e = sh.select("id", F.posexplode(hs).alias("i", "h"))
    sig = e.groupBy("id", "i").agg(F.min("h").alias("mh"))
    # slot index is unique per id, so the struct sort reassembles the
    # signature in slot order deterministically
    asm = sig.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("a")
    )
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), key_of(b).alias("key"))
            for b in range(n_bands)
        ]
    )
    return asm.select("id", F.explode(bands).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    n_bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by MinHash+LSH banding, confirmed with the exact
    Jaccard over hashed shingle sets.  Returns (id_a, id_b,
    jaccard_dist) with id_a < id_b and jaccard_dist <= threshold.

    Plan shape (the 100 TB story): signatures and band keys are map-only
    expressions; candidates come from an equality join keyed on
    (band, key) — never all-pairs; the exact-Jaccard confirm joins only
    the candidate pairs back to the (id, shingle-hash) table, so
    precision is exact and banding only affects recall.  Shingles cross
    the shuffle as 8-byte xxhash64 values, not strings (64-bit collisions
    are negligible next to the reference-class HashingTF 2^18 buckets)."""
    # Truncate the band table before the self-join (r14): both sides
    # derive from `bt`, so the 64-permutation signature aggregation ran
    # TWICE without it (the same shared-tiny-table rule dedup_eval_lsh
    # applies to its own bt).  n_bands rows of (id, band, key) per doc.
    bt = minhash_band_table(
        docs, num_perm, n_bands, text_col, id_col, n, portable
    ).transform(truncate_plan)
    a, b = bt.alias("a"), bt.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_hash = _p64(F.col("shingle")) if portable else F.xxhash64("shingle")
    # Truncated for the same reason as jaccard_pairs' sh: feeds sizes,
    # ea and eb — 3 derivations of the shingle explode + hash without it.
    sh = shingle_table(docs, text_col, id_col, n).select(
        "id", sh_hash.alias("sh")
    ).transform(truncate_plan)
    sizes = sh.groupBy("id").agg(F.count("*").alias("ns"))
    ea = sh.select(F.col("id").alias("id_a"), "sh")
    eb = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("ns").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("ns").alias("nb"))
    dist = 1.0 - F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_dist", F.round(dist, 6))
        .filter(F.col("jaccard_dist") <= F.lit(threshold))
        .select("id_a", "id_b", "jaccard_dist")
    )


def _srp_planes(n_bands: int, bits: int, dim: int, seed: int) -> list[float]:
    """Flat Rademacher (+/-1) hyperplane matrix, row-major over
    (band, bit, dim).  Seeded Python PRNG on the driver — a pure plan
    CONSTANT (no data touched, no collect), identical on every run."""
    import random

    rng = random.Random(seed)
    return [1.0 if rng.random() < 0.5 else -1.0 for _ in range(n_bands * bits * dim)]


def srp_band_table(
    embeddings: DataFrame,
    n_bands: int,
    bits: int,
    dim: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, key) sign-random-projection signature table.
    bit_i = sign(v . h_(band,i)); key packs the band's bits.  The
    hyperplanes ride along as one literal array, the band index is
    exploded FIRST so the per-row key expression stays small (bits
    aggregates, not bands*bits) — planning and codegen stay cheap.
    Map-only: no shuffle, no fitted model."""
    # one sql-string literal: F.lit(list) pays a py4j round-trip per
    # element (2,048 doubles here) at every plan construction
    from ..functions.vectors import const_array

    planes = const_array(_srp_planes(n_bands, bits, dim, seed))

    def _elem(i: int):
        def _f(x, j):
            idx = (F.col("band") * bits + F.lit(i)) * dim + j + 1
            return x.cast("double") * F.element_at(planes, idx.cast("int"))

        return _f

    key = F.lit(0).cast("long")
    for i in range(bits):
        dot = F.aggregate(
            F.transform(F.col(vec_col), _elem(i)), F.lit(0.0), lambda a, x: a + x
        )
        key = key + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias(vec_col),
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        )
        .select("id", "band", key.alias("key"))
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    srp_bands: int | None = None,
    srp_bits: int = 4,
    srp_dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold.

    Candidate generation, in order of preference:
    - block_col set (e.g. a precomputed cluster/label id): equality join
      inside blocks — pair count ~n²/B instead of n².
    - srp_bands set: sign-random-projection LSH banding.  Each vector
      gets srp_bands keys of srp_bits sign-bits; candidates are pairs
      sharing any (band, key) — an EQUALITY join on the band key, map-only
      signature computation, distinct'd before the exact cosine check.
      Recall for a pair at cosine s is 1-(1-p^bits)^bands with
      p = 1 - acos(s)/pi (s=0.98, bits=4, bands=8 -> miss ~1e-5).
      This is the declared scale path: shuffle is keyed by (band, key),
      never all-pairs.
    - neither: full pair join — tiny inputs only.

    Every candidate is confirmed with the exact cosine, so blocking only
    affects recall, never precision.
    """
    if srp_bands and not block_col:
        # Truncated: both self-join sides derive from `bands`, so the
        # srp_bits x dim sign-projection HOFs ran twice per vector
        # without it.  (id, band, key) — 3 longs a row.
        bands = srp_band_table(
            embeddings, srp_bands, srp_bits, srp_dim, seed, id_col, vec_col
        ).transform(truncate_plan)
        la, lb = bands.alias("ba"), bands.alias("bb")
        cand = (
            la.join(
                lb,
                (F.col("ba.band") == F.col("bb.band"))
                & (F.col("ba.key") == F.col("bb.key"))
                & (F.col("ba.id") < F.col("bb.id")),
            )
            .select(F.col("ba.id").alias("id_a"), F.col("bb.id").alias("id_b"))
            .distinct()
        )
        # per-VECTOR norms, computed once per embedding row before the
        # pair join instead of per pair (r14, with_cosine docstring)
        va = embeddings.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("vec_a"),
            l2_norm(vec_col).alias("__na"),
        )
        vb = embeddings.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vec_b"),
            l2_norm(vec_col).alias("__nb"),
        )
        pairs = cand.join(va, "id_a").join(vb, "id_b")
        # one shared guard+dot/norm expression (ADVICE r14): identical
        # arithmetic to the previous inline form, single source of truth
        sim = F.round(cosine_from_norms("vec_a", "vec_b", "__na", "__nb"), 6)
        return (
            pairs.select("id_a", "id_b", sim.alias("sim"))
            .filter(F.col("sim") >= F.lit(threshold))
            .select("id_a", "id_b", "sim")
        )
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        l2_norm(vec_col).alias("__na"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        l2_norm(vec_col).alias("__nb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    joined = a.join(b, "blk") if block_col else a.crossJoin(b)
    sim = F.round(cosine_from_norms("vec_a", "vec_b", "__na", "__nb"), 6)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id_a", "id_b", "sim")
    )
