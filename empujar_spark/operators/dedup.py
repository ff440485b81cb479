"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the whole point of these at 100 TB):

- ``exact_dedup``: one hash-groupBy on a fingerprint — a single shuffle on
  an md5 key, uniformly distributed, no skew.
- ``ngram_jaccard_pairs``: exact all-pairs Jaccard computed WITHOUT an O(n²)
  cross join — explode shingles and self-join on the shingle key, so the
  cost is Σ(bucket²) over shingle buckets, and |A∩B| falls out of the join
  count. (An optional frequency cap drops stop-shingles to kill skew.)
- ``minhash_lsh_pairs``: the sub-quadratic path — deterministic md5-derived
  MinHash signatures, banded; candidate pairs share a band bucket. False
  negatives possible by construction (documented); pair verification re-uses
  the exact-Jaccard join.
- ``simhash``: 64-bit (here 32 for SQL-twin arithmetic headroom) weighted
  bit-vote fingerprint; near-dups = small Hamming distance.

All deterministic (md5-based hashing, no Spark-internal hash functions) so
each has an ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from empujar_spark.operators.text import fingerprint, shingles_of_tokens


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by normalized-text fingerprint: one row per
    distinct content with the kept (min) doc_id and the duplicate count."""
    fp = fingerprint(df, text_col)
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups")
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop exact duplicates, keeping the smallest doc_id per content."""
    from pyspark.sql import Window

    fp = fingerprint(df, text_col).join(df, "doc_id")
    keep = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return (
        fp.withColumn("__keep", keep)
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__keep", "fingerprint")
    )


def doc_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-k-gram table.

    Repartitions the input first: document corpora often arrive as few
    large files (locally: ONE file → one task), and the shingle/hash work
    is CPU-bound — without this the whole pipeline serializes on a single
    core regardless of cluster size."""
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(n, "doc_id").select(
        "doc_id",
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )
    return toks.select(
        "doc_id", F.explode(shingles_of_tokens(F.col("__toks"), k)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word-k-gram shingle sets.

    Plan: explode → (optionally drop shingles with document frequency >
    ``max_shingle_freq``: stop-shingle skew control; disabled by default so
    the result stays exact) → self-join on shingle → count shared shingles
    per pair = |A∩B| → join per-doc set sizes → Jaccard. One shuffle on the
    shingle key + one on the pair key; never a cross join.
    """
    sh = doc_shingles(df, text_col, k)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        sh = (
            sh.join(freq.filter(F.col("__df") <= max_shingle_freq), "shingle")
            .drop("__df")
        )
    # Carry |set| alongside each exploded shingle via a window count over
    # doc_id — the explode already hash-partitioned on doc_id, so this
    # adds a sort but NO exchange, and it spares two whole re-derivations
    # of the shingle table (Spark does not share identical subplans across
    # a self-join, so a separate sizes branch re-runs the explode).
    from pyspark.sql import Window

    sh = sh.withColumn(
        "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(
            F.count("*").alias("n_shared"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
        6,
    )
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by shingle containment
    C(A→B) = |S(A)∩S(B)| / |S(A)| — the subset-duplication detector.

    A short document quoted or embedded inside a much longer one has
    near-total containment but a tiny symmetric Jaccard (the union is
    dominated by the container), so Jaccard-threshold dedup never sees
    it; containment is the standard complement (Broder's original
    resemblance/containment pairing). Output one row per DIRECTION that
    crosses the threshold: (contained_id, container_id, n_shared,
    containment) — a near-identical pair emits both directions.

    Plan: identical candidate shape to ngram_jaccard_pairs — explode →
    (optional stop-shingle df-cap) → self-join on the shingle key →
    count shared per unordered pair (ONE pair shuffle) — then the two
    directions are derived from that small aggregated pair table by a
    union of two filters, never a second candidate join. Same 100 TB
    properties: one shuffle on the shingle, one on the pair, no
    cartesian anywhere.
    """
    sh = doc_shingles(df, text_col, k)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        sh = (
            sh.join(freq.filter(F.col("__df") <= max_shingle_freq), "shingle")
            .drop("__df")
        )
    from pyspark.sql import Window

    sh = sh.withColumn(
        "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(
            F.count("*").alias("n_shared"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    # BOTH directions from one pass: a union of two filtered branches
    # would re-run the whole candidate join per branch (Spark shares no
    # subplans across a union) — explode a 2-struct array instead, so
    # the shingle join and pair aggregate execute exactly once.
    c_ab = F.round(F.col("n_shared") / F.col("na").cast("double"), 6)
    c_ba = F.round(F.col("n_shared") / F.col("nb").cast("double"), 6)
    both = shared.select(
        "n_shared",
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("contained_id"),
                    F.col("id_b").alias("container_id"),
                    c_ab.alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("contained_id"),
                    F.col("id_a").alias("container_id"),
                    c_ba.alias("containment"),
                ),
            )
        ).alias("d"),
    )
    return both.filter(F.col("d.containment") >= threshold).select(
        "d.contained_id", "d.container_id", "n_shared", "d.containment"
    )


def history_shingle_table(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """The persistable shingle table for incremental containment:
    (doc_id, shingle, n_sh) — each stored document's distinct k-shingles
    plus its shingle count, built ONCE at ingest and stored clustered on
    ``shingle`` so a batch's candidate join reads only the buckets its
    shingles hash to. Carrying ``n_sh`` on every row costs one long per
    shingle and saves the per-ingest window/join that would otherwise
    re-derive history sizes."""
    sh = doc_shingles(df, text_col, k)
    from pyspark.sql import Window

    return sh.withColumn(
        "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
    )


def containment_incremental_pairs(
    new: DataFrame,
    history: DataFrame | None = None,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    history_shingles: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL asymmetric containment: each incoming document
    against the STORED corpus only — the containment completion of the
    incremental-ingest family (incremental_ingest_dedup catches exact
    re-deliveries, minhash_incremental_pairs near-identical ones; this
    catches subset/superset duplication, which symmetric Jaccard never
    sees when the container is much longer).

    One row per (new, stored) pair where EITHER direction crosses the
    threshold: (new_id, hist_id, n_shared, c_new_in_hist, c_hist_in_new)
    — c_new_in_hist ≥ t means the incoming doc is (near-)contained in a
    stored one (drop/route the new doc), c_hist_in_new ≥ t means a
    stored doc is contained in the incoming one (the new doc supersedes
    it). Both directions come from the ONE pair aggregate; no second
    candidate join, no union-duplicated subplan.

    Steady-state shape: pass ``history_shingles`` (a stored
    :func:`history_shingle_table`, clustered on shingle) instead of
    ``history`` — then the plan shingles ONLY the new batch and the
    history side is a plain scan of the prebuilt table
    (plan-asserted in tests: exactly one shingle explode). With raw
    ``history`` both sides derive from scratch so an end-to-end oracle
    can check values.
    """
    if (history is None) == (history_shingles is None):
        raise ValueError("pass exactly one of history / history_shingles")
    from pyspark.sql import Window

    new_sh = doc_shingles(new, text_col, k).withColumn(
        "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
    )
    h_sh = (
        history_shingles
        if history_shingles is not None
        else history_shingle_table(history, text_col, k)
    )
    shared = (
        new_sh.select(
            F.col("doc_id").alias("new_id"),
            F.col("n_sh").alias("nn"),
            "shingle",
        )
        .join(
            h_sh.select(
                F.col("doc_id").alias("hist_id"),
                F.col("n_sh").alias("nh"),
                "shingle",
            ),
            "shingle",
        )
        .groupBy("new_id", "hist_id")
        .agg(
            F.count("*").alias("n_shared"),
            F.first("nn").alias("nn"),
            F.first("nh").alias("nh"),
        )
    )
    c_new = F.round(F.col("n_shared") / F.col("nn").cast("double"), 6)
    c_hist = F.round(F.col("n_shared") / F.col("nh").cast("double"), 6)
    return (
        shared.withColumn("c_new_in_hist", c_new)
        .withColumn("c_hist_in_new", c_hist)
        .filter(
            (F.col("c_new_in_hist") >= threshold)
            | (F.col("c_hist_in_new") >= threshold)
        )
        .select("new_id", "hist_id", "n_shared", "c_new_in_hist", "c_hist_in_new")
    )


def _md5_bucket(col: Column, seed: int, buckets: int = 2_147_483_647) -> Column:
    """Deterministic 31-bit hash, identical in any engine with md5 + hex
    parsing (the SQL twin uses the same hex window). One md5 digest yields
    FOUR independent 32-bit windows, so seeds 0-3 slice md5('0|'||v) and
    seeds 4-7 slice md5('1|'||v), etc. — whole-stage codegen's
    subexpression elimination then computes num_seeds/4 digests per value
    instead of num_seeds (the md5 is the expensive part; measured ~2× on
    minhash signatures). Seed 0 is bit-identical to the plain
    md5('0|'||v) prefix scheme."""
    h = F.md5(F.concat(F.lit(f"{seed // 4}|"), col))
    off = 1 + 8 * (seed % 4)
    return F.conv(F.substring(h, off, 8), 16, 10).cast("bigint") % buckets


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per doc: for each of ``num_hashes`` seeded hash
    functions, the min over the doc's shingles. Wide layout mh_0..mh_{n-1}.

    One explode + one groupBy: every occurrence is hashed in place (the
    windowed _md5_bucket scheme costs num_hashes/4 digests per shingle,
    CSE-deduped inside codegen) and the mins partial-aggregate map-side —
    the ONLY shuffle is the tiny per-doc signature. This beats hashing the
    distinct vocabulary and joining it back (6× measured): the join
    shuffles every occurrence, which costs far more than md5-ing it."""
    sh = doc_shingles(df, text_col, k)
    hashed = sh.select(
        "doc_id",
        *[
            _md5_bucket(F.col("shingle"), i).alias(f"__h{i}")
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"__h{i}").alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band of
    the MinHash signature. Sub-quadratic: the join key is the band bucket.
    Output: (id_a, id_b, n_bands_shared). False negatives possible —
    verify candidates with ``ngram_jaccard_pairs`` semantics downstream.

    ``max_bucket``: drop band buckets holding more than this many docs
    before the self-join. Candidate cost is Σ(bucket²); one hot bucket —
    a giant near-identical cluster or a degenerate stop-pattern band —
    dominates everything at scale (measured in scripts/stress_skew.py).
    A dropped bucket's pairs usually survive via the cluster's OTHER
    bands; semantics change (more false negatives), so the oracle-gated
    corpus entry keeps the default None and production ingest opts in."""
    sig = minhash_signatures(df, text_col, k, num_hashes)
    banded = _band_table(sig, num_hashes, band_size)
    if max_bucket is not None:
        # windowless cap: count per bucket once, semi-join survivors
        small = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(small, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def _band_table(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(doc_id, band, bucket) from a wide signature — ONE explode, NOT a
    self-union per band (a union would re-evaluate the whole signature
    plan — explode+distinct+join — n_bands times)."""
    n_bands = num_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh_{b * band_size + j}").cast("string")
                    for j in range(band_size)
                ],
            ).alias("bucket"),
        )
        for b in range(n_bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def band_history_table(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The persistable LSH band table for incremental near-dup ingest:
    (doc_id, band, bucket) for every stored document, built ONCE at
    ingest and stored clustered on (band, bucket) so a batch's
    candidate join reads only the buckets its bands hash to — the LSH
    counterpart of :func:`history_shingle_table`."""
    return _band_table(
        minhash_signatures(df, text_col, k, num_hashes), num_hashes, band_size
    )


def minhash_incremental_pairs(
    new: DataFrame,
    history: DataFrame | None = None,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    history_bands: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup candidates: each incoming document against
    the HISTORICAL corpus only — the LSH completion of the exact
    incremental ingest (incremental_ingest_dedup catches byte-identical
    re-deliveries; this catches near-identical ones). Batch-internal
    pairs are out of scope here (run minhash_lsh_pairs on the batch).

    Output: (new_id, hist_id, n_bands_shared).

    Steady-state shape: pass ``history_bands`` (a stored
    :func:`band_history_table`, clustered on (band, bucket)) instead of
    ``history`` — then the plan shingles and hashes ONLY the new batch
    and the history side is a plain scan of the prebuilt table
    (plan-asserted in tests). With raw ``history`` both sides derive
    from scratch so the oracle can check values end-to-end."""
    if (history is None) == (history_bands is None):
        raise ValueError("pass exactly one of history / history_bands")
    bands_new = _band_table(
        minhash_signatures(new, text_col, k, num_hashes), num_hashes, band_size
    ).withColumnRenamed("doc_id", "new_id")
    bands_hist = (
        history_bands
        if history_bands is not None
        else band_history_table(history, text_col, k, num_hashes, band_size)
    ).withColumnRenamed("doc_id", "hist_id")
    return (
        bands_new.join(bands_hist, ["band", "bucket"])
        .groupBy("new_id", "hist_id")
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per-token deterministic hash; bit b of the
    fingerprint is 1 when more tokens have bit b set than not.

    Plan shape for 100 TB: each distinct token is hashed ONCE into a
    per-doc int array, then the bit votes are a single array fold —
    the whole operator is a per-row map with ZERO shuffle. (The naive
    formulation explodes ~|tokens| rows per doc through a 32-aggregate
    groupBy; at corpus scale that shuffle dwarfs the hashing.)

    32 bits keeps every intermediate in exact int64 range for the SQL twin.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    # NULL text is dropped, matching the SQL twin's unnest semantics (the
    # pre-r5 explode formulation dropped such docs implicitly; the per-row
    # fold would otherwise RETAIN them with a NULL simhash that joins
    # oddly in the banding self-join — r5 ADVICE).
    toks = df.repartition(n).filter(F.col(text_col).isNotNull()).select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__toks"),
    )
    # one md5 per distinct token — own projection so the multi-referenced
    # array is not re-evaluated (no CSE inside higher-order lambdas)
    hashed = toks.select(
        "doc_id",
        F.transform(
            F.col("__toks"), lambda t: _md5_bucket(t, 0, 1 << bits)
        ).alias("__hs"),
    )
    return hashed.select(
        "doc_id", _simhash_fold(F.col("__hs"), bits).alias("simhash")
    )


def _simhash_fold(hs: Column, bits: int) -> Column:
    """Fingerprint of an array of ``bits``-bit hashes: bit b is set when
    more array elements have bit b set than not — the SimHash majority
    vote as ONE array fold (per-row map, zero shuffle). Shared by the
    text tokenizer front end (simhash) and the binary byte-shingle front
    end (multimodal.binary_simhash_pairs)."""
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    zero = F.lit(0).cast("bigint")
    # single fold: per hash, bump the per-bit set-count vector
    counts = F.aggregate(
        hs,
        F.array_repeat(zero, bits),
        lambda acc, x: F.zip_with(
            acc,
            masks,
            lambda c, m: c
            + F.when(x.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    # majority vote per bit: set-count ×2 > token-count  ⇔  Σ(±1) > 0
    nt = F.size(hs).cast("bigint")
    return F.aggregate(
        F.zip_with(
            counts, masks, lambda c, m: F.when(c * 2 > nt, m).otherwise(zero)
        ),
        zero,
        lambda acc, x: acc + x,
    )


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Hamming-LSH near-dup pairs over SimHash fingerprints: candidates
    are docs sharing ANY of the ``bands`` equal-width bit windows of the
    signature, exact-Hamming re-checked (``bit_count(a XOR b)``) inside
    the join. Pigeonhole guarantee: a pair within Hamming distance
    bands−1 MUST agree on at least one band, so recall is exact up to
    that distance and probabilistic beyond it — the standard
    Hamming-space LSH trade (Manku et al. 2007, the simhash web-dedup
    paper's block-permutation idea with fixed blocks).

    Plan shape: signatures explode ×bands into (band, window) keys; the
    candidate join is a hash equi-join on those keys (never a cross
    join); the per-pair groupBy dedups multi-band agreements and counts
    them. All shuffles key on well-distributed hash values."""
    # Materialize the signatures once: simhash is now a pure (shuffle-free)
    # map, so without a boundary BOTH self-join sides would re-run the
    # whole hash/fold lineage, ×bands through the explode. The signature
    # relation is tiny ((id, int64) per doc) — at any scale you persist it.
    sig = simhash(df, text_col, bits).localCheckpoint(eager=True)
    return _hamming_lsh_pairs(sig, bits, bands, max_hamming)


def _hamming_lsh_pairs(
    sig: DataFrame, bits: int, bands: int, max_hamming: int
) -> DataFrame:
    """The band-explode + equi-join + exact-Hamming re-check stage of
    simhash_dup_pairs, over any (doc_id, simhash) relation — shared with
    the binary-payload front end. The caller materializes ``sig``."""
    width = bits // bands
    mask = (1 << width) - 1
    bv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for b in range(bands)
            ]
        )
    )
    banded = sig.select("doc_id", "simhash", bv.alias("bv")).select(
        "doc_id", "simhash", "bv.band", "bv.val"
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sig_a"),
        F.col("band").alias("band_a"),
        F.col("val").alias("val_a"),
    )
    b2 = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sig_b"),
        F.col("band").alias("band_b"),
        F.col("val").alias("val_b"),
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    cand = a.join(
        b2,
        (F.col("band_a") == F.col("band_b"))
        & (F.col("val_a") == F.col("val_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (ham <= max_hamming),
    )
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .groupBy("id_a", "id_b")
        .agg(
            F.min("hamming").alias("hamming"),
            F.count(F.lit(1)).alias("n_bands_shared"),
        )
    )


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pipeline: similar pairs → connected components
    → one kept doc per cluster.

    Components run as iterative min-label propagation (the standard
    DataFrame-only connected-components loop): each round every vertex
    takes the min label over itself and its neighbors; converges in
    O(diameter) rounds. Each round is one join + one aggregate — at scale,
    edges shuffle on vertex id and the loop persists the label frontier.
    Output: (doc_id, cluster_id, is_kept) — cluster_id = min doc_id of the
    component, is_kept = 1 for the representative.
    """
    pairs = ngram_jaccard_pairs(df, text_col, k, threshold).select("id_a", "id_b")
    return connected_components(pairs, df.select("doc_id"))


#: rounds the last connected_components call took — read by tests and
#: the stress harness to verify the O(log diameter) claim; a scalar
#: diagnostic, not part of the result contract.
last_cc_rounds: int = 0


def connected_components(
    pairs: DataFrame, ids: DataFrame, small_graph_edges: int = 100_000
) -> DataFrame:
    """Connected components over (id_a, id_b) pairs via min-label
    propagation WITH POINTER JUMPING, labeling every id in ``ids``
    (single column ``doc_id``; isolated ids become singleton clusters
    without ever entering the loop).

    Each round does (1) neighbor-min: every vertex takes the min label
    over itself and its neighbors — one edge join + one aggregate; then
    (2) shortcut: L(v) ← L(L(v)) — one label self-join. Labels are
    initialized to self and only decrease, so L(w) ≤ w always and the
    jump never overshoots a component boundary (L(v) is reachable from
    v by construction, and labels only move along reachable minima).
    The shortcut halves the label-forest depth each round, so
    convergence is O(log diameter) rounds instead of the plain loop's
    O(diameter) — on a 256-path: 9 rounds vs 255 (pinned in tests).
    Four corpus families ride this loop (text near-dup, semantic,
    entity, co-purchase), and at 100 TB round count is the binding
    term: each round is a full edge shuffle, so halving rounds halves
    the dominant cost (the r9 ×16 stress curve measured exactly this).

    Output: (doc_id, cluster_id, is_kept) — cluster_id = component min,
    is_kept = 1 for the representative. The frontier is
    localCheckpointed so lineage stays O(1) per round (memory:
    iterative-loop-lineage).

    SMALL-GRAPH FAST PATH: when the dup subgraph has at most
    ``small_graph_edges`` pairs (the count is free — the symmetrized
    edge set is already materialized), components are solved by
    driver-side union-find on the collected edges and the labels ship
    back as one Arrow batch. At local bench scale the subgraph is a few
    thousand edges and the distributed loop is pure per-round JOB
    OVERHEAD (~0.5s × O(log d) rounds for micro-graphs); at 100 TB the
    dup sliver of a corpus routinely still fits this bound, and when it
    doesn't the iterative loop is the scale path — the same
    threshold-gated shape as a broadcast-join cutoff. The collect is
    bounded by the threshold (default 100k pairs ≈ a few MB); pass
    ``small_graph_edges=0`` to force the loop (the stress harness and
    the round-count tests do, since their subject IS the loop)."""
    # Symmetrize via struct-explode, NOT a self-union: a union would
    # evaluate the whole pair pipeline twice.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    global last_cc_rounds
    last_cc_rounds = 0
    if edges.count() <= 2 * small_graph_edges:  # symmetrized: 2 rows/pair
        clustered = _components_driver(edges)
        return _label_all(ids, clustered)
    # Only vertices that HAVE an edge need iterating — at scale the dup
    # subgraph is a sliver of the corpus; isolated docs are appended as
    # their own singleton cluster at the end, never shuffled per round.
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    while True:
        last_cc_rounds += 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("__nmin"))
        )
        prop = labels.select(
            "doc_id", F.col("cluster_id").alias("__prev")
        ).join(neighbor_min, "doc_id").select(
            "doc_id",
            "__prev",
            F.least(F.col("__prev"), F.col("__nmin")).alias("__mid"),
        )
        # pointer jump: L(v) <- min(L(v), L(L(v))). The left join keys on
        # the CURRENT label value; labels of big components concentrate
        # on few keys, which AQE's skew split spreads at runtime.
        parent = prop.select(
            F.col("doc_id").alias("__pid"), F.col("__mid").alias("__plab")
        )
        updated = (
            prop.join(parent, prop["__mid"] == parent["__pid"], "left")
            .select(
                "doc_id",
                "__prev",
                F.least(
                    F.col("__mid"), F.coalesce(F.col("__plab"), F.col("__mid"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.filter(F.col("cluster_id") < F.col("__prev")).limit(1).count()
        )
        # Rebinding `labels` drops the last Python reference to the
        # previous round's checkpoint; Spark's ContextCleaner then frees
        # its blocks asynchronously, so live checkpoint storage is O(GC
        # lag), not O(rounds) — and the MEMORY_AND_DISK level spills
        # rather than OOMs in the window before cleanup. On a cluster,
        # long-diameter graphs can tighten this with
        # spark.cleaner.periodicGC.interval.
        labels = updated.select("doc_id", "cluster_id")
        if changed == 0:
            break
    return _label_all(ids, labels)


def _components_driver(edges: DataFrame) -> DataFrame:
    """Union-find over a COLLECTED edge set (bounded by the caller's
    ``small_graph_edges`` threshold) — union-by-min keeps every set's
    root at its component minimum, so labels are identical to the
    distributed min-label loop's. Returns (doc_id, cluster_id) for
    every vertex that has an edge; O(E α(V)) driver time, one Arrow
    batch back out."""
    rows = edges.collect()
    src_t = edges.schema["src"].dataType.simpleString()
    if not rows:
        return edges.sparkSession.createDataFrame(
            [], f"doc_id {src_t}, cluster_id {src_t}"
        )
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = find(r[0]), find(r[1])
        if a != b:
            parent[max(a, b)] = min(a, b)  # root stays the component min
    verts = {r[0] for r in rows}
    import pandas as pd

    vs = sorted(verts)
    return edges.sparkSession.createDataFrame(
        pd.DataFrame({"doc_id": vs, "cluster_id": [find(v) for v in vs]})
    )


def _label_all(ids: DataFrame, clustered: DataFrame) -> DataFrame:
    """Attach labels to EVERY id: isolated ids (no edge) become their own
    singleton cluster; is_kept = 1 for each cluster's representative."""
    return (
        ids.select("doc_id")
        .distinct()
        .join(clustered, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_kept"),
        )
    )


def near_dup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Near-dup retention by QUALITY, not by id: within each near-dup
    cluster keep the doc with the most whitespace tokens (the standard
    "keep the longest/most complete variant" heuristic — truncated scrapes
    and snippet mirrors lose to the full document), tie-broken by lowest
    doc_id. near_dup_clusters' min-id representative is arbitrary; a
    training-data pipeline wants the best variant, which is the whole
    point of clustering before dropping.

    Output: (doc_id, cluster_id, n_tokens, is_kept).

    Plan shape for 100 TB: clustering as in near_dup_clusters (the dup
    subgraph is a sliver of the corpus); the token count is one
    expression on the existing scan; the argmax is ONE window shuffle
    keyed on cluster_id — cluster sizes are bounded by the dedup
    semantics themselves, so there is no skewed-giant-partition hazard.

    ``clusters``: optionally pass a precomputed (doc_id, cluster_id)
    assignment — cluster labels are a materialized artifact in any real
    pipeline (computed once per snapshot, consumed by several retention/
    reporting passes), so callers should not re-run label propagation
    per consumer.
    """
    if clusters is None:
        clusters = near_dup_clusters(df, text_col, k, threshold)
    clusters = clusters.select("doc_id", "cluster_id")
    # \s+ tokenization, consistent with text.token_count and every other
    # operator: counting only literal single spaces would rate a 200-token
    # newline-separated document as 1 token and keep a truncated snippet
    # over it — the exact inversion of the keep-the-longest heuristic
    t = F.trim(F.col(text_col))
    ntok = df.select(
        "doc_id",
        F.when(F.coalesce(t, F.lit("")) == "", F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        clusters.join(ntok, "doc_id")
        .withColumn("__rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "n_tokens",
            (F.col("__rn") == 1).cast("int").alias("is_kept"),
        )
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "ivf",
    n_centroids: int | str = 16,
    nprobe: int | None = None,
    centroids=None,
    force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) pairs with cosine ≥
    threshold.

    ``method='ivf'`` (default, the 100 TB shape): candidates come from an
    IVF-bucketed equi-join, never a cross join. Every vector is assigned
    to its nearest coarse centroid; the probe side explodes each vector
    into its ``nprobe`` nearest centroid lists; candidate pairs are the
    (probe ⋈ assignment) equi-join on centroid id, exact-cosine re-scored
    and thresholded. With ``nprobe = n_centroids`` (the default) the
    candidate set is provably complete — a probes every list, so each
    (a < b) pair surfaces exactly once via b's assigned list — making the
    result EXACT while the plan stays a hash-partitioned equi-join (no
    CartesianProduct / BroadcastNestedLoopJoin; asserted in test_plans).
    At production scale run ``nprobe < n_centroids``: each vector then
    scans only nprobe/n_centroids of the corpus — the sub-quadratic,
    recall-tunable regime near-dup thresholds (≥0.9) live in.

    SIZING RULE (measured, scripts/stress.py): ``n_centroids`` must grow
    with the corpus — c ∝ √n keeps inverted-list length (so per-probe
    candidate volume n·nprobe/c) bounded, giving the standard IVF
    O(n^1.5) pair-dedup total. Holding c FIXED makes the candidate join
    O(n²/c): at 8× data the fixed-c curve bent 8.9× while the √n rule
    held ~3.5× (n^1.5) on the same box.

    ``method='exact'``: the brute-force crossJoin baseline, kept ONLY as
    an explicit small-n fallback / oracle cross-check. O(n²) through one
    executor pair at a time — ENFORCED unusable beyond 10⁵ vectors: the
    guard raises unless ``force=True`` (VERDICT r5 item 5).
    """
    from empujar_spark.operators.similarity import (
        _dot, _norm, _nearest_centroids_udf, _guard_brute_force, ivf_train,
    )

    # Spread ONLY under-split inputs (a toy single-file parquet would run
    # the per-row centroid-ranking UDF on one task); at scale the source
    # already has thousands of splits and an unconditional repartition
    # would be a full extra shuffle of the corpus for nothing — the first
    # required exchange is the centroid-id equi-join's.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    spread = df if df.rdd.getNumPartitions() >= n_part else df.repartition(n_part)
    base = spread.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )

    if method == "exact":
        _guard_brute_force(base, "embedding_dup_pairs(method='exact')", force)
        a = base.select(
            F.col("id").alias("id_a"), F.col("vec").alias("va"),
            F.col("nrm").alias("na"),
        )
        b = base.select(
            F.col("id").alias("id_b"), F.col("vec").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        cos = F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        )
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )

    if method != "ivf":
        raise ValueError(f"unknown method {method!r} (use 'ivf' or 'exact')")

    if n_centroids == "auto":
        # the sizing rule above, made executable: c = max(16, ceil(sqrt(n)))
        # — one count() against the id column, cheap next to the job it
        # right-sizes (and the count reuses the parquet footer at best).
        import math

        n_centroids = max(16, math.isqrt(df.count()) + 1)
    nprobe = n_centroids if nprobe is None else nprobe
    exact_recall = nprobe >= n_centroids
    C = (
        centroids
        if centroids is not None
        else ivf_train(df, n_centroids, id_col=id_col, vec_col=vec_col)
    )
    assign = _nearest_centroids_udf(C, 1)
    assigned = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
        assign(F.col("vec"))[0].alias("cid"),
    )
    # Exact-recall probes visit EVERY list — a plain sequence explode, no
    # per-row centroid ranking needed; approximate probes rank centroids.
    probe_cids = (
        F.sequence(F.lit(0), F.lit(n_centroids - 1))
        if exact_recall
        else _nearest_centroids_udf(C, nprobe)(F.col("vec"))
    )
    probes = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        F.explode(probe_cids).alias("cid"),
    )
    # Per-list BLAS re-score (cogroup on cid) — replaces the former
    # equi-join with the cosine fold in its condition: each vector ships
    # once per list instead of once per candidate, and a list×probe
    # block scores as one float64 matmul (see cogrouped_cosine_pairs).
    from empujar_spark.operators.similarity import cogrouped_cosine_pairs

    if exact_recall:
        # Complete candidates: the id_a < id_b mask inside the kernel
        # keeps the single canonical direction of each pair.
        return cogrouped_cosine_pairs(
            assigned, probes, threshold, require="lt"
        )
    # Approximate: a pair can surface in either probe direction (or both,
    # via different lists) — canonicalize and dedup after the re-score;
    # both directions carry the identical rounded cosine, so the
    # surviving set is direction-independent.
    scored = cogrouped_cosine_pairs(assigned, probes, threshold, require="neq")
    return (
        scored.select(
            F.least("id_a", "id_b").alias("pid_a"),
            F.greatest("id_a", "id_b").alias("pid_b"),
            "cosine",
        )
        .dropDuplicates(["pid_a", "pid_b"])
        .select(
            F.col("pid_a").alias("id_a"), F.col("pid_b").alias("id_b"), "cosine"
        )
    )


def segment_dedup(
    df: DataFrame,
    seg_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style span-level exact dedup: split each document into
    consecutive ``seg_tokens``-token segments, keep only the globally
    first occurrence of each distinct segment (ordered by
    (doc_id, seg_idx) — deterministic on any partitioning), and rebuild
    the cleaned text from the surviving segments in order.

    Output: (doc_id, n_segs, n_kept, clean_text). Documents whose text is
    NULL/blank have no segments and are dropped by contract (nothing to
    dedup); n_kept == n_segs means the doc contributed no repeated span.

    This is the span-level companion to ``exact_dedup`` (whole-document)
    — the C4 pipeline removes any repeated three-sentence span corpus-wide
    while keeping one occurrence; here the span unit is a fixed token
    window so it has an exact ANSI-SQL twin.

    Scale shape for 100 TB: the explode is ~n_tokens/seg_tokens rows per
    doc; first-occurrence ranking is ONE shuffle on the span value (md5-
    uniform key space, groups are tiny — dup cardinality per span), and
    reassembly is ONE shuffle back on doc_id with a collect_list bounded
    by document length. No joins, no candidate blowup; both exchanges
    hash-partition on high-cardinality keys.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.filter(F.coalesce(F.trim(F.col(text_col)), F.lit("")) != "")
        .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .withColumn(
            "__nseg",
            F.ceil(F.size("__toks") / F.lit(float(seg_tokens))).cast("int"),
        )
    )
    seg_of = F.transform(
        F.sequence(F.lit(0), F.col("__nseg") - 1),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), i * seg_tokens + 1, seg_tokens), " "
        ),
    )
    segs = base.select(
        "doc_id", F.posexplode(seg_of).alias("seg_idx", "seg")
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("__rn", F.row_number().over(w))
    kept = F.when(
        F.col("__rn") == 1, F.struct(F.col("seg_idx"), F.col("seg"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s.seg
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """Record-linkage candidate pairs: distinct names whose edit distance
    is ≤ ``max_dist``, generated per BLOCK — never all-pairs.

    Classic entity-resolution blocking: an equi-join on a cheap key
    (default: the first whitespace token — swap in soundex/prefix/sorted-
    neighborhood per domain) bounds the quadratic comparison to Σ(block²)
    over DISTINCT names, which is orders of magnitude below row count on
    real entity data (names repeat; dedupe first, link representatives).
    The in-block comparator is Spark's thresholded ``levenshtein`` (banded
    DP, early exit at ``max_dist`` — cost O(max_dist·len), not O(len²)).
    A length-band prefilter would be redundant: |len(a)−len(b)| > max_dist
    already implies dist > max_dist, so the thresholded DP rejects those
    rows in its first band.

    Output: (name_a, name_b, dist) with name_a < name_b — deterministic,
    oracle = the same join with plain ``levenshtein`` in ANSI SQL.
    """
    # the block expression is written over name_col (the caller's column
    # — docstring: swap in soundex/prefix per domain), so evaluate it
    # BEFORE the internal rename, while name_col still resolves
    blk = (
        block
        if block is not None
        else F.substring_index(F.col(name_col), " ", 1)
    )
    names = df.select(
        F.col(name_col).alias("name"), blk.alias("__blk")
    ).distinct()
    a = names.select(F.col("name").alias("name_a"), "__blk")
    b = names.select(F.col("name").alias("name_b"), "__blk")
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    return (
        a.join(b, "__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # thresholded form returns -1 above max_dist
        .select("name_a", "name_b", "dist")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | str = 16,
    nprobe: int | None = None,
    centroids=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540): embedding-cosine near-dup PAIRS → connected
    components → one kept representative per semantic cluster.

    The pair stage is ``embedding_dup_pairs`` — IVF-bucketed candidates
    re-scored exactly, an equi-join on centroid id, never all-pairs. At
    ``nprobe = n_centroids`` the pair set (hence the clustering) is
    provably complete and the whole result stays oracle-exact; at
    production scale run ``nprobe < n_centroids`` and c ∝ √n exactly as
    documented on embedding_dup_pairs. That regime's saving is MEASURED
    on the pair stage in isolation (scripts/stress.py
    semdedup_pairs_exact/_ann — the shared components loop dominates
    whole-operator timings at local scale and masks the exponents):
    full-probe grew 16.1x over a x32 octave span while the nprobe=8 leg
    grew 1.52x — under the √n rule the probed fraction nprobe/c shrinks
    with the corpus, so the ANN pair stage stays near-flat where the
    exact one goes quadratic. Components and retention reuse
    ``connected_components`` — the same loop the text near-dup path runs,
    because once pairs exist the modality is irrelevant.

    Output: (vec_id, cluster_id, is_kept) over ALL input vectors
    (semantically unique vectors are their own singleton cluster).
    """
    pairs = embedding_dup_pairs(
        df, threshold=threshold, id_col=id_col, vec_col=vec_col,
        method="ivf", n_centroids=n_centroids, nprobe=nprobe,
        centroids=centroids,
    ).select("id_a", "id_b")
    ids = df.select(F.col(id_col).alias("doc_id"))
    return connected_components(pairs, ids).select(
        F.col("doc_id").alias(id_col), "cluster_id", "is_kept"
    )


def embedding_incremental_pairs(
    index: dict,
    batch: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs of an incoming BATCH against the ingested
    HISTORY — the embedding analogue of ``minhash_incremental_pairs`` /
    the incremental containment path: at steady state ``index`` is the
    STORED ivf_build_index output (centroids + per-vector assignments,
    read back from the Warehouse), so each load embeds and probes only
    the new batch; history is never re-hashed, re-assigned, or re-normed.

    ``nprobe=None`` probes every list — the candidate set is complete
    (each history vector sits in exactly one assignment list), so the
    result is EXACT and the brute batch×history SQL is the oracle;
    production runs nprobe < n_centroids for the sub-linear regime with
    the same recall story as embedding_dup_pairs.

    Output: (new_id, hist_id, cosine ≥ threshold).
    """
    import numpy as np

    from empujar_spark.operators.similarity import (
        _nearest_centroids_udf, _norm,
    )

    crows = index["centroids"].orderBy("cid").collect()
    C = np.array([r["centroid"] for r in crows], dtype=np.float64)
    n_cent = len(C)
    exact = nprobe is None or nprobe >= n_cent
    probe_cids = (
        F.sequence(F.lit(0), F.lit(n_cent - 1))
        if exact
        else _nearest_centroids_udf(C, nprobe)(F.col("nv"))
    )
    probes = (
        batch.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("new_id"),
            F.col(vec_col).alias("nv"),
            _norm(F.col(vec_col)).alias("nn"),
        )
        .filter(F.col("nn") > 0)
        .select("new_id", "nv", "nn", F.explode(probe_cids).alias("cid"))
    )
    hist = index["assignments"]  # (neighbor_id, c_vec, c_norm, cid)
    # Per-list BLAS re-score, same kernel as embedding_dup_pairs: each
    # history/batch vector ships once per probed list and the list×batch
    # block scores as one float64 matmul (see cogrouped_cosine_pairs).
    from empujar_spark.operators.similarity import cogrouped_cosine_pairs

    scored = cogrouped_cosine_pairs(
        hist.select(
            "cid",
            F.col("neighbor_id").alias("id_b"),
            F.col("c_vec").alias("vb"),
            F.col("c_norm").alias("nb"),
        ),
        probes.select(
            "cid",
            F.col("new_id").alias("id_a"),
            F.col("nv").alias("va"),
            F.col("nn").alias("na"),
        ),
        threshold,
    )
    return scored.select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("hist_id"),
        "cosine",
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    method: str = "exact",
    num_hashes: int = 8,
    band_size: int = 2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """CROSS-TABLE fuzzy join (record linkage / entity resolution): pairs
    of (left row, right row) whose word-k-gram shingle sets reach
    ``threshold`` Jaccard — the dedup machinery generalized from
    "find my own near-duplicates" to "link two relations by approximate
    content" (release-to-release linkage, vendor-feed reconciliation,
    crawl-vs-crawl alignment).

    ``method="exact"``: shingle equi-join across the two frames →
    per-pair intersection counts → Jaccard (the ngram_jaccard_pairs
    plan with two sources). One shuffle on the shingle key + one on the
    pair key, never a cross join; exact, so oracle-pairable.

    ``method="lsh"``: MinHash band tables on both sides join on
    (band, bucket) — per-bucket candidate generation, the sub-quadratic
    100 TB path — then the CANDIDATE PAIRS DRIVE the exact re-score:
    ``cand ⋈ sh_l on left_id ⋈ sh_r on (right_id, shingle)``, so the
    shingle-keyed work is ∝ |candidates| × shingles/doc, never the full
    shingle×shingle join (which would silently re-pay the quadratic
    cost LSH exists to avoid — a pair semi-join applied AFTER a shingle
    equi-join does NOT push below it; tests/test_plans.py asserts the
    lsh plan contains no unfiltered shingle⋈shingle join). Same
    shared-band parameters as minhash_lsh_pairs; false negatives
    possible by construction (a true pair may share no band), so this
    form is recall-pinned against the exact twin in pytest rather than
    oracle-paired — the ANN-twin evidence pattern.

    ``max_shingle_freq``: optional stop-shingle skew cap (the
    ngram_jaccard_pairs precedent) — shingles whose document frequency
    across the UNION of both sides exceeds the cap are dropped before
    set sizes are computed, so Jaccard is over the capped shingle
    universe on both sides symmetrically (oracle-mirrorable). Without
    it a hot shingle shared by f docs per side emits f² rows in exact
    mode — and, inside the candidate re-score, up to |cand| rows per
    hot shingle in lsh mode. Disabled by default so the exact form
    stays a pure Jaccard.

    Output: (left_id, right_id, n_shared, jaccard ≥ threshold)."""
    from pyspark.sql import Window

    # ONE shingle derivation per side: the frequency cap's df aggregate
    # reuses the same frames side() consumes (a second doc_shingles()
    # call would re-run the tokenize/explode tree above the reusable
    # repartition exchange — the r16 code-review catch).
    sh_l0 = doc_shingles(
        left.select(F.col(id_col).alias("doc_id"), text_col), text_col, k
    )
    sh_r0 = doc_shingles(
        right.select(F.col(id_col).alias("doc_id"), text_col), text_col, k
    )
    freq_filter = None
    if max_shingle_freq is not None:
        # No materialization boundary here, deliberately (r16 measured):
        # the static plan re-derives each side's tokenize/shingle tree
        # under every consumer (6 documents scans), but AQE's runtime
        # exchange reuse dedups the identical shuffle subtrees — an
        # explicit localCheckpoint/persist of the shingle frames timed
        # 0.4-10s SLOWER (fresh-session A/B, warm medians 2.48s ckpt /
        # 2.08s base at sf0.1) because it replaces shared exchange
        # files with an extra materialize-and-rescan round trip.
        freq_filter = (
            sh_l0.unionByName(sh_r0)
            .groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_freq)
            .select("shingle")
        )

    def side(sh: DataFrame, name: str) -> DataFrame:
        if freq_filter is not None:
            sh = sh.join(freq_filter, "shingle")
        sh = sh.withColumn(
            "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
        )
        return sh.select(
            F.col("doc_id").alias(f"{name}_id"),
            "shingle",
            F.col("n_sh").alias(f"n_{name}"),
        )

    sh_l, sh_r = side(sh_l0, "left"), side(sh_r0, "right")
    if method == "lsh":
        def bands(df: DataFrame, name: str) -> DataFrame:
            sig = minhash_signatures(
                df.select(F.col(id_col).alias("doc_id"), text_col),
                text_col, k, num_hashes,
            )
            return _band_table(sig, num_hashes, band_size).select(
                F.col("doc_id").alias(f"{name}_id"), "band", "bucket"
            )

        cand = (
            bands(left, "left")
            .join(bands(right, "right"), ["band", "bucket"])
            .select("left_id", "right_id")
            .distinct()
        )
        # Candidates FIRST: expand each candidate pair by the left doc's
        # shingles, then probe the right shingle table on the composite
        # (right_id, shingle) key. Cost ∝ |candidates| × shingles/doc;
        # no shingle-only join key exists anywhere in this branch.
        joined = cand.join(sh_l, "left_id").join(
            sh_r, ["right_id", "shingle"]
        )
    elif method == "exact":
        joined = sh_l.join(sh_r, "shingle")
    else:
        raise ValueError(f"fuzzy_join: unknown method {method!r}")
    shared = joined.groupBy("left_id", "right_id").agg(
        F.count("*").alias("n_shared"),
        F.first("n_left").alias("na"),
        F.first("n_right").alias("nb"),
    )
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
        6,
    )
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "n_shared", "jaccard")
    )


def fuzzy_join_best(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    method: str = "exact",
    num_hashes: int = 8,
    band_size: int = 2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """RESOLVED record linkage: fuzzy_join's candidate pairs reduced to
    ONE best match per left row — the assignment step an entity-
    resolution pipeline runs after candidate scoring (a release-to-
    release link table wants 'v2 doc X IS v1 doc Y', not every pair
    above threshold). Best = highest Jaccard; ties break on n_shared
    descending (more shared evidence wins at equal ratio) then right_id
    ascending, so the assignment is a pure function of the data — the
    dedup_keep_latest determinism rule applied to linkage.

    One row_number window over the pair table partitioned by left_id —
    pair-table-sized, a sliver of the corpus, so the resolution is free
    next to the candidate generation it follows. Same oracle story as
    the underlying mode: exact is SQL-expressible (oracle-paired as
    fuzzy_link_resolved), lsh inherits the recall pin.

    Output: (left_id, right_id, n_shared, jaccard) — at most one row
    per left_id."""
    from pyspark.sql import Window

    pairs = fuzzy_join(
        left, right, text_col, id_col, k, threshold, method,
        num_hashes, band_size, max_shingle_freq,
    )
    w = Window.partitionBy("left_id").orderBy(
        F.col("jaccard").desc(),
        F.col("n_shared").desc(),
        F.col("right_id").asc(),
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
