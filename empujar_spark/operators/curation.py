"""Corpus-curation operators for LLM training-data pipelines.

Beyond the reference's ETL surface (its pipeline stops at warehouse loads,
reference lib/connections/*.js): the quality-filter / packing / mixture
stages a pretraining data pipeline runs between raw ingest and the
tokenizer. Everything here is built-in-function column expressions plus
per-key aggregations — no Python in the hot path — so the ops are
embarrassingly parallel and hold at 100 TB.

Determinism contract: every op has an exact ANSI-SQL twin (plans/corpus.py)
— md5-derived hashing only, rounded doubles, BIGINT casts per the corpus
header rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from empujar_spark.operators.common import HEAVY_KERNEL_BYTES
from empujar_spark.operators.text import _spread, token_count

# PII patterns: RE2-compatible (no lookaround/backrefs) so the Java-regex
# Spark side and the RE2 DuckDB oracle match byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{7,15}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _seeded_hash_key(seed: str, id_col: Column) -> Column:
    """md5(seed || '|' || id) — THE seeded shuffle-order key
    (shard_assignments and token_budget_sample share this single
    definition so their orderings can never silently diverge)."""
    return F.md5(F.concat(F.lit(seed + "|"), id_col.cast("string")))


def _hash_unit(id_col: Column, offset: int, modulus: int) -> Column:
    """Deterministic uniform integer in [0, modulus) from an md5 slice —
    the only cross-engine-stable hash (corpus header rule). Different
    ``offset`` values give independent streams off one md5."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), offset, 8), 16, 10)
        .cast("bigint")
        % modulus
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    carry: list[tuple] = (),
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 repetition filters, re-expressed relationally):

    - ``type_token_ratio``: distinct tokens / tokens (low = repetitive)
    - ``frac_dup_ngrams``: 1 − distinct k-grams / k-gram occurrences
    - ``top_gram_frac``: occurrences of the modal k-gram × k / tokens
      (fraction of the doc covered by its single most repeated phrase)

    Plan shape for 100 TB: every stat — token AND k-gram — is a pure
    per-row array expression, so the whole operator is a single-scan map
    with ZERO shuffle. The k-gram stats that naively need a (doc_id,
    gram) aggregation reduce to array ops on the per-doc gram list:
    occurrences = size, distinct = size∘array_distinct, and the modal
    count = longest equal-run of the SORTED gram array (one
    ``aggregate`` fold). The previous explode design amplified each doc
    into one row PER GRAM (~n_tokens×) through a two-level shuffle; the
    fold does the same work partition-local inside codegen.

    ``carry``: optional [(Column, alias), ...] expressions evaluated on
    the INPUT row and carried through to the output — lets a caller fold
    its own per-row stats (quality ratios, lang-id) into this same
    single scan instead of paying a join (see corpus curated_corpus).
    """
    # HEAVY class: the per-row work is a multi-gram array build + a SORT
    # of the gram array + two aggregate folds (plus whatever regex/char
    # work the caller carries through this same scan) — µs/byte, same
    # class as the winnowing/binary kernels. The r16 default 8 MB slice
    # skipped the fan-out at gate scale and single-partition hashing
    # dominated (driver r16: curated_corpus 0.93s->1.93s; A/B this round:
    # 2.74s->1.53s with the heavy budget).
    df = _spread(df, target_bytes=HEAVY_KERNEL_BYTES)
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    # Materialize the token array in its OWN projection: expression trees
    # inside higher-order lambdas get no common-subexpression elimination,
    # so referencing split() there would re-tokenize the document once per
    # gram (measured 27.8s → 2s at sf0.1). The multi-referenced non-cheap
    # alias also blocks CollapseProject from inlining it back.
    carried = [expr.alias(name) for expr, name in carry]
    carry_names = [name for _, name in carry]
    tok_df = df.select(
        "doc_id",
        *carried,
        # coalesce: NULL text must count as blank (trim(NULL)=='' is
        # NULL, which would silently NULL every downstream stat)
        (F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "").alias("__blank"),
        F.split(norm, " ").alias("__toks"),
    )
    toks = F.col("__toks")
    n_tok = F.when(F.col("__blank"), F.lit(0)).otherwise(F.size(toks))
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    # grams is referenced by three stats — own projection (same CSE rule
    # as __toks above).
    base = tok_df.select(
        "doc_id",
        *carry_names,
        n_tok.cast("bigint").alias("n_tokens"),
        F.when(n_tok == 0, F.lit(0))
        .otherwise(F.size(F.array_distinct(toks)))
        .cast("bigint")
        .alias("n_distinct_tokens"),
        grams.alias("__grams"),
    )
    g = F.col("__grams")
    # Modal-gram count = longest run in the sorted gram array: one linear
    # fold with (prev, run, max) struct state, entirely inside codegen.
    run_state = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("mx"),
    )

    def _run_step(acc, gram):
        run = (
            F.when(acc["prev"].isNotNull() & (gram == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            gram.alias("prev"),
            run.alias("run"),
            F.greatest(acc["mx"], run).alias("mx"),
        )

    stats = base.select(
        "doc_id",
        *carry_names,
        "n_tokens",
        "n_distinct_tokens",
        F.size(g).cast("bigint").alias("n_grams"),
        F.size(F.array_distinct(g)).cast("bigint").alias("n_distinct_grams"),
        F.aggregate(
            F.array_sort(g), run_state, _run_step, lambda acc: acc["mx"]
        ).alias("top_cnt"),
    )
    ng = F.col("n_grams")
    ndg = F.col("n_distinct_grams")
    top = F.col("top_cnt")
    safe_tok = F.when(F.col("n_tokens") == 0, F.lit(1)).otherwise(
        F.col("n_tokens")
    )
    return stats.select(
        "doc_id",
        *carry_names,
        "n_tokens",
        ng.alias("n_grams"),
        F.round(
            F.col("n_distinct_tokens").cast("double")
            / safe_tok.cast("double"),
            4,
        ).alias("type_token_ratio"),
        F.when(ng == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(1.0) - ndg.cast("double") / ng.cast("double"), 4))
        .alias("frac_dup_ngrams"),
        # modal-gram occurrences OVERLAP ('a a a a', k=3 → modal count 2
        # over 4 tokens), so top*k can exceed n_tokens; cap at n_tokens to
        # keep the column a true fraction ≤ 1.0 (thresholds like
        # "drop if > 0.2" assume fraction scale)
        F.round(
            F.least((top * k), F.col("n_tokens")).cast("double")
            / safe_tok.cast("double"),
            4,
        ).alias("top_gram_frac"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing: count then redact emails, E.164-ish phone numbers,
    and IPv4 literals (<EMAIL>/<PHONE>/<IP> placeholders). Counts are
    taken on the ORIGINAL text; replacements are applied in a fixed
    order (email → phone → ip) so the output is deterministic.

    Pure per-row regex map — Spark's regexp_replace replaces all
    occurrences (the DuckDB twin needs the 'g' flag). No shuffle; regexes
    are RE2-safe so both engines match identically. Returns the redacted
    text plus its md5 so downstream hash-compares don't need the payload.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return _spread(df, target_bytes=HEAVY_KERNEL_BYTES).select(
        id_col,
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        redacted.alias("clean_text"),
        F.md5(F.encode(redacted, "UTF-8")).alias("clean_md5"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document a training
    sequence id and token offset, as if the corpus were tokenized,
    concatenated in (shard, id) order, and sliced into ``budget``-token
    sequences — the standard pretraining packing layout.

    Scale design: a single global running sum would funnel 100 TB through
    ONE window partition. Instead documents are md5-sharded into
    ``n_shards`` independent streams and packed within each shard — the
    window partitions by shard, so the sort/scan parallelizes and each
    shard's packing is independent (exactly how multi-worker data loaders
    shard anyway). Offsets are exact: seq_id = ⌊excl_cumsum / budget⌋.
    """
    ntok = token_count(F.col(text_col)).cast("bigint")
    base = df.select(
        id_col,
        _hash_unit(F.col(id_col), 1, n_shards).alias("shard"),
        ntok.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(excl / budget).cast("bigint").alias("seq_id"),
        (excl % budget).cast("bigint").alias("seq_offset"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    scale: int = 10000,
) -> DataFrame:
    """Deterministic domain-mixture downsampling: keep a document iff its
    md5-uniform draw u ∈ [0,1) falls under its domain's sampling weight —
    the reweighting step that turns raw domain counts into a target
    training mixture (DoReMi/Pile-style mixture control, done as a
    stateless filter).

    Domains absent from ``weights`` default to weight 0 (dropped).
    Stateless per-row filter — no shuffle, no state, reproducible across
    runs/partitionings/engines; at 100 TB it composes with partition
    pruning since it touches only (id, domain).
    """
    thresholds = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    u = _hash_unit(F.col(id_col), 9, scale)
    keep = u < F.coalesce(
        thresholds[F.col(domain_col)] * scale, F.lit(0.0)
    )
    return df.filter(keep)


def source_quota_cap(
    df: DataFrame,
    cap: int = 50,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document quota: keep at most ``cap`` docs per source,
    selected by md5(id) rank — the "no single crawl/domain dominates the
    mixture" guard every pretraining pipeline runs before mixing.
    Deterministic: the same ``cap`` docs survive on any engine,
    partitioning or rerun (unlike sample(), and unlike "first N seen",
    which is scan-order-dependent).

    Output: the kept (id, group, quota_rank) rows, quota_rank ∈ [1, cap].

    Plan shape for 100 TB: ONE window shuffle keyed on the group column.
    A mega-source (the skew case this op exists for) makes one heavy
    partition; the scale mitigation is a two-phase prune — per-source
    counts (map-side combinable) pick an md5-prefix threshold ≈
    4·cap/count, the cheap stateless prefilter drops the bulk of the
    mega-source BEFORE the shuffle, and the exact window runs on
    survivors. The md5-rank semantic makes the prune safe: the global
    top-cap rows by hash all sit under any threshold that keeps ≥ cap
    survivors. Single-phase here; the entry documents the threshold
    math for the scale path.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(id_col, group_col)
        .withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= cap)
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.3,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    scale: int = 10000,
) -> DataFrame:
    """Temperature-scaled mixture resampling: keep probability per source
    ∝ n_s^(alpha-1), normalized so the expected kept volume is
    ``target_frac`` of the corpus — the multilingual/domain rebalancing
    (alpha≈0.3) that upweights small sources and flattens mega-crawls,
    where mixture_sample's FIXED weights need the operator to be told the
    answer, this one derives it from the observed source distribution.
    Rates clamp at 1.0 (a tiny source is never oversampled past itself;
    true epoch-multiplying upsampling is a training-loader concern).

    Output: (doc_id, source, keep_rate) for surviving docs; keep_rate is
    the source's sampling probability rounded to 6 (hash-stable).

    Plan shape for 100 TB: the source histogram is one tiny aggregation;
    its closed-form per-source rate table (|sources| rows) broadcasts
    back onto the corpus, and the keep decision is the stateless
    md5-uniform draw mixture_sample uses — no shuffle of the data stream,
    reproducible on any engine/partitioning/rerun.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_s"))
    tot = counts.agg(
        F.sum("__n_s").alias("__N"),
        F.sum(F.pow(F.col("__n_s").cast("double"), F.lit(alpha))).alias(
            "__W"
        ),
    )
    n_s = F.col("__n_s").cast("double")
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("__N").cast("double")
            / F.col("__W")
            * F.pow(n_s, F.lit(alpha))
            / n_s,
        ).alias("__p"),
    )
    u = _hash_unit(F.col(id_col), 9, scale)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(u < F.col("__p") * scale)
        .select(id_col, source_col, F.round("__p", 6).alias("keep_rate"))
    )


def quality_median_filter(
    df: DataFrame,
    score: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source median quality gate: keep documents whose quality
    ``score`` is at or above their OWN source's median — the
    domain-relative curation cut (an absolute threshold over-prunes
    clean domains and under-prunes noisy ones; each crawl competes
    against itself).

    Output: (doc_id, source, score) for survivors, score rounded to 6 dp
    (the rounding happens BEFORE the median so the interpolated boundary
    is cross-engine stable).

    Scale shape: the exact interpolated median collapses to |sources|
    rows that BROADCAST onto a second scan — no global window, no sort
    of the corpus; swap `approx_percentile` in at unbounded per-source
    cardinality (same caveat as winsorized_stats/quantiles).
    """
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.round(score, 6).alias("score"),
    )
    med = scored.groupBy("source").agg(
        F.round(F.percentile("score", F.lit(0.5)), 6).alias("__med")
    )
    return (
        scored.join(F.broadcast(med), "source")
        .filter(F.col("score") >= F.col("__med"))
        .select("doc_id", "source", "score")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuf1",
) -> DataFrame:
    """Deterministic seeded global shuffle + shard assignment — the
    training-dataloader layout step: every row gets a shard and a
    position within it, both pure functions of (seed, id).

    Unlike ``df.orderBy(rand())`` (partition-layout dependent, different
    every run) the md5 ordering is reproducible on any engine and any
    partitioning — re-running the pipeline yields byte-identical epoch
    order, which is what makes a training run repeatable. Changing the
    seed re-deals every shard.

    Plan: one hash shuffle on the shard id + an in-partition sort (the
    window never crosses shards). Size n_shards so a shard fits an
    executor partition — dataloader sharding wants thousands of shards
    at 100 TB anyway, which keeps each sort small.

    Output: (id, shard, pos) with pos = 1..|shard| in md5 order,
    id as tiebreak on the (astronomically unlikely) digest collision.
    """
    hk = _seeded_hash_key(seed, F.col(id_col))
    shard = (
        F.conv(F.substring(hk, 1, 8), 16, 10).cast("bigint") % n_shards
    )
    w = Window.partitionBy("shard").orderBy("hk", id_col)
    return (
        df.select(F.col(id_col), hk.alias("hk"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def dsir_importance(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    n_max: int = 1,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio of its hashed unigram features under the
    TARGET distribution (docs matching ``target_pred``) vs the RAW corpus
    distribution — the importance weight a curation pass resamples on to
    tilt a web-scale crawl toward a high-quality / in-domain target set
    without training a classifier. Add-one smoothing on both sides keeps
    unseen buckets finite.

    ``n_max`` picks the feature set: 1 = hashed unigrams, 2 = hashed
    unigrams AND bigrams (the paper's reference setup — Xie et al. hash
    unigram+bigram counts into a fixed bucket space). Bigrams come from
    ONE zip_with slide over the token array (the bigram_doc_score
    spelling, text.py), never a self-join, so the plan is identical in
    shape — only the exploded feature stream is ~2× longer.

    Output: (id_col, n_tokens, lr_score) — n_tokens counts the FEATURES
    scored (unigrams + bigrams at n_max=2); lr_score > 0 means the doc
    looks more like the target than like the raw corpus; rank or
    threshold on it to select. Deterministic: features are md5-hashed
    token buckets, per-bucket weights are quantized to 1e-6 BEFORE the
    per-doc sum and the sum re-snaps to the same 1e-6 grid (a sum of
    grid multiples is a grid multiple up to ~1e-11 accumulation wobble;
    a COARSER final round would instead park every 50-ending sum on a
    half-way tie where engines disagree), so the score is reproducible
    on any engine / partitioning (exact SQL twin in the corpus).

    Plan shape for 100 TB: two passes over the token stream — (1) one
    explode + groupBy(bucket) that partial-aggregates down to
    ``n_buckets`` rows (map-side combine does almost all the work; both
    the raw and target counts ride the SAME aggregation via a
    conditional sum, so the stats pass is one shuffle of 256 rows), and
    (2) the scoring pass, where the 256-row weight table broadcast-joins
    onto the token stream and a groupBy(doc) sums — no shuffle wider
    than the corpus itself, no driver-side state beyond the weight
    table. That is the canonical DSIR layout: the n-gram statistics fit
    in one machine by construction (fixed bucket count), only the
    corpus stays distributed.
    """
    if n_max not in (1, 2):
        raise ValueError(f"n_max must be 1 or 2, got {n_max}")
    # The bigram form is heavy-kernel class (zip_with concat + ~2× the
    # md5-per-feature work): fanning out even sub-MB inputs measured
    # 1.68s→1.12s at sf0.1. The unigram kernel is light enough that the
    # round-robin exchange costs more than it parallelizes (1.05s→1.21s
    # measured) — keep the size-derived default there.
    df = _spread(
        df, target_bytes=HEAVY_KERNEL_BYTES if n_max == 2 else None
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    toks_arr = F.filter(F.split(norm, " "), lambda x: x != "")
    if n_max == 2:
        arr = F.col("__toks")
        # greatest(…, 0) keeps slice's length argument legal for 0/1-
        # token docs (empty gram list) instead of an ANSI runtime error
        glen = F.greatest(F.size(arr) - 1, F.lit(0))
        grams = F.zip_with(
            F.slice(arr, 1, glen),
            F.slice(arr, 2, glen),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        feats = F.concat(arr, grams)
    else:
        feats = F.col("__toks")
    toks = (
        df.select(
            F.col(id_col),
            target_pred.alias("__tgt"),
            toks_arr.alias("__toks"),
        )
        .select(
            F.col(id_col), F.col("__tgt"), F.explode(feats).alias("__tok")
        )
    )
    bucketed = toks.select(
        id_col,
        "__tgt",
        (
            F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10)
            .cast("bigint")
            % n_buckets
        ).alias("__b"),
    )
    # Reduce the feature stream to per-(doc, bucket) counts FIRST (the
    # unigram_doc_score r16 pattern): bucket count per doc is capped at
    # ``n_buckets``, so this relation is ≤ |docs|·n_buckets rows at ANY
    # corpus size, its subtree ends in an exchange (AQE exchange reuse
    # shares the single tokenize+hash pass between the stats aggregate
    # and the scoring join), and the per-doc score sums cnt·w over ≤256
    # grid-quantized terms instead of one w per occurrence — same 1e-6
    # re-snap, values verified oracle-exact at sf0.001/0.01/0.1.
    bucketed = bucketed.groupBy(id_col, "__tgt", "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    stats = bucketed.groupBy("__b").agg(
        F.sum("__cnt").cast("bigint").alias("__n_raw"),
        F.sum(F.when(F.col("__tgt"), F.col("__cnt")).otherwise(0))
        .cast("bigint")
        .alias("__n_tgt"),
    )
    totals = stats.agg(
        F.sum("__n_raw").cast("bigint").alias("__R"),
        F.sum("__n_tgt").cast("bigint").alias("__T"),
    )
    weights = stats.crossJoin(F.broadcast(totals)).select(
        "__b",
        F.round(
            F.log(
                (F.col("__n_tgt") + F.lit(1.0))
                / (F.col("__T") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("__n_raw") + F.lit(1.0))
                / (F.col("__R") + F.lit(float(n_buckets)))
            ),
            6,
        ).alias("__w"),
    )
    return (
        bucketed.join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("__cnt") * F.col("__w")), 6).alias(
                "lr_score"
            ),
        )
    )


def importance_resample(
    df: DataFrame,
    k: int,
    score_col: str = "lr_score",
    id_col: str = "doc_id",
    temperature: float = 1.0,
) -> DataFrame:
    """Sample ``k`` rows WITHOUT replacement with probability ∝
    exp(score/temperature) — the RESAMPLING half of DSIR (Xie et al.
    2023 select by sampling on the importance weight, not by
    thresholding, precisely so the tail keeps probability mass) and the
    generic weighted corpus draw (quality-tilted subsets, temperature-
    flattened mixtures).

    Gumbel top-k: argtop-k of score/T + Gumbel noise is a without-
    replacement sample from softmax(score/T) — but the noise here is
    DETERMINISTIC, derived from md5(id) like every sampling decision in
    this engine (hash_sample, stratified_split): u = (h + 0.5) / 2^52
    with h the first 13 md5 hex digits (52 bits — exact in a double on
    any engine), g = −ln(−ln u). A doc keeps its noise forever, so the
    draw is reproducible across engines, partitionings and reruns, and
    stable under corpus growth. The key rounds to 1e-9 (ln's last-ulp
    engine wobble sits ~1e-16 relative, far under the grid) and ties
    break on id, so the selected SET is engine-exact. NULL scores are
    excluded (they cannot carry a sampling weight).

    Plan shape for 100 TB: a pure per-row projection followed by a
    global top-k — Spark spells that TakeOrderedAndProject (per-
    partition top-k, then a k·P-row driver merge), never a full sort.

    Output: the sampled rows with their ``resample_key`` appended,
    top-k by (key desc, id asc).
    """
    key = _gumbel_key(score_col, id_col, temperature)
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(*df.columns, key.alias("resample_key"))
        .orderBy(F.col("resample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _gumbel_key(score_col: str, id_col: str, temperature: float) -> Column:
    """score/T + deterministic Gumbel noise off md5(id) — the shared
    sampling key of importance_resample and its grouped twin. 13 md5 hex
    digits give a 52-bit integer (exact in a double on any engine);
    u = (h + 0.5)/2^52 stays strictly inside (0, 1) so both logs are
    finite; the key rounds to 1e-9 (ln's last-ulp engine wobble is
    ~1e-16 relative, far under the grid)."""
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("resample-1:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
    )
    u = (h + F.lit(0.5)) / F.lit(float(1 << 52))
    return F.round(
        F.col(score_col) / F.lit(float(temperature)) - F.log(-F.log(u)), 9
    )


def importance_resample_grouped(
    df: DataFrame,
    k: int,
    group_col: str,
    score_col: str = "lr_score",
    id_col: str = "doc_id",
    temperature: float = 1.0,
) -> DataFrame:
    """Per-GROUP Gumbel top-k: within every group (source, domain,
    language), sample ``k`` rows without replacement with probability ∝
    exp(score/T) — the weighted quota fill (domain_quota_sample picks
    deterministic top-N by hash; this draws ∝ importance weight, so a
    domain's best documents are likelier but not certain, preserving
    tail diversity inside each quota — Xie et al.'s resampling argument
    applied per stratum).

    Same deterministic key as importance_resample (shared _gumbel_key);
    the global TakeOrdered becomes a per-group window row_number — one
    shuffle on the group key, state bounded by the window's single pass.
    Groups with fewer than ``k`` scored rows keep them all. Output: the
    sampled rows + resample_key.
    """
    key = _gumbel_key(score_col, id_col, temperature)
    w = Window.partitionBy(group_col).orderBy(
        F.col("resample_key").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(*df.columns, key.alias("resample_key"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def eval_gram_set(
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """The DISTINCT word-n-gram set of an evaluation/benchmark corpus —
    exactly the frame :func:`ngram_contamination` derives internally.
    Exposed so a caller checking MANY batches against one frozen eval
    set (the streaming contamination gate) can build it once, persist
    it, and pass it via ``eval_grams=`` instead of re-deriving the
    explode + distinct per batch."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    g = F.transform(
        F.sequence(F.lit(1), F.size("__t") - n + 1),
        lambda i: F.concat_ws(" ", F.slice("__t", i, n)),
    )
    return (
        eval_docs.select(toks.alias("__t"))
        .filter(F.size("__t") >= n)
        .select(F.explode(g).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark DECONTAMINATION rate audit (the GPT-3 appendix-C /
    PaLM-style check): flag training documents sharing any word n-gram
    with an evaluation/benchmark set, so test data can be excised from
    the corpus before training instead of leaking into it. Exact
    collision on normalized (lowercased, whitespace-split) n-grams —
    the industry-standard 8-13 gram window; no fuzziness, by design:
    a single shared n-gram of that length is decisive evidence.

    Division of labor with ``text.benchmark_contamination`` (the r02
    flag variant, deliberately kept): that one counts DISTINCT shared
    grams — the cheap yes/no leak detector; this one counts POSITIONS
    (how much of each doc is covered by leaked grams), the signal a
    pipeline thresholds on to decide excise-the-span vs drop-the-doc,
    and the batch twin the streaming ingest gate
    (stream_ops.contamination_gate_stream) accumulates.

    Per scanned document: ``n_grams`` (positions), ``n_hits`` (positions
    whose gram appears ANYWHERE in the eval set), ``hit_rate``
    (n_hits/n_grams, 1e-6-quantized) and ``contaminated`` (any hit).
    Documents shorter than ``n`` tokens carry zero grams and report
    (0, 0, 0.0, false) — too short to collide at this window size.

    Plan shape for 100 TB: the eval side is benchmark-sized (thousands
    of documents), so its DISTINCT gram set builds in one tiny scan and
    BROADCASTS; the corpus side is one scan whose per-row gram explode
    (bounded by doc length) hash-joins the broadcast set and re-groups
    by document with map-side combine — no corpus-wide shuffle of
    anything wider than (doc_id, hit) partials. The left join back to
    the per-doc gram counts keeps zero-hit documents visible (the audit
    must show what was CHECKED, not only what was caught).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    def grams(df: DataFrame, with_id: bool) -> DataFrame:
        g = F.transform(
            F.sequence(F.lit(1), F.size("__t") - n + 1),
            lambda i: F.concat_ws(" ", F.slice("__t", i, n)),
        )
        base = df.select(
            *([F.col(id_col)] if with_id else []), toks.alias("__t")
        ).filter(F.size("__t") >= n)
        return base.select(
            *([id_col] if with_id else []), F.explode(g).alias("gram")
        )

    if eval_grams is None:
        # identical construction to eval_gram_set (kept inline so the
        # default single-shot call builds its own tiny broadcast side)
        eval_grams = grams(eval_docs, with_id=False).distinct()
    # ONE corpus gram pass: left-broadcast-join the eval set and count
    # positions and hits in the same aggregate (a separate hits branch
    # would re-scan and re-explode the whole corpus — measured as the
    # difference between 2 and 1 corpus gram scans in the plan, pinned
    # in tests/test_plans.py)
    per_doc = (
        grams(docs, with_id=True)
        .join(
            F.broadcast(eval_grams.withColumn("__hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("__hit").cast("bigint").alias("n_hits"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .fillna(0, subset=["n_grams", "n_hits"])
        .select(
            id_col,
            "n_grams",
            "n_hits",
            F.round(
                F.when(F.col("n_grams") > 0,
                       F.col("n_hits") / F.col("n_grams"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("hit_rate"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Token-level blocklist gate — the C4-style "bad words" filter
    every public pretrain pipeline runs (C4 dropped any page containing
    a term from the List-of-Dirty-Naughty-Obscene-etc list; policy/
    compliance blocklists use the same mechanism). A document is
    flagged when ANY normalized whitespace token exactly equals a
    blocked term — token-exact matching, so 'class' never trips a
    blocklist that contains 'ass' (the substring false-positive the
    naive LIKE approach suffers).

    Plan: a PURE per-row projection — the blocklist becomes an array
    literal inside a higher-order ``filter`` over the token split, so
    there is no explode, no shuffle, no broadcast table and no Python;
    at 100 TB the gate rides the ingest scan for free. Blocklists are
    small by nature (thousands of terms); a list too large for a plan
    literal would switch to the explode + broadcast-join form with the
    same semantics.

    Adds ``n_blocked`` (count of blocked token occurrences) and
    ``blocked`` (any hit) — callers filter on ``~blocked`` to enforce,
    or keep both columns as the audit. ``blocked_count_col`` exposes
    the count as a bare Column for composing into an existing
    projection (the pretrain book rides it on the curate chapter's
    single signal scan via repetition_signals' carry hook)."""
    n_blocked = blocked_count_col(F.col(text_col), terms)
    return df.withColumn("n_blocked", n_blocked).withColumn(
        "blocked", n_blocked > 0
    )


def blocked_count_col(text: Column, terms: list[str]) -> Column:
    """Count of blocked token occurrences as a pure COLUMN expression —
    the blocklist_filter kernel, composable into any projection."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    toks = F.when(
        F.coalesce(F.trim(text), F.lit("")) == "",
        F.array().cast("array<string>"),
    ).otherwise(F.split(norm, " "))
    blocked_arr = F.array(*[F.lit(t.lower()) for t in terms])
    return F.size(
        F.filter(toks, lambda t: F.array_contains(blocked_arr, t))
    ).cast("bigint")


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partition by LM-quality
    score (Wenzek et al. 2020): CCNet scores every document with a
    cheap language model, splits the corpus at fixed perplexity
    quantiles, and downstream consumers sample by bucket (head = most
    fluent). Here the score is unigram_doc_score's mean corpus
    token frequency (its documented perplexity stand-in — higher =
    more fluent), and the bucket edges are the EXACT interpolated
    corpus quantiles at ``cuts``.

    Plan: the scoring pass (vocabulary aggregate broadcast onto one
    occurrence stream, the unigram_doc_score shape) plus ONE tiny
    2-value quantile aggregate whose single row broadcasts back onto
    the scored frame — no extra corpus scan, no window. Thresholds are
    1e-6-quantized (Spark percentile ≡ DuckDB quantile_cont, the
    quantiles-entry equivalence) and scores are exact integer-ratio
    doubles, so the assignment is engine-exact and oracle-paired.

    Output: scored columns + (bucket ∈ head|middle|tail)."""
    from empujar_spark.operators.text import unigram_doc_score

    # scored is consumed twice (the quantile aggregate and the bucket
    # projection) and Spark shares no subplans — without a boundary the
    # whole scoring tree (tokenize + vocab aggregate + scoring join) ran
    # twice (6 documents scans in the compiled plan). Materialize the
    # per-doc scored frame once; it is corpus-row-sized and slim (4
    # columns), so at cluster scale this is persist(MEMORY_AND_DISK) on
    # the standard scored-corpus intermediate.
    scored = unigram_doc_score(df, text_col, id_col).localCheckpoint(
        eager=True
    )
    lo_q, hi_q = float(cuts[0]), float(cuts[1])
    thresholds = scored.agg(
        F.round(
            F.percentile(F.col("mean_token_freq"), F.lit(lo_q)), 6
        ).alias("__lo"),
        F.round(
            F.percentile(F.col("mean_token_freq"), F.lit(hi_q)), 6
        ).alias("__hi"),
    )
    bucket = (
        F.when(F.col("mean_token_freq") >= F.col("__hi"), F.lit("head"))
        .when(F.col("mean_token_freq") >= F.col("__lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .withColumn("bucket", bucket)
        .drop("__lo", "__hi")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "tbs1",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic TOKEN-BUDGET subsample — "give me a ~10B-token
    subset of this corpus": documents are taken in seeded md5-hash
    order (a reproducible uniform shuffle, the shard_assignments rule)
    until the running token total reaches ``budget``; the last admitted
    doc may overshoot (docs are atomic). Pure function of
    (seed, budget, data) — rerunning, repartitioning, or growing the
    corpus with later-hashing docs yields the identical subset, which
    is what makes a sampled pretraining mix auditable.

    The 100 TB plan is a DISTRIBUTED PREFIX SUM, because the naive form
    — one window cumsum over the global hash order — funnels the whole
    corpus through a single-partition sort:

    1. one SLIM projection (id, hash key, bucket = the hash key's
       leading hex digits — ``n_buckets`` lexicographic ranges of the
       md5 space, so bucket order IS global hash order, and per-doc
       token count), localCheckpointed: ~40 bytes/row at any corpus
       size, and the snapshot guarantees the offsets and the cumsum
       read the SAME rows even over a nondeterministic source;
    2. one groupBy(bucket) aggregate → per-bucket token totals —
       n_buckets rows, collected driver-side (bounded by construction);
    3. exclusive bucket offsets via a tiny Python scan, broadcast back;
    4. per-bucket window cumsum (+ offset) — each window sorts only its
       bucket, ~corpus/n_buckets rows, embarrassingly parallel.

    Admission rule: keep while (offset + intra-bucket cumsum) − the
    doc's own tokens < budget, i.e. every doc whose PREDECESSOR total
    leaves room — the "first doc to cross the line is still admitted"
    convention, so the result is nonempty whenever budget > 0.

    Output: (id, n_tokens, cum_tokens) for admitted docs only."""
    hk = _seeded_hash_key(seed, F.col(id_col))
    # hex digits covering n_buckets ranges: ceil(bit_length/4) — e.g.
    # 256 → 2 digits, 4096 → 3 (the old `//4 + 1` overshot by one digit
    # for power-of-16 counts, 16x the documented collect; r16 review)
    n_hex = max(1, ((n_buckets - 1).bit_length() + 3) // 4)
    toks = df.select(
        F.col(id_col),
        hk.alias("__hk"),
        F.substring(hk, 1, n_hex).alias("__bucket"),
        # NULL text counts 0 tokens (the token_count blank convention
        # extended to NULL) — otherwise a NULL would both poison its
        # bucket total (sum → NULL → driver TypeError) and silently
        # vanish from the output
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    # Materialize before the totals collect: the offsets and the cumsum
    # leg MUST see the same rows — two independent evaluations of a
    # nondeterministic source (a sample(), a re-optimized shuffle) could
    # freeze offsets from different rows than the prefix they anchor,
    # breaking the global-prefix-sum invariant with no error. Also
    # spares the corpus a second scan+tokenize (the monitor book's
    # load_snapshots precedent).
    toks = toks.localCheckpoint(eager=True)
    per_bucket = (
        toks.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__bucket_total"))
        .collect()
    )
    offsets, running = {}, 0
    for row in sorted(per_bucket, key=lambda r: r["__bucket"]):
        offsets[row["__bucket"]] = running
        running += row["__bucket_total"]
    off_df = toks.sparkSession.createDataFrame(
        [(b, o) for b, o in offsets.items()],
        "__bucket string, __offset bigint",
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__hk", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        toks.join(F.broadcast(off_df), "__bucket")
        .withColumn(
            "cum_tokens", (F.col("__offset") + F.sum("n_tokens").over(w))
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(id_col, "n_tokens", "cum_tokens")
    )
    return out
