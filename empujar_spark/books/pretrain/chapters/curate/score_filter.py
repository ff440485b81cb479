"""CURATE chapter (priority 200): single-scan signal computation →
documents_scored, then the filter chain → documents_curated.

Same signal plan shape as the curated_corpus entry: quality ratios and
lang-id ride the repetition operator's projection via its ``carry``
hook — ONE scan, zero joins.

Why two tables: filtering DIRECTLY on the scored projection is a plan
trap — Catalyst pushes the predicate through the projection chain and
below the parallelism spread, re-expressing frac_dup_ngrams over raw
text so the whole gram fold runs twice, once single-core inside the
pushed filter (measured 10.6s vs 0.6s at sf0.1; see git history).
Persisting the scored corpus makes the boundary explicit: signals are
computed exactly once, the filter runs over the parquet scan where
predicate pushdown on the (now plain) stat columns is a BENEFIT, and
the scored table itself is the audit/threshold-tuning artifact a data
team keeps anyway.

Why the scored table is SLIM (doc_id + signals, no text): carrying the
corpus text through documents_scored would write — and re-scan — the
heaviest column twice. Instead the filter runs on the slim stat
parquet (pushdown on plain columns) and the survivors equi-join back
to the documents table on doc_id to pick up text for the curated
write. At 100 TB that halves the pipeline's dominant IO; the join is
one co-partitioned shuffle on the primary key versus a full second
copy of the corpus.

FROZEN CLASSIFIER LEG (opt-in, r16 / VERDICT r15 item 4): a book that
sets ``book.frozen_quality_classifier = True`` also gates survivors
through the committed frozen-weights quality student
(operators/classifier.py FROZEN_QUALITY_WEIGHTS via score_linear) —
one whole-stage-codegen projection over the scored table's OWN
quantized signal columns (lt = round(ln(1+n_tokens), 6),
ar = alpha_ratio as written, 4dp), no MLlib and no second corpus scan
at serve, so the filter decisions are hash-reproducible across reruns
and engines (the quality_classifier_filter_frozen corpus entry is the
oracle-paired twin of this decision). Off by default: the rule-only
chain stays bit-identical.
"""

from pyspark.sql import functions as F


def chapter_loader(book):
    from empujar_spark.operators import curation as C
    from empujar_spark.operators import text as X

    chapter = book.add_chapter(200, "curate")
    wh = book.destination

    def score_and_filter():
        docs = wh.read("documents")
        t = F.col("text")
        cls = X.char_classes(t)
        n = cls["n_chars"]
        safe_n = F.when(n == 0, F.lit(1)).otherwise(n).cast("double")
        lang_pred, _hits = X.lang_cols(t)
        # BLOCKLIST LEG (opt-in, r16): a book that sets ``book.blocklist``
        # (a term list) rides the C4-style token-exact gate on the SAME
        # single corpus scan — the blocked count is a pure column
        # expression (curation.blocked_count_col), so it joins the
        # signal projection through the carry hook for free and the
        # filter below reads it like any other stat column.
        terms = getattr(book, "blocklist", None)
        carry = [
            (F.col("source"), "source"),
            (F.round(cls["n_alpha"].cast("double") / safe_n, 4), "alpha_ratio"),
            (lang_pred, "lang_pred"),
        ]
        cols = ["doc_id", "source", "lang_pred", "n_tokens",
                "alpha_ratio", "frac_dup_ngrams"]
        if terms:
            carry.append((C.blocked_count_col(t, list(terms)), "n_blocked"))
            cols.append("n_blocked")
        scored = C.repetition_signals(docs, carry=carry).select(*cols)
        wh.insert_data("documents_scored", scored, merge_key="doc_id")
        kept = wh.read("documents_scored").filter(
            F.col("n_tokens").between(10, 5000)
            & (F.col("alpha_ratio") >= 0.5)
            & (F.col("frac_dup_ngrams") <= 0.9)
            & (F.col("lang_pred") != "und")
        )
        if terms:
            kept = kept.filter(F.col("n_blocked") == 0)
        if getattr(book, "frozen_quality_classifier", False):
            from empujar_spark.operators import classifier as CL

            w = CL.FROZEN_QUALITY_WEIGHTS
            kept = (
                CL.score_linear(
                    kept.withColumn(
                        "lt", F.round(F.log1p(F.col("n_tokens")), 6)
                    ).withColumn("ar", F.col("alpha_ratio")),
                    {"lt": w["lt"], "ar": w["ar"]},
                    bias=w["bias"],
                    out_col="q_score",
                )
                .filter(F.col("q_score_pred") == "keep")
                .drop("lt", "ar", "q_score_pred")
            )
        curated = kept.join(docs.select("doc_id", "text"), "doc_id")
        wh.insert_data("documents_curated", curated, merge_key="doc_id")

    chapter.add_page("score+filter", score_and_filter)
