"""DECONTAM chapter (priority 250): benchmark decontamination between
curate and span-dedup — the GPT-3 appendix-C gate every serious
pretraining pipeline runs. Training documents sharing any exact
normalized 8-gram with the benchmark slice (doc_id % 97 of the raw
source, standing in for an external eval suite) are DROPPED before the
expensive span-dedup/pack stages, and the full rate audit
(operators/curation.py ngram_contamination — positions, hits, hit_rate
per CURATED doc, zero-hit docs included) persists to
``contamination_audit`` so the excision is reviewable.

Ordering rationale: after curate (no point gram-scanning documents the
quality gate already dropped), before span-dedup (a contaminated doc
must not claim first-occurrence of a span another clean doc also
carries). ``documents_decontam`` is REPLACED each run (the drop set is
a pure function of curated × benchmark — replace keeps reruns
idempotent where an upsert could never delete a doc that became
contaminated when the benchmark grew).

SEMANTIC LEG (opt-in, r15): exact n-grams miss paraphrased leaks. A
book that sets ``book.semantic_decontam_threshold`` (cosine, e.g. 0.95
against a trained encoder) also runs embedding_decontam — the curated
docs' embeddings (the ingested embeddings table, vec_id = doc_id in
this testdata's shared id space) against the benchmark slice's vectors
— persists the hits to ``semantic_contamination_audit``, and excises
BOTH drop sets in the one ``documents_decontam`` replace (single
writer per table, the monitor-book cardinality rule). Off by default:
pipelines without embeddings (or without a calibrated threshold) keep
the n-gram-only behavior bit-identical.
"""

from pyspark.sql import functions as F


def chapter_loader(book):
    from empujar_spark.operators.curation import ngram_contamination
    from empujar_spark.plans.corpus import load

    chapter = book.add_chapter(250, "decontam")
    wh = book.destination

    def decontaminate():
        curated = wh.read("documents_curated")
        bench = load(book.spark, book.source_dir, "documents").filter(
            F.col("doc_id") % 97 == 0
        )
        # persist: the audit plan (corpus gram scan + broadcast
        # eval-gram join, ~1.4s/run at sf0.1) is consumed twice — the
        # audit upsert and the drop-set filter — and Spark shares no
        # subplans across the two. Slim per-doc rows; released after
        # the decontam replace commits.
        audit = ngram_contamination(curated, bench, n=8).persist()
        wh.insert_data("contamination_audit", audit, merge_key="doc_id")
        flagged = audit.filter(F.col("contaminated")).select("doc_id")
        clean = curated.join(flagged, "doc_id", "left_anti")

        threshold = getattr(book, "semantic_decontam_threshold", None)
        if threshold is not None:
            from empujar_spark.operators.similarity import (
                embedding_decontam,
            )

            emb = wh.read("embeddings")
            hits = embedding_decontam(
                # only curated docs' vectors can flag a curated doc
                emb.join(
                    curated.select(F.col("doc_id").alias("vec_id")),
                    "vec_id",
                    "left_semi",
                ),
                emb.join(
                    F.broadcast(bench.select(
                        F.col("doc_id").alias("vec_id")
                    )),
                    "vec_id",
                    "left_semi",
                ),
                threshold=threshold,
            )
            wh.insert_data(
                "semantic_contamination_audit", hits, merge_key="vec_id"
            )
            clean = clean.join(
                hits.select(F.col("vec_id").alias("doc_id")),
                "doc_id",
                "left_anti",
            )

        try:
            wh.replace_table("documents_decontam", clean)
        finally:
            audit.unpersist()

    chapter.add_page("benchmark-decontam", decontaminate)
