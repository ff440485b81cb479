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
        audit = ngram_contamination(curated, bench, n=8)
        wh.insert_data("contamination_audit", audit, merge_key="doc_id")
        flagged = audit.filter(F.col("contaminated")).select("doc_id")
        wh.replace_table(
            "documents_decontam", curated.join(flagged, "doc_id", "left_anti")
        )

    chapter.add_page("benchmark-decontam", decontaminate)
