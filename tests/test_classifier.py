"""Learned text classifier: distillation agreement and plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from empujar_spark.operators import classifier as CL

SF = "/root/testdata/sf0.01"

def TEACHER():
    return F.when(
        F.size(F.split(F.col("text"), " ")) >= 56, "keep"
    ).otherwise("drop")


def test_distilled_student_agrees_with_teacher(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "teacher", TEACHER()
    )
    model = CL.train_text_classifier(
        docs.filter(F.col("doc_id") % 5 != 0), label_col="teacher"
    )
    scored = CL.classify_text(model, docs.filter(F.col("doc_id") % 5 == 0))
    agree = scored.agg(
        F.avg((F.col("teacher") == F.col("pred")).cast("double"))
    ).collect()[0][0]
    assert agree >= 0.9, f"holdout agreement {agree}"


def test_scored_frame_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "teacher", TEACHER()
    )
    model = CL.train_text_classifier(docs.limit(200), label_col="teacher")
    out = CL.classify_text(model, docs.limit(50))
    # ML intermediates dropped; label + confidence present
    assert {"pred", "pred_conf"} <= set(out.columns)
    assert not {"__toks", "__feats", "probability"} & set(out.columns)
    rows = out.select("pred", "pred_conf").collect()
    assert all(r.pred in ("keep", "drop") for r in rows)
    assert all(0.0 <= r.pred_conf <= 1.0 for r in rows)
    assert out.count() == 50


def test_corpus_entry_rows(spark):
    from empujar_spark.plans.corpus import CORPUS

    df = CORPUS["quality_classifier_filter"].fn(spark, SF)
    n = df.count()
    assert n == 100  # every holdout doc scored, none dropped
    assert df.filter(F.col("agree") == 1).count() >= 0.9 * n


def test_streaming_scores_equal_batch_scores(spark):
    from empujar_spark.plans.corpus import CORPUS, _quality_classifier
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    streamed = CORPUS["streaming_classifier_scores"].fn(spark, sf)
    got = {tuple(r) for r in streamed.collect()}

    model = _quality_classifier(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").withColumn(
        "teacher", TEACHER()
    )
    batch = CL.classify_text(model, docs).select(
        "doc_id", "teacher", "pred",
        (F.col("teacher") == F.col("pred")).cast("int").alias("agree"),
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_scores_unlabeled_frame(spark):
    """Serving frames carry no label column (the normal scoring case);
    classify_text must skip the train-time StringIndexer stage and
    produce the same predictions it gives a labeled frame."""
    base = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") % 20 == 0
    )
    model = CL.train_text_classifier(
        base.withColumn("teacher", TEACHER()), label_col="teacher"
    )
    unlabeled = CL.classify_text(model, base.select("doc_id", "text"))
    labeled = CL.classify_text(model, base.withColumn("teacher", TEACHER()))
    got_u = {(r.doc_id, r.pred, r.pred_conf) for r in unlabeled.collect()}
    got_l = {(r.doc_id, r.pred, r.pred_conf) for r in labeled.collect()}
    assert got_u == got_l and len(got_u) > 0
    assert all(p in ("keep", "drop") for _, p, _ in got_u)
