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


def test_score_linear_frozen_serve_deterministic_and_agrees(spark):
    """The frozen-weights serve (score_linear + the committed
    _FROZEN_QCLS constants, VERDICT r14 item 5): scores are in [0,1] on
    the 1e-6 grid, pred matches the 0.5 threshold exactly, the whole
    thing is a pure projection (rerun bit-identical), and the distilled
    student agrees with the teacher rule on >=99% of sf0.001 docs."""
    from empujar_spark.plans.corpus import CORPUS

    fn = CORPUS["classifier_serve_frozen"].fn
    out = fn(spark, "/root/testdata/sf0.001").cache()
    rows = out.collect()
    assert rows, "empty serve output"
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert r.pred == ("keep" if r.score >= 0.5 else "drop")
        assert round(r.score, 6) == r.score
    agree = sum(r.agree for r in rows) / len(rows)
    assert agree >= 0.99, f"distilled agreement {agree}"
    # rerun determinism: same plan, same grid-quantized floats
    again = {r.doc_id: (r.score, r.pred) for r in fn(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert {r.doc_id: (r.score, r.pred) for r in rows} == again
    out.unpersist()


def test_score_linear_weight_direction(spark):
    """score_linear is monotone in each feature times its weight sign —
    the sanity check a registry reviewer runs on a frozen model."""
    from empujar_spark.operators.classifier import score_linear

    df = spark.createDataFrame(
        [(0, 0.0), (1, 1.0), (2, 2.0)], "id long, x double"
    )
    got = {
        r.id: r.score
        for r in score_linear(df, {"x": 2.0}, bias=-2.0).collect()
    }
    assert got[0] < got[1] < got[2]
    assert abs(got[1] - 0.5) < 1e-9  # z = 0 exactly at x = 1
