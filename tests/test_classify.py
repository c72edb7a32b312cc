"""NB quality classifier + DSIR (queries/classify.py, streaming/nbview.py).

Parity with the DuckDB oracles is covered by test_parity.py's sweep;
these tests pin the MODEL claims (the classifier beats the majority
baseline; DSIR weights separate the target) and the streaming twin's
equality/replay contracts.  Model-quality tests run at sf0.01 — the
sf0.001 eval split (~6 docs) is too small to measure anything.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from beam_scala_examples_spark.queries.classify import (
    _TRAIN_PRED_SPARK,
    DSIR_SAMPLE_K,
    quality_label,
    sample_dsir_resample,
    sample_dsir_weights,
    text_quality_nb_classify,
    text_quality_nb_confusion,
)
from beam_scala_examples_spark.tables import load

SF2_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="bese-classify-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_nb_beats_majority_baseline(spark):
    """The bootstrap claim: NB trained on rule labels must beat the
    majority-class baseline on the held-out split (everything is
    md5-deterministic, so these are fixed numbers, not a flaky
    statistical bound)."""
    cm = {
        (r.label_true, r.label_pred): r.n_docs
        for r in text_quality_nb_confusion(spark, SF2_DIR).collect()
    }
    n = sum(cm.values())
    correct = sum(v for (t, p), v in cm.items() if t == p)
    majority = max(
        sum(v for (t, _), v in cm.items() if t == lab)
        for lab in {t for t, _ in cm}
    )
    assert correct / n > majority / n
    assert correct / n >= 0.90
    # the lift is real: some true drops are recovered, none invented
    assert cm.get(("drop", "drop"), 0) > 0


def test_nb_margin_positive_and_labels_valid(spark, sf_dir):
    rows = text_quality_nb_classify(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.margin_mu >= 0 for r in rows)
    assert {r.label_pred for r in rows} <= {"keep", "drop"}


def test_nb_sink_matches_batch(spark, sf_dir, tmpdir):
    """Streaming NB (streaming/nbview.py): ingesting the train split in
    micro-batches and serving predictions must equal the batch
    classifier exactly — model training is an additive sketch, and the
    scorer is literally shared code."""
    from beam_scala_examples_spark.streaming.nbview import NbIngestSink
    from beam_scala_examples_spark.streaming.sources import (
        read_event_stream, write_arrival_chunks,
    )

    docs = load(spark, sf_dir, "documents")
    train_rows = [
        {"doc_id": r.doc_id, "text": r.text}
        for r in docs.filter(F.expr(_TRAIN_PRED_SPARK))
        .select("doc_id", "text")
        .collect()
    ]
    write_arrival_chunks(train_rows, 15, f"{tmpdir}/docfeed")
    stream = read_event_stream(
        spark, f"{tmpdir}/docfeed", schema="doc_id long, text string"
    )
    sink = NbIngestSink(tmpdir)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert (
        spark.read.parquet(sink.counts_path)
        .select("batch_id").distinct().count() >= 2
    )

    eval_docs = docs.filter(~F.expr(_TRAIN_PRED_SPARK))
    got = sorted(
        (r.doc_id, r.label_pred, r.margin_mu)
        for r in sink.classify(spark, eval_docs).collect()
    )
    expect = sorted(
        (r.doc_id, r.label_pred, r.margin_mu)
        for r in text_quality_nb_classify(spark, sf_dir).collect()
    )
    assert got == expect and len(got) > 0


def test_nb_sink_replay_idempotent(spark, sf_dir, tmpdir):
    """A replayed micro-batch re-derives exactly its own partials
    (dynamic partition overwrite), so the served model is unchanged."""
    from beam_scala_examples_spark.streaming.nbview import NbIngestSink

    docs = load(spark, sf_dir, "documents")
    rows = [
        (r.doc_id, r.text)
        for r in docs.select("doc_id", "text").limit(40).collect()
    ]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    sink = NbIngestSink(tmpdir)
    sink(mk(rows[:20]), 0)
    sink(mk(rows[20:]), 1)
    eval_docs = docs.filter(~F.expr(_TRAIN_PRED_SPARK))
    once = sorted(
        tuple(r) for r in sink.classify(spark, eval_docs).collect()
    )
    sink(mk(rows[20:]), 1)  # replay the latest batch
    twice = sorted(
        tuple(r) for r in sink.classify(spark, eval_docs).collect()
    )
    assert once == twice and len(once) > 0


def test_nb_sink_empty_prefix_serves_empty(spark, sf_dir, tmpdir):
    """An all-empty ingest prefix serves the EMPTY prediction relation
    (logio's explicit-schema read), not a schema-inference error."""
    from beam_scala_examples_spark.streaming.nbview import NbIngestSink

    sink = NbIngestSink(tmpdir)
    sink(spark.createDataFrame([], "doc_id long, text string"), 0)
    eval_docs = load(spark, sf_dir, "documents").limit(5)
    assert sink.classify(spark, eval_docs).count() == 0


def test_dsir_weights_separate_target(spark):
    """DSIR's point: the log importance ratio must be higher on the
    target population (quality keepers) than off it — deterministic
    fixture numbers, measured at driver scale."""
    w = sample_dsir_weights(spark, SF2_DIR)
    lab = quality_label(load(spark, SF2_DIR, "documents"))
    means = {
        r.label: r.mean_lr
        for r in w.join(lab, "doc_id")
        .groupBy("label")
        .agg(F.avg("dsir_logratio").alias("mean_lr"))
        .collect()
    }
    assert means["keep"] > means["drop"] + 0.3


def test_dsir_resample_selects_k_and_enriches(spark):
    """The Gumbel-top-K resample returns exactly K docs and does not
    dilute the target share (deterministic md5 draws)."""
    sel = sample_dsir_resample(spark, SF2_DIR)
    lab = quality_label(load(spark, SF2_DIR, "documents"))
    j = sel.join(lab, "doc_id").collect()
    assert len(j) == DSIR_SAMPLE_K
    keep_share = sum(r.label == "keep" for r in j) / len(j)
    corpus = lab.groupBy("label").count().collect()
    total = sum(r["count"] for r in corpus)
    corpus_share = next(
        r["count"] for r in corpus if r.label == "keep"
    ) / total
    assert keep_share >= corpus_share


def test_dsir_sink_matches_batch(spark, sf_dir, tmpdir):
    """Streaming DSIR (streaming/dsirview.py): bucket LMs are additive
    counts, so the log-served weights and the Gumbel-top-K selection
    must equal the batch queries exactly once the ingest covers the
    corpus."""
    from beam_scala_examples_spark.streaming.dsirview import DsirIngestSink
    from beam_scala_examples_spark.streaming.sources import (
        read_event_stream, write_arrival_chunks,
    )

    docs = load(spark, sf_dir, "documents")
    rows = [
        {"doc_id": r.doc_id, "text": r.text, "source": r.source}
        for r in docs.select("doc_id", "text", "source").collect()
    ]
    write_arrival_chunks(rows, 15, f"{tmpdir}/docfeed")
    stream = read_event_stream(
        spark, f"{tmpdir}/docfeed",
        schema="doc_id long, text string, source string",
    )
    sink = DsirIngestSink(tmpdir)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert (
        spark.read.parquet(sink.counts_path)
        .select("batch_id").distinct().count() >= 2
    )

    got_w = sorted(tuple(r) for r in sink.weights(spark).collect())
    exp_w = sorted(
        tuple(r) for r in sample_dsir_weights(spark, sf_dir).collect()
    )
    assert got_w == exp_w and len(got_w) > 0
    got_s = sorted(tuple(r) for r in sink.resample(spark).collect())
    exp_s = sorted(
        tuple(r) for r in sample_dsir_resample(spark, sf_dir).collect()
    )
    assert got_s == exp_s


def test_dsir_sink_replay_idempotent(spark, sf_dir, tmpdir):
    from beam_scala_examples_spark.streaming.dsirview import DsirIngestSink

    docs = load(spark, sf_dir, "documents")
    rows = [
        (r.doc_id, r.text, r.source)
        for r in docs.select("doc_id", "text", "source").limit(40).collect()
    ]
    mk = lambda rs: spark.createDataFrame(
        rs, "doc_id long, text string, source string"
    )
    sink = DsirIngestSink(tmpdir)
    sink(mk(rows[:20]), 0)
    sink(mk(rows[20:]), 1)
    once = sorted(tuple(r) for r in sink.weights(spark).collect())
    sink(mk(rows[20:]), 1)  # replay the latest batch
    twice = sorted(tuple(r) for r in sink.weights(spark).collect())
    assert once == twice and len(once) > 0


def test_nb_calibration_monotone_tail(spark):
    """The reliability table's extremes must order correctly: the most
    confident keep bucket's observed keep rate exceeds the most
    confident drop bucket's (deterministic fixture numbers)."""
    from beam_scala_examples_spark.queries.classify import (
        text_quality_nb_calibration,
    )

    rows = {
        r.conf_bucket: r.keep_rate
        for r in text_quality_nb_calibration(spark, SF2_DIR).collect()
    }
    assert rows[max(rows)] > rows[min(rows)]


def test_modelgated_build_is_consistent_veto_subset(spark, sf_dir):
    """The model-gated corpus is data_corpus_build minus exactly the
    eval-split docs the classifier vetoes (rule-keep but NB-drop) —
    subset + exact delta.  (At the fixtures' scale the NB classifier
    never vetoes a rule-keep doc, so the delta is typically empty —
    the test pins the IDENTITY, not a nonzero veto count.)"""
    from beam_scala_examples_spark.queries.classify import (
        data_corpus_build_modelgated,
    )
    from beam_scala_examples_spark.queries.llmdata import data_corpus_build

    base = {r.doc_id for r in data_corpus_build(spark, sf_dir).collect()}
    gated = {
        r.doc_id
        for r in data_corpus_build_modelgated(spark, sf_dir).collect()
    }
    assert gated <= base
    vetoes = {
        r.doc_id
        for r in text_quality_nb_classify(spark, sf_dir)
        .filter("label_pred = 'drop'")
        .collect()
    }
    assert base - gated == base & vetoes


def test_pr_curve_monotone_tradeoff(spark):
    """Raising the keep threshold must not increase keep-recall and
    must not decrease keep-precision at the extremes (deterministic
    fixture numbers at driver scale)."""
    from beam_scala_examples_spark.queries.classify import (
        text_quality_nb_pr_curve,
    )

    rows = sorted(
        (r.threshold_nats, r.recall, r.precision)
        for r in text_quality_nb_pr_curve(spark, SF2_DIR).collect()
    )
    recalls = [r for _, r, _ in rows if r is not None]
    assert recalls == sorted(recalls, reverse=True)
    lo, hi = rows[0], rows[-1]
    if hi[2] is not None and lo[2] is not None:
        assert hi[2] >= lo[2]


def test_model_card_sink_matches_batch(spark, sf_dir, tmpdir):
    """Streaming model-aware card (streaming/modelcardview.py): the
    composed sink (base card + NB partials over arriving train docs +
    DSIR logs + eval feature/label logs) must serve exactly the batch
    data_dataset_card_model — the model members are scored from logs
    under the final model, never from re-read text."""
    from beam_scala_examples_spark.queries.classify import (
        data_dataset_card_model,
    )
    from beam_scala_examples_spark.streaming.modelcardview import (
        ModelCardSink,
    )
    from beam_scala_examples_spark.streaming.sources import (
        read_event_stream, write_arrival_chunks,
    )

    docs = load(spark, sf_dir, "documents")
    rows = [
        {"doc_id": r.doc_id, "text": r.text, "lang": r.lang,
         "source": r.source}
        for r in docs.select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
        .collect()
    ]
    # Round-12 hardening (r11 driver gate stopped here): 20-row chunks
    # meant 25 micro-batches x a full foreachBatch card update each —
    # ~300 s wall, which collided with awaitTermination(300) on slower
    # hosts and then failed as a DATA mismatch (the sink was simply
    # incomplete).  Four chunks exercise the same multi-batch
    # accumulation contract (>= 2 batches asserted below; replay
    # idempotence has its own test) at ~1/6 the wall clock, and the
    # await result is asserted so a timeout fails loudly as a timeout.
    write_arrival_chunks(rows, (len(rows) + 3) // 4, f"{tmpdir}/mcfeed")
    stream = read_event_stream(
        spark, f"{tmpdir}/mcfeed",
        schema="doc_id long, text string, lang string, source string",
    )
    sink = ModelCardSink(str(tmpdir))
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "model-card stream did not finish in 600s"

    got = sorted(tuple(r) for r in sink.serving_view(spark).collect())
    expect = sorted(
        tuple(r) for r in data_dataset_card_model(spark, sf_dir).collect()
    )
    assert got == expect
    assert spark.read.parquet(sink.nb.counts_path).select(
        "batch_id"
    ).distinct().count() >= 2


def test_model_card_sink_replay_idempotent(spark, sf_dir, tmpdir):
    from beam_scala_examples_spark.streaming.modelcardview import (
        ModelCardSink,
    )

    docs = load(spark, sf_dir, "documents")
    rows = [
        (r.doc_id, r.text, r.lang, r.source)
        for r in docs.select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    ]
    mk = lambda rs: spark.createDataFrame(
        rs, "doc_id long, text string, lang string, source string"
    )
    sink = ModelCardSink(str(tmpdir))
    sink(mk(rows[:20]), 0)
    sink(mk(rows[20:]), 1)
    once = sorted(tuple(r) for r in sink.serving_view(spark).collect())
    sink(mk(rows[20:]), 1)  # replay the latest batch
    twice = sorted(tuple(r) for r in sink.serving_view(spark).collect())
    assert once == twice and len(once) > 0
