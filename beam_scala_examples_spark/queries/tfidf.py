"""TF-IDF (SURVEY §2.12 Q7) over ``documents`` with ``doc_id`` as the URI.

Reference: ``complete/TfIdf.scala:188-300`` — a DAG with two CoGroupByKeys
and one singleton side input.  Spark-first shape: one tokenized base
relation feeding three aggregations, two equi-joins, and the |docs|
scalar as a broadcast cross join.  Only the provably-1-row scalar is
*forced* to broadcast: the per-word doc-frequency relation grows with
corpus vocabulary (billions of distinct tokens at web scale), so its
join strategy is left to Catalyst/AQE size estimates — broadcast at
fixture scale, shuffle join once the dictionary outgrows the threshold.

Formula (SURVEY §2.11-N4, ``TfIdf.scala:345,359,374``):
``tf = n(word,doc) / words(doc)``; ``df = docs(word) / |docs|``;
``tfidf = tf * ln(1/df)`` — natural log, no smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import NONWORD_SEP, tokenize
from ..tables import load


def q07_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), NONWORD_SEP)).alias("word"),
        )
        .filter(F.col("word") != "")
    )

    # n(word, doc) — Count.perElement on (uri, word) pairs (TfIdf.scala:226).
    # Three consumers (the result itself, per-doc totals, doc frequency);
    # AQE's query-stage reuse dedupes the identical (doc_id, word) shuffle
    # at runtime, so the tokenize+count pipeline runs once without an
    # explicit persist (verified: persist() measured no faster at sf0.1).
    word_counts = toks.groupBy("doc_id", "word").agg(F.count("*").alias("n"))
    # words(doc) — derived from word_counts so the token relation is scanned
    # once (the reference re-reads uriToWords three times; Catalyst would
    # also recompute, so we re-aggregate the much smaller counts relation).
    words_per_doc = word_counts.groupBy("doc_id").agg(
        F.sum("n").alias("doc_total")
    )
    # docs(word) — distinct docs containing the word (TfIdf.scala:213).
    docs_per_word = word_counts.groupBy("word").agg(
        F.count("*").alias("n_docs")
    )
    # |docs| — Count.globally side input (TfIdf.scala:195-200).
    total_docs = docs.agg(F.countDistinct("doc_id").alias("total_docs"))

    tf = F.col("n") / F.col("doc_total")
    df_ = F.col("n_docs") / F.col("total_docs")
    return (
        word_counts.join(words_per_doc, "doc_id")
        .join(docs_per_word, "word")
        .join(F.broadcast(total_docs))
        .select(
            "doc_id",
            "word",
            F.round(tf * F.log(1.0 / df_), 6).alias("tfidf"),
        )
    )


QUERIES = {"q07_tfidf": q07_tfidf}

ORACLE = {
    "q07_tfidf": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\W+')) AS word
            FROM documents
        ),
        t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        wc AS (SELECT doc_id, word, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
        wpd AS (SELECT doc_id, sum(n)::BIGINT AS doc_total FROM wc GROUP BY 1),
        dpw AS (SELECT word, count(*)::BIGINT AS n_docs FROM wc GROUP BY 1),
        td AS (SELECT count(DISTINCT doc_id) AS total_docs FROM documents)
        SELECT wc.doc_id, wc.word,
               round((wc.n * 1.0 / wpd.doc_total)
                     * ln(1.0 / (dpw.n_docs * 1.0 / td.total_docs)), 6) AS tfidf
        FROM wc
        JOIN wpd USING (doc_id)
        JOIN dpw USING (word)
        CROSS JOIN td
    """,
}


TOP_TERMS_K = 3


def text_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: each document's ``TOP_TERMS_K`` highest
    TF-IDF terms — the per-doc tag/topic surface built directly on Q7's
    relation.  Ranking orders by the micro-quantized score (an integer,
    so the cut is boundary-safe across engines) with the term as the
    total-order tie-break; the per-doc rank rides WindowGroupLimit, so
    each shuffle partition forwards K rows per doc, not the doc's whole
    vocabulary."""
    from pyspark.sql.window import Window

    scored = q07_tfidf(spark, sf_dir).withColumn(
        "tfidf_micro", F.round(F.col("tfidf") * 1e6).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_K)
        .select("doc_id", "rank", "word", "tfidf_micro")
    )


QUERIES["text_top_terms_per_doc"] = text_top_terms_per_doc

ORACLE["text_top_terms_per_doc"] = f"""
    WITH base AS ({ORACLE["q07_tfidf"]}),
    scored AS (
        SELECT doc_id, word,
               round(tfidf * 1e6)::BIGINT AS tfidf_micro
        FROM base
    )
    SELECT doc_id, rank, word, tfidf_micro FROM (
        SELECT doc_id, word, tfidf_micro,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf_micro DESC, word ASC
               )::INTEGER AS rank
        FROM scored
    ) WHERE rank <= {TOP_TERMS_K}
"""
