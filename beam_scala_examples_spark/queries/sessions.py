"""TopWikipediaSessions (SURVEY §2.12 Q8): per calendar month, the user
with the longest session (by event count), over a sampled user population.

Reference: ``complete/TopWikipediaSessions.scala:56-199`` — P16 hash
sampling (θ=0.1), W3 1-hour-gap sessions, N7 Count.perElement on
(user, session), W4 calendar-month windows, T4 ``Top.of(1)``.

Cross-engine notes: the reference samples with Java's ``String.hashCode``
(``:191-198``); we use a deterministic modulo on the numeric user id so
Spark and the DuckDB oracle agree.  Calendar months come from
``date_trunc`` (Spark's ``F.window`` cannot express variable-length
months, SURVEY §2.6-W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import cents
from ..operators.topk import top_k_per_key
from ..operators.windows import duck_sessions_cte
from ..tables import load

SAMPLE_MOD = 10  # keep user_id % 10 == 0 → 10% deterministic sample
GAP_S = 3600


def q08_top_month_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id") % SAMPLE_MOD == 0
    )
    # Per-(user, session) event count — Count.perElement on KV with the
    # session window attached (N7).
    sess = (
        ev.groupBy(
            F.session_window("ts", f"{GAP_S} seconds").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("edits"))
        .select(
            F.date_trunc("month", F.col("sw.start")).alias("month"),
            "user_id",
            "edits",
        )
    )
    # Top.of(1) per month, ties by user desc (TopWikipediaSessions.scala:144-158).
    return top_k_per_key(
        sess, ["month"], [F.desc("edits"), F.desc("user_id")], 1
    ).select("month", "user_id", "edits")


def p08_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: JSON line -> typed row, permissive (the reference parses wiki
    edit JSON, ``complete/TopWikipediaSessions.scala:99-109``; our N9
    convention drops-and-counts instead of throwing). The fixture set has
    no raw JSON, so lines are derived from ``events`` via ``to_json`` and
    parsed back with ``operators/parse.py::parse_json_lines``; the
    aggregate proves a lossless round-trip against the relational oracle.
    Sums ride exact integer cents — float order differs across engines."""
    from ..operators.parse import parse_json_lines

    ev = load(spark, sf_dir, "events")
    lines = ev.select(
        F.to_json(F.struct("user_id", "event_type", "value")).alias("line")
    )
    parsed = parse_json_lines(
        lines, "user_id bigint, event_type string, value double"
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
    )


# Validity contract for props rows, shared verbatim by both engines:
# Spark from_json and DuckDB ->> disagree on malformed JSON (NULL vs
# abort) and string-typed k (NULL vs coerce), so conformance is decided
# by one regex BEFORE either parser sees the value.
PROPS_K_RE = r'^\{"k": -?[0-9]+\}$'


def p08_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 on the fixture's *real* raw-JSON column: ``events.props``
    carries ``{"k": <int>}`` strings; parse them typed and aggregate k
    per event_type, counting non-conforming rows instead of letting the
    two engines' divergent error behavior decide (N9 drop-and-count).
    ``from_json``'s schema projection means only the ``props`` and
    ``event_type`` columns are read and the parse runs in the scan
    stage — no Python, no extra pass."""
    ev = load(spark, sf_dir, "events")
    valid = F.col("props").rlike(PROPS_K_RE)
    k = F.when(valid, F.from_json(F.col("props"), "k bigint")["k"])
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("k").isNull(), True)).alias("n_malformed"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


QUERIES = {
    "q08_top_month_sessions": q08_top_month_sessions,
    "p08_json_parse": p08_json_parse,
    "p08_props_parse": p08_props_parse,
}

ORACLE = {
    "q08_top_month_sessions": f"""
        WITH sampled AS (
            SELECT user_id, ts FROM events WHERE user_id % {SAMPLE_MOD} = 0
        ),
        sess_rows AS ({duck_sessions_cte('sampled', 'user_id', 'ts', GAP_S)}),
        sess AS (
            SELECT user_id, session_id, count(*)::BIGINT AS edits,
                   date_trunc('month', min(ts))::timestamp AS month
            FROM sess_rows GROUP BY user_id, session_id
        ),
        ranked AS (
            SELECT month, user_id, edits,
                   row_number() OVER (PARTITION BY month
                                      ORDER BY edits DESC, user_id DESC) AS rk
            FROM sess
        )
        SELECT month, user_id, edits FROM ranked WHERE rk = 1
    """,
}

ORACLE["p08_json_parse"] = """
    SELECT event_type, count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
    FROM events GROUP BY event_type
"""

ORACLE["p08_props_parse"] = f"""
    WITH p AS (
        SELECT event_type,
               CASE WHEN regexp_matches(props, '{PROPS_K_RE}')
                    THEN (props->>'k')::BIGINT END AS k
        FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           count(CASE WHEN k IS NULL THEN 1 END)::BIGINT AS n_malformed,
           sum(k)::BIGINT AS k_sum,
           max(k)::BIGINT AS k_max
    FROM p
    GROUP BY event_type
"""
