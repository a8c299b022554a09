"""Streaming queries for the driver registry.

Each query drives a real Structured Streaming pipeline over the fixture
data split into deterministic micro-batch stages (streaming/runner.py),
then returns the sink as a batch DataFrame — so streaming semantics get
the same DuckDB-oracle value checks as batch queries: the oracle states
what the *converged* result must be, and the streaming run must arrive
at it incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_algorithms_spark.queries import (
    _INGEST_ORACLE,
    _SKETCH_REPORT_ORACLE,
    _with_exact_unique,
    register,
)
from cdc_algorithms_spark.queries_relational import _SESSIONS_ORACLE
from cdc_algorithms_spark.sources.registry import load_table
from cdc_algorithms_spark.streaming import (
    incremental_unique_chunks,
    run_staged_stream,
    sessionize,
    stateful_cdc_chunks,
)

_FIXED_SIZE = 64

_UNIQUE_CHUNKS_ORACLE = f"""
WITH chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_FIXED_SIZE}) AS chunk_text,
         CAST(LEAST({_FIXED_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM documents d, UNNEST(range(0, d.n_chars, {_FIXED_SIZE})) AS u(off)
),
per_key AS (SELECT chunk_text, MAX(length) AS bytes_one FROM chunks GROUP BY chunk_text)
SELECT 'fixed{_FIXED_SIZE}' AS algo,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(bytes_one) AS BIGINT) AS unique_bytes
FROM per_key
"""


@register("streaming_unique_chunks_stats", _UNIQUE_CHUNKS_ORACLE)
def streaming_unique_chunks_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fed in 3 micro-batches → streaming dropDuplicates on
    chunk hash; the converged unique-chunk set must equal the batch one."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    stages = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    sink = run_staged_stream(
        spark, stages, lambda s: incremental_unique_chunks(s, _FIXED_SIZE)
    )
    return sink.groupBy("algo").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("length").cast("long").alias("unique_bytes"),
    )


_EVENT_COUNTS_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY event_type
"""


@register("streaming_event_type_counts", _EVENT_COUNTS_ORACLE)
def streaming_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-mode running aggregation over a 2-stage event stream."""
    ev = load_table(spark, "events", sf_dir)
    stages = [ev.where(F.col("event_id") % 2 == i) for i in range(2)]
    sink = run_staged_stream(
        spark,
        stages,
        lambda s: s.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("raw_value"),
        ),
        output_mode="complete",
    )
    return sink.select(
        "event_type", "n_events", F.round("raw_value", 4).alias("total_value")
    )


_WINDOWED_COUNTS_ORACLE = """
SELECT CAST(epoch(date_trunc('day', ts::TIMESTAMP)) AS BIGINT) AS window_start_s,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("streaming_windowed_event_counts", _WINDOWED_COUNTS_ORACLE)
def streaming_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, append mode (SURVEY.md
    §2.5 streaming-only ops: tumbling windows + watermarks + late data).

    Events arrive in two ts-ordered stages (no row is behind the
    watermark when it arrives, so nothing is dropped as late — the
    late-drop semantics themselves are pinned in
    tests/test_streaming.py); a final far-future sentinel advances the
    watermark past every real day so append mode flushes all windows.
    The sentinel's own window stays open and is never emitted. Windows
    are epoch-aligned UTC days, so the converged result must equal the
    batch ``date_trunc('day')`` rollup. Window starts are compared as
    epoch seconds — timestamp objects round-trip differently through
    Spark (µs) and DuckDB (ns)."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    early = ev.where(F.unix_micros("ts") <= cutoff)
    late = ev.where(F.unix_micros("ts") > cutoff)
    sentinel = _sentinel_event(spark, ev)

    def build(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("value").alias("raw_value"),
            )
        )

    sink = run_staged_stream(spark, [early, late, sentinel], build)
    return sink.select(
        F.unix_seconds(F.col("w.start")).alias("window_start_s"),
        "event_type",
        "n_events",
        F.round("raw_value", 4).alias("total_value"),
    )


def _sentinel_event(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """One event at year 2100 (user/event −1): pushes the watermark past
    every real timestamp so open windows/sessions flush in append mode."""
    return (
        spark.createDataFrame(
            [(-1, -1, "sentinel", 0.0, "{}")],
            "event_id long, user_id long, event_type string, value double, props string",
        )
        .select(
            "event_id",
            F.lit("2100-01-01 00:00:00").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .select(ev.columns)
    )


@register("streaming_user_sessions", _SESSIONS_ORACLE)
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked ``session_window`` sessionization, append mode.

    Events arrive in two ts-ordered stages; a third stage carries one
    far-future sentinel event (user −1) that advances the watermark past
    every real session so append mode flushes them all — the sentinel's
    own open session is never emitted, so no filtering is needed. The
    converged per-user rollup must match the batch lag/cumsum oracle.
    """
    ev = load_table(spark, "events", sf_dir)
    cutoff = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    early = ev.where(F.unix_micros("ts") <= cutoff)
    late = ev.where(F.unix_micros("ts") > cutoff)
    sink = run_staged_stream(
        spark, [early, late, _sentinel_event(spark, ev)], sessionize
    )
    return sink.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


_STREAM_STATIC_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
GROUP BY 1
"""


@register("streaming_purchases_by_nation", _STREAM_STATIC_ORACLE)
def streaming_purchases_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: each micro-batch of the event stream joins the
    static customer→nation dimension (broadcast — the dim ships once per
    executor, the stream never shuffles for the join), then a complete-mode
    running aggregate per nation. The converged result must equal the
    batch three-table join."""
    ev = load_table(spark, "events", sf_dir)
    dim = (
        load_table(spark, "customer", sf_dir)
        .join(
            load_table(spark, "nation", sf_dir),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )
    stages = [ev.where(F.col("event_id") % 2 == i) for i in range(2)]

    def build(stream: DataFrame) -> DataFrame:
        return (
            stream.where(F.col("event_type") == "purchase")
            .join(F.broadcast(dim), "user_id")
            .groupBy("nation")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_purchases"),
                F.sum("value").alias("raw_value"),
            )
        )

    sink = run_staged_stream(spark, stages, build, output_mode="complete")
    return sink.select(
        "nation", "n_purchases", F.round("raw_value", 4).alias("total_value")
    )


# --- streaming benchmark decontamination ------------------------------------
# The train-set hygiene step as a continuous pipeline: documents ARRIVE
# (crawl output, upload queue) and each micro-batch is scored against a
# STATIC broadcast benchmark shingle set. Same converged result as the
# batch `benchmark_decontamination` query, same oracle.


from cdc_algorithms_spark.queries_text import _DECONTAM_ORACLE  # noqa: E402


@register("streaming_decontamination", _DECONTAM_ORACLE)
def streaming_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fed in 3 micro-batches; each batch's shingles left-join
    the broadcast benchmark set (stream never shuffles for the join) and
    a complete-mode per-doc aggregate accumulates overlap counts. A doc
    lives entirely inside one micro-batch, so the converged sink must
    equal the batch decontamination result row-for-row."""
    from cdc_algorithms_spark.operators.dedup_docs import doc_shingles
    from cdc_algorithms_spark.queries_text import _DECONTAM_MOD, DECONTAM_N

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    bench_sh = (
        doc_shingles(docs.where(F.col("doc_id") % _DECONTAM_MOD == 0), DECONTAM_N)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = docs.where(F.col("doc_id") % _DECONTAM_MOD != 0)
    stages = [train.where(F.col("doc_id") % 3 == i) for i in range(3)]

    def build(stream: DataFrame) -> DataFrame:
        sh = doc_shingles(stream, DECONTAM_N)
        return (
            sh.join(F.broadcast(bench_sh), "shingle", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                .cast("long")
                .alias("n_shared"),
            )
        )

    sink = run_staged_stream(spark, stages, build, output_mode="complete")
    return sink.select(
        F.col("doc_id").cast("long"),
        "n_shingles",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("overlap_frac"),
    )


_STATEFUL_CONCAT_ORACLE = """
SELECT doc_id AS src_id, CAST(n_chars AS BIGINT) AS total_len
FROM documents
WHERE n_chars > 0  -- the stateful chunker emits no row for an empty doc
"""


@register("streaming_stateful_ae_concat_check", _STATEFUL_CONCAT_ORACLE)
def streaming_stateful_ae_concat_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful chunker byte accounting: every document's text arrives as
    two fragments in separate micro-batches; emitted chunk lengths must
    reassemble every document exactly (FIXTURES.md invariant 1)."""
    sink = _stateful_ae_sink(spark, sf_dir)
    return sink.groupBy("src_id").agg(
        F.sum("length").cast("long").alias("total_len")
    )


_STATEFUL_TILING_ORACLE = """
SELECT doc_id AS src_id,
       CAST(1 AS BIGINT) AS n_source_pos,
       CAST(1 AS BIGINT) AS n_sink_pos,
       CAST(0 AS BIGINT) AS n_bad_pos,
       CAST(0 AS BIGINT) AS start_pos,
       CAST(n_chars AS BIGINT) AS end_pos
FROM documents WHERE n_chars > 0
"""


@register("streaming_stateful_ae_tiling_check", _STATEFUL_TILING_ORACLE)
def streaming_stateful_ae_tiling_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfect-tiling invariant over the STATEFUL streaming chunker's
    output (streaming/stateful.py): chunks emitted across micro-batch
    boundaries — including the checkpoint-carried tail buffer's
    continuation cuts — must tile every document exactly, with absolute
    offsets anchored at 0 and n_chars. Same coverage-derivative oracle
    as the batch ae_tiling_check (queries.py::_tiling_check)."""
    from cdc_algorithms_spark.queries import _tiling_check

    return _tiling_check(_stateful_ae_sink(spark, sf_dir), per_src=True)


@register("streaming_stateful_ae_chunks")
def streaming_stateful_ae_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full chunk rows from the stateful streaming chunker (rows-only
    driver check; exact equality with batch cdc_chunks is asserted in
    tests/test_streaming.py)."""
    return _stateful_ae_sink(spark, sf_dir)


def _stateful_ae_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    half = (F.length("text") / 2).cast("int")
    frag0 = docs.select(
        F.col("doc_id").cast("long").alias("src_id"),
        F.lit(0).cast("long").alias("seq"),
        F.expr("substring(text, 1, cast(length(text)/2 as int))").alias("text"),
        F.lit(False).alias("eof"),
    )
    frag1 = docs.select(
        F.col("doc_id").cast("long").alias("src_id"),
        F.lit(1).cast("long").alias("seq"),
        F.expr(
            "substring(text, cast(length(text)/2 as int) + 1, length(text))"
        ).alias("text"),
        F.lit(True).alias("eof"),
    )
    return run_staged_stream(
        spark, [frag0, frag1], lambda s: stateful_cdc_chunks(s, "ae", 320)
    )


# --- Stream-stream join (view → purchase conversion) -----------------------

_CONVERSION_ORACLE = """
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(MIN(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS fastest_lag_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
GROUP BY 1
"""


@register("streaming_view_purchase_conversions", _CONVERSION_ORACLE)
def streaming_view_purchase_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (SURVEY.md §2.5 streaming-only ops): the
    view stream joins the purchase stream on user with an event-time
    band (purchase within 6 h after the view). Both sides carry
    watermarks and the join condition bounds both event times, so state
    eviction is provable: a buffered view can be dropped once the
    purchase watermark passes view.ts + 6 h (and vice versa) — the
    requirement for an unbounded 100 TB run. Inner-join matches emit
    eagerly per micro-batch (append mode); with the fixture's bounded
    timeline every pair is emitted, so the converged sink must equal the
    batch self-join, aggregated per user."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "user_id", "event_type")
    stages = [ev.where(F.col("event_id") % 2 == i) for i in range(2)]

    def build(stream: DataFrame) -> DataFrame:
        views = (
            stream.where(F.col("event_type") == "view")
            .select("user_id", F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "30 days")
        )
        purchases = (
            stream.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "30 days")
        )
        return views.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 6 HOURS")),
        ).select("user_id", "v_ts", "p_ts")

    sink = run_staged_stream(spark, stages, build)
    return sink.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        (F.min(F.unix_micros("p_ts") - F.unix_micros("v_ts"))).cast("long").alias(
            "fastest_lag_us"
        ),
    )


# --- dropDuplicatesWithinWatermark (time-bounded streaming dedup) ----------

_DEDUP_WM_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY 1
"""


@register("streaming_distinct_users_within_watermark", _DEDUP_WM_ORACLE)
def streaming_distinct_users_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` on (event_type, user_id): unlike
    plain streaming dropDuplicates (state = every key ever seen, forever),
    state for a key is dropped once the watermark passes its event time +
    delay — the bounded-memory form of streaming dedup for 100 TB feeds
    where keys recur only within a bounded horizon. The fixture timeline
    (30 days) fits inside the delay, so no key's state expires mid-run
    and the converged count per type must equal batch COUNT(DISTINCT)."""
    ev = load_table(spark, "events", sf_dir).select("ts", "user_id", "event_type")
    stages = [ev.where(F.col("user_id") % 2 == i) for i in range(2)]

    def build(stream: DataFrame) -> DataFrame:
        return stream.withWatermark("ts", "40 days").dropDuplicatesWithinWatermark(
            ["event_type", "user_id"]
        )

    sink = run_staged_stream(spark, stages, build)
    return sink.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_users")
    )


_UPDATE_MODE_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


@register("streaming_event_counts_update_mode", _UPDATE_MODE_ORACLE)
def streaming_event_counts_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update output mode (the third mode, after append and complete):
    each micro-batch emits only the KEYS whose aggregate changed — the
    state-store delta, which is what a keyed downstream sink (kv store,
    compacted topic) wants at 100 TB, where complete mode re-emits the
    world every batch. The memory sink therefore holds one row per
    (key, batch-it-changed-in); since counts only grow, max() per key
    reconstructs the converged state, which must equal the batch
    aggregate."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type")
    stages = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]

    def build(stream: DataFrame) -> DataFrame:
        # counts only grow, so every arrival changes its key's aggregate
        # and update mode emits it — max() per key reconstructs the
        # converged count batch-side
        return stream.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )

    sink = run_staged_stream(spark, stages, build, output_mode="update")
    # distinct users are recomputed exactly from the raw events for the
    # oracle compare (per-key distinct state in the stream would be the
    # HLL-sketch tier, covered by streaming_sketch_unique_estimate);
    # n_events reconstructs from the update stream.
    exact_users = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return (
        sink.groupBy("event_type")
        .agg(F.max("n_events").cast("long").alias("n_events"))
        .join(exact_users, "event_type")
    )


@register("streaming_sketch_unique_estimate", _SKETCH_REPORT_ORACLE)
def streaming_sketch_unique_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup estimation end-to-end: documents stream in 3
    micro-batches, fixed chunks feed a complete-mode per-language
    ``hll_sketch_agg`` — the state store carries the sketch registers
    between batches, so each batch costs only its own delta (the
    streaming twin of operators/sketches.py's persisted-sketch contract;
    at 100 TB this is how a dedup-ratio dashboard follows an ingest
    firehose without ever re-scanning the corpus). The converged sink is
    rolled up to per-language + global ('*') estimate rows batch-side
    via sketch union. DataSketches registers aren't reproducible in
    DuckDB, so the driver row carries the exact distinct count (which
    DuckDB recomputes) plus ``est_ok`` = estimate within 2% of it; raw
    estimate accuracy is also pinned in tests/test_streaming.py."""
    from cdc_algorithms_spark.operators.chunking import fixed_chunks as _fixed
    from cdc_algorithms_spark.operators.sketches import sketch_rollup

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text", "lang")
    stages = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    lang_of = docs.select(F.col("doc_id").alias("src_id"), "lang")

    def build(stream: DataFrame) -> DataFrame:
        chunks = _fixed(stream, _FIXED_SIZE).join(lang_of, "src_id")
        return chunks.groupBy("lang").agg(
            F.hll_sketch_agg(F.xxhash64("chunk_text"), F.lit(14)).alias("sketch"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("length").cast("long").alias("total_bytes"),
        )

    sink = run_staged_stream(spark, stages, build, output_mode="complete")
    per = sink.withColumn(
        "est_unique_chunks", F.hll_sketch_estimate("sketch").cast("long")
    ).withColumnRenamed("lang", "group")
    glob = sketch_rollup(sink).withColumn("group", F.lit("*"))
    cols = ["group", "n_chunks", "total_bytes", "est_unique_chunks"]
    report = per.select(*cols).unionByName(glob.select(*cols))
    chunks_batch = _fixed(docs, _FIXED_SIZE).join(lang_of, "src_id")
    return _with_exact_unique(report, chunks_batch)


@register("streaming_ingest_novelty", _INGEST_ORACLE)
def streaming_ingest_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face of incremental ingest (operators/ingest.py): the
    'new batch' documents arrive as a 2-micro-batch stream, are chunked
    in-stream, and marked against the STATIC chunk index of the
    already-ingested corpus via a stream-static left join — the exact
    shape of a continuous ingest front-end at 100 TB (index as a slowly
    updated static table / Delta snapshot, arrivals as the stream). The
    complete-mode sink holds per-chunk-key groups; the converged
    accounting row must equal the batch ``incremental_ingest_stats``
    (the same ``_INGEST_ORACLE`` value-checks both)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    from cdc_algorithms_spark.operators.chunking import fixed_chunks as _fixed
    from cdc_algorithms_spark.operators.ingest import chunk_index

    old = docs.where(F.col("doc_id") % 3 != 0)
    index = chunk_index(_fixed(old, _FIXED_SIZE), key_col="chunk_text").select(
        F.col("hash").alias("chunk_text"), F.lit(True).alias("known")
    )
    batch = docs.where(F.col("doc_id") % 3 == 0)
    stages = [
        batch.where((F.col("doc_id") / 3).cast("long") % 2 == i) for i in range(2)
    ]

    def build(stream: DataFrame) -> DataFrame:
        marked = _fixed(stream, _FIXED_SIZE).join(index, "chunk_text", "left")
        return marked.withColumn("known", F.coalesce("known", F.lit(False))).groupBy(
            "chunk_text", "known"
        ).agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.sum("length").alias("bytes_all"),
            F.max("length").alias("length"),
        )

    sink = run_staged_stream(spark, stages, build, output_mode="complete")
    from cdc_algorithms_spark.operators.ingest import ingest_accounting

    return ingest_accounting(sink)
