"""Degenerate-input behavior: empty tables, empty documents, identical
snapshots. Operators must return empty/zero results, not throw — at
100 TB a partition with no matching rows is routine, not exceptional."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import cdc_chunks, fixed_chunks
from cdc_algorithms_spark.operators.dedup import dedup_stats
from cdc_algorithms_spark.operators.diff import snapshot_diff
from cdc_algorithms_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_fixed_chunks_empty_input(spark):
    assert fixed_chunks(_empty_docs(spark), 64).count() == 0


def test_cdc_chunks_empty_input(spark):
    assert cdc_chunks(_empty_docs(spark), "ae", 320).count() == 0


def test_empty_text_document_yields_no_chunks(spark):
    docs = spark.createDataFrame([(1, ""), (2, "abc")], "doc_id long, text string")
    rows = fixed_chunks(docs, 64).collect()
    assert {r["src_id"] for r in rows} == {2}


def test_dedup_stats_empty_chunks(spark):
    stats = dedup_stats(fixed_chunks(_empty_docs(spark), 64))
    assert stats.count() == 0  # no groups — empty frame, not a div-by-zero


def test_snapshot_diff_identical_corpora_is_all_unchanged(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(50)
    chunks = fixed_chunks(docs, 64)
    d = snapshot_diff(chunks, chunks)
    assert d.where(F.col("status") != "unchanged").count() == 0


def test_distributed_chunking_single_tiny_blob(spark):
    """A blob smaller than one segment: one chunk path end-to-end."""
    from cdc_algorithms_spark.operators.distributed import parallel_chunk_blob

    blobs = spark.createDataFrame(
        [(1, bytes(range(200)))], "src_id long, content binary"
    )
    rows = parallel_chunk_blob(
        blobs, "ae", 320, segment_len=1 << 20, window_size=64
    ).collect()
    assert sum(r["length"] for r in rows) == 200
    assert [r["offset"] for r in sorted(rows, key=lambda r: r["chunk_idx"])][0] == 0


def test_lm_bigram_scores_degenerate_docs(spark):
    """Empty and single-word docs carry no bigram and must drop out
    cleanly; a two-word doc scores ln(1) = 0 when its bigram is unique."""
    from cdc_algorithms_spark.operators.textstats import lm_bigram_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "alpha beta"), (4, "alpha gamma")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in lm_bigram_scores(docs).collect()}
    assert set(rows) == {3, 4}
    # both docs share prefix 'alpha' (c1=2), each bigram unique (c2=1):
    # avg_logprob = ln(1/2)
    import math

    assert rows[3]["avg_logprob"] == rows[4]["avg_logprob"] == round(math.log(0.5), 6)


def test_char_entropy_degenerate_docs(spark):
    """Empty docs drop out; a one-char-alphabet doc has entropy 0; a
    uniform n-char alphabet hits log2(n) exactly."""
    from cdc_algorithms_spark.operators.textstats import char_entropy_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "aaaa"), (3, "abcd")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in char_entropy_scores(docs).collect()}
    assert set(rows) == {2, 3}
    assert rows[2]["entropy_bits"] == 0.0 and rows[2]["n_distinct_chars"] == 1
    assert rows[3]["entropy_bits"] == 2.0 and rows[3]["n_distinct_chars"] == 4


def test_duplicated_spans_no_cross_doc_dups(spark):
    from cdc_algorithms_spark.operators.chunking import fixed_chunks as _fx
    from cdc_algorithms_spark.operators.dedup import duplicated_spans

    docs = spark.createDataFrame(
        [(1, "A" * 128), (2, "B" * 128)], ["doc_id", "text"]
    )
    assert duplicated_spans(_fx(docs, 64), min_chunks=2).count() == 0


def test_reconstruct_handles_single_chunk_docs(spark):
    from cdc_algorithms_spark.operators.chunking import fixed_chunks as _fx
    from cdc_algorithms_spark.operators.dedup import reconstruct_docs

    docs = spark.createDataFrame([(1, "short"), (2, "short")], ["doc_id", "text"])
    chunks = _fx(docs, 64).withColumn("hash", F.xxhash64("chunk_text"))
    restored = reconstruct_docs(
        chunks.select("src_id", "chunk_idx", "hash"),
        chunks.select("hash", "chunk_text").dropDuplicates(["hash"]),
    ).collect()
    assert {r["src_id"]: r["restored_text"] for r in restored} == {1: "short", 2: "short"}


def test_reconstruct_flags_missing_store_chunks(spark):
    """An incomplete content-addressed store must be LOUD: recipe
    entries with no store row count into n_missing instead of silently
    truncating restored_text with a self-consistent n_chunks."""
    from cdc_algorithms_spark.operators.chunking import fixed_chunks as _fx
    from cdc_algorithms_spark.operators.dedup import reconstruct_docs

    docs = spark.createDataFrame([(1, "x" * 64 + "y" * 64)], ["doc_id", "text"])
    chunks = _fx(docs, 64).withColumn("hash", F.xxhash64("chunk_text"))
    store = (
        chunks.select("hash", "chunk_text")
        .dropDuplicates(["hash"])
        .where(F.col("chunk_text").startswith("x"))  # drop the y-chunk
    )
    row = reconstruct_docs(
        chunks.select("src_id", "chunk_idx", "hash"), store
    ).collect()[0]
    assert row["n_chunks"] == 2
    assert row["n_missing"] == 1
    assert row["restored_text"] == "x" * 64  # what survived, flagged short


def test_sketch_report_accepts_nonstring_group(spark):
    """An int group column (e.g. a partition id) must union with the
    global '*' row — the group key is cast to string internally."""
    from cdc_algorithms_spark.operators.sketches import sketch_dedup_report

    chunks = spark.createDataFrame(
        [(1, "aa", 2), (1, "bb", 2), (2, "aa", 2), (2, "cc", 2)],
        ["part_id", "chunk_text", "length"],
    )
    rows = sketch_dedup_report(chunks, group_cols=("part_id",)).collect()
    groups = {r["group"] for r in rows}
    assert groups == {"1", "2", "*"}


def test_quality_band_single_doc_stratum(spark):
    """A language with one doc: p10 = p90 = its own score, so the doc
    is kept — the band filter must not drop singleton strata."""
    from cdc_algorithms_spark.queries import SPARK_QUERIES
    import os, tempfile, shutil

    # build a miniature sf dir with one zh doc and several en docs
    tmp = tempfile.mkdtemp(prefix="cdc_band_")
    try:
        docs = spark.createDataFrame(
            [(i, f"text number {i} with several plain words here", "en", "s", 40)
             for i in range(6)]
            + [(99, "一 二 三 四 五 六 七", "zh", "s", 13)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        docs.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = SPARK_QUERIES["quality_band_by_lang"](spark, tmp).collect()
        assert 99 in {r["doc_id"] for r in out}, "singleton stratum dropped"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_queries_survive_empty_tables(spark, tmp_path):
    """Empty inputs are routine at scale (a filter or partition can
    eliminate everything); the formerly-failing classes — k-means
    consumers (empty centroid list) and the segment file sources — plus
    a sample of each query family must return empty/zero results, not
    raise."""
    import os

    from cdc_algorithms_spark.queries import SPARK_QUERIES
    from cdc_algorithms_spark.sources.registry import TABLES

    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        stage = str(tmp_path / f"__s_{t}")
        df.limit(0).write.mode("overwrite").parquet(stage)
        os.rename(stage, str(tmp_path / f"{t}.parquet"))
    names = [
        "ann_ivf_topk", "embedding_clusters", "semantic_dedup_embeddings",
        "file_ranges_ae_dedup_stats", "datasource_ae_dedup_stats",
        "exact_dedup_docs", "curation_pipeline", "mixture_plan_by_source",
        "q1_pricing_summary", "fixed_dedup_stats",
        "benchmark_decontamination", "duplicated_spans_fixed",
    ]
    for name in names:
        SPARK_QUERIES[name](spark, str(tmp_path)).count()  # must not raise


def test_null_text_docs_handled(spark):
    """NULL text values (routine in crawled corpora) must neither crash
    the Arrow winnowing path nor silently vanish from exact dedup."""
    from cdc_algorithms_spark.operators.dedup_docs import exact_dedup
    from cdc_algorithms_spark.operators.textstats import doc_fingerprints_fast

    docs = spark.createDataFrame(
        [(1, None), (2, "hello world"), (3, None), (4, "hello world")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert set(got) == {1, 2, 3, 4}, "null-text docs dropped from dedup"
    assert got[2]["canonical_id"] == got[4]["canonical_id"] == 2
    assert got[1]["canonical_id"] == got[3]["canonical_id"] == 1  # null group

    fps = doc_fingerprints_fast(docs).collect()
    assert {r["doc_id"] for r in fps} == {2, 4}  # null docs emit nothing


def test_ingest_stats_empty_batch_returns_zero_row(spark):
    from cdc_algorithms_spark.operators.ingest import chunk_index, ingest_stats

    chunks = spark.createDataFrame(
        [(1, "a" * 10, 10)], ["src_id", "chunk_text", "length"]
    ).withColumn("hash", F.xxhash64("chunk_text"))
    idx = chunk_index(chunks)
    empty = chunks.limit(0)
    row = ingest_stats(idx, empty).collect()[0]
    assert (row.batch_bytes, row.batch_chunks, row.novel_bytes,
            row.novel_chunks, row.dup_index_bytes, row.dup_batch_bytes) == (
        0, 0, 0, 0, 0, 0)
    assert row.novel_frac is None  # 0/0 — documented


def test_clean_text_null_text_is_empty(spark):
    from cdc_algorithms_spark.operators.textstats import clean_text

    docs = spark.createDataFrame([(1, None), (2, " x ")], "doc_id long, text string")
    out = {r.doc_id: r for r in clean_text(docs).collect()}
    assert (out[1].raw_len, out[1].clean_len, out[1].clean_text) == (0, 0, "")
    assert out[2].clean_text == "x"


def test_sequence_packing_empty_corpus(spark):
    from cdc_algorithms_spark.operators.packing import sequence_packing

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert sequence_packing(docs, 512).count() == 0


def test_table_diff_empty_sides(spark):
    from cdc_algorithms_spark.operators.diff import table_diff

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    assert table_diff(empty, empty).count() == 0
    assert [r.status for r in table_diff(empty, docs).collect()] == ["added"]
    assert [r.status for r in table_diff(docs, empty).collect()] == ["removed"]


def test_kmeans_corpus_smaller_than_k(spark):
    from cdc_algorithms_spark.operators.similarity import embedding_clusters

    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], ["vec_id", "embedding"]
    )
    out = embedding_clusters(tiny, k=8, dim=2)
    assert 0 < out.count() <= 3


def test_embedding_near_dup_tiny_corpus_empty_blocks(spark):
    from cdc_algorithms_spark.operators.dedup_docs import embedding_near_dup_pairs

    # 3 vectors over 8 hash blocks: most blocks are empty
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    rows = embedding_near_dup_pairs(vecs, threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


def test_resample_locf_honors_step(spark):
    from cdc_algorithms_spark.operators.temporal import resample_locf

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1.0),
         (1, "2024-01-01 00:40:00", 3.0),
         (1, "2024-01-01 02:05:00", 5.0)],
        ["k", "ts", "v"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {r["bucket"].strftime("%H:%M"): (r["n_events"], r["avg_value_filled"])
           for r in resample_locf(ev, "k", "ts", "v", step="30 minutes").collect()}
    assert got["00:00"] == (1, 1.0)
    assert got["00:30"] == (1, 3.0)
    assert got["01:00"] == (0, 3.0)   # LOCF carries 00:30's value
    assert got["01:30"] == (0, 3.0)
    assert got["02:00"] == (1, 5.0)
    assert len(got) == 5


def test_sample_frames_skips_empty_payload(spark):
    from cdc_algorithms_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, b""), (2, b"abcdef"), (3, None)],
        "media_id long, content binary",
    )
    rows = sample_frames(media, frame_bytes=4).collect()
    assert {r.media_id for r in rows} == {2}


def test_media_features_null_payload_is_zero_vector(spark):
    from cdc_algorithms_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "img", None), (2, "img", b"")],
        "media_id long, kind string, content binary",
    )
    out = {r.media_id: list(r.features) for r in
           extract_features(media, dim=4).collect()}
    assert out[1] == [0.0] * 4 and out[2] == [0.0] * 4


def test_salted_join_rejects_dim_preserving_modes(spark):
    import pytest

    from cdc_algorithms_spark.operators.skew import salted_join

    f = spark.createDataFrame([(1, "x")], ["k", "a"])
    d = spark.createDataFrame([(1, "y")], ["k", "b"])
    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(f, d, "k", how="full")


def test_mixture_reports_weighted_but_absent_sources(spark):
    from cdc_algorithms_spark.operators.mixture import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a" * 40, "web"), (2, None, "web")], ["doc_id", "text", "source"]
    )
    out = {r["source"]: r for r in
           mixture_plan(docs, {"web": 0.5, "code": 0.5}, 100).collect()}
    assert out["code"].available_tokens == 0
    assert out["code"].allocated_tokens == 0
    # the NULL-text doc carries no tokens and is not counted as selected
    assert out["web"].n_docs_selected == 1


def test_bounded_running_sum_null_group_and_null_order(spark):
    from cdc_algorithms_spark.operators.prefix import bounded_running_sum

    df = spark.createDataFrame(
        [("a", 1, 10), (None, 2, 20), (None, 4, 5), ("a", None, 99)],
        "k string, ord long, val long",
    )
    rows = bounded_running_sum(df, ["k"], "ord", "val", bucket=2).collect()
    got = {(r.k, r.ord): r.running for r in rows}
    # NULL-ord row excluded; NULL group forms its own running stream
    assert got == {("a", 1): 10, (None, 2): 20, (None, 4): 25}


def test_synthetic_blob_zero_and_bad_geometry(spark):
    import pytest

    from cdc_algorithms_spark.sources.synthetic import synthetic_blob_segments

    assert synthetic_blob_segments(spark, 0, 1 << 20, 0).count() == 0
    with pytest.raises(ValueError, match="bad geometry"):
        synthetic_blob_segments(spark, 100, 0, 0)


def test_udtf_guards_match_batch_twins(spark):
    import pytest

    from cdc_algorithms_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame([(1, "hello")], ["doc_id", "text"]).createOrReplaceTempView(
        "__udtf_guard_docs"
    )
    with pytest.raises(Exception, match="size must be positive"):
        spark.sql(
            "SELECT * FROM __udtf_guard_docs d, LATERAL chunk_fixed(d.text, -1) c"
        ).collect()
    with pytest.raises(Exception, match="unknown algo"):
        spark.sql(
            "SELECT * FROM __udtf_guard_docs d, "
            "LATERAL chunk_cdc(d.text, 'nope', 64, 0) c"
        ).collect()
