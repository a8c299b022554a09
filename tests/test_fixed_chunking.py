from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import fixed_chunks, with_chunk_hash
from cdc_algorithms_spark.operators.dedup import dedup_stats
from cdc_algorithms_spark.sources.registry import load_table
from tests.oracle import compare_with_oracle


def test_fixed_chunks_concat_property(spark, sf_dir):
    """Concatenation: per-doc sum(length) == n_chars (FIXTURES.md invariant 1)."""
    docs = load_table(spark, "documents", sf_dir)
    chunks = fixed_chunks(docs, 64)
    joined = (
        chunks.groupBy("src_id")
        .agg(F.sum("length").alias("total"))
        .join(docs, F.col("src_id") == F.col("doc_id"))
        .where(F.col("total") != F.col("n_chars"))
    )
    assert joined.count() == 0


def test_fixed_chunks_bounds(spark, sf_dir):
    """Every chunk has 1 <= length <= chunk_size; non-final chunks exactly chunk_size."""
    docs = load_table(spark, "documents", sf_dir)
    chunks = fixed_chunks(docs, 64).cache()
    assert chunks.where((F.col("length") < 1) | (F.col("length") > 64)).count() == 0
    max_idx = chunks.groupBy("src_id").agg(F.max("chunk_idx").alias("mx"))
    nonfinal = chunks.join(max_idx, "src_id").where(F.col("chunk_idx") < F.col("mx"))
    assert nonfinal.where(F.col("length") != 64).count() == 0
    chunks.unpersist()


def test_fixed_chunk_text_matches_length(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    chunks = fixed_chunks(docs, 64)
    assert chunks.where(F.length("chunk_text") != F.col("length")).count() == 0


def test_hash_is_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    agg = F.expr("bit_xor(hash)")
    h1 = with_chunk_hash(fixed_chunks(docs, 64)).agg(agg).collect()[0][0]
    h2 = with_chunk_hash(fixed_chunks(docs, 64)).agg(agg).collect()[0][0]
    assert h1 == h2


def test_dedup_stats_sanity(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    stats = dedup_stats(fixed_chunks(docs, 64)).collect()
    assert len(stats) == 1
    row = stats[0].asDict()
    assert row["algo"] == "fixed64"
    assert 0 < row["unique_bytes"] <= row["total_bytes"]
    assert 0 < row["dedup_coeff"] <= 1.0
    assert row["n_unique"] <= row["n_chunks"]


def test_fixed_chunks_oracle(spark):
    compare_with_oracle(spark, "fixed_chunks", "/root/testdata/sf0.001")


def test_fixed_dedup_stats_oracle(spark):
    compare_with_oracle(spark, "fixed_dedup_stats", "/root/testdata/sf0.001")


def test_empty_and_degenerate_inputs(spark):
    """Operators must pass through empty/degenerate inputs, not crash:
    zero-row corpora happen at 100 TB (a partition's filter matches
    nothing) and must produce empty/zero frames."""
    from pyspark.sql import types as T

    from cdc_algorithms_spark.operators.chunking import cdc_chunks, fixed_chunks
    from cdc_algorithms_spark.operators.dedup import dedup_stats

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert fixed_chunks(empty, 64).count() == 0
    assert dedup_stats(fixed_chunks(empty, 64)).count() == 0
    assert cdc_chunks(empty, "ae", 320).count() == 0
    one_char = spark.createDataFrame([(1, "x")], schema)
    rows = fixed_chunks(one_char, 64).collect()
    assert len(rows) == 1 and rows[0]["length"] == 1
    assert cdc_chunks(one_char, "ae", 320).agg(
        {"length": "sum"}
    ).first()[0] == 1


def test_reconstruct_docs_check_oracle(spark):
    compare_with_oracle(spark, "reconstruct_docs_check", "/root/testdata/sf0.001")


def test_reconstruct_round_trips_every_doc(spark):
    """Recipe + content-addressed store must rebuild every document
    byte-for-byte (the dedup read path)."""
    from cdc_algorithms_spark.queries import SPARK_QUERIES

    res = SPARK_QUERIES["reconstruct_docs_check"](spark, "/root/testdata/sf0.001")
    assert res.where("NOT ok").count() == 0
    n_docs_with_text = res.count()
    assert n_docs_with_text > 0


def test_boilerplate_chunks_oracle(spark):
    compare_with_oracle(spark, "boilerplate_chunks", "/root/testdata/sf0.001")


def test_duplicated_spans_oracle(spark):
    compare_with_oracle(spark, "duplicated_spans_fixed", "/root/testdata/sf0.001")


def test_duplicated_spans_finds_planted_copy(spark):
    """A 4-chunk block copied between two docs must surface as one
    maximal span in each; unique content must not."""
    from cdc_algorithms_spark.operators.chunking import fixed_chunks
    from cdc_algorithms_spark.operators.dedup import duplicated_spans

    shared = "S" * 64 * 4                 # 4 aligned chunks of 64
    docs = spark.createDataFrame(
        [
            (1, "A" * 64 + shared + "B" * 64),
            (2, shared + "C" * 64),
            (3, "D" * 160),               # unique only
        ],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(fixed_chunks(docs, 64), min_chunks=2).collect()
    by_doc = {r["src_id"]: r for r in spans}
    assert set(by_doc) == {1, 2}
    assert by_doc[1]["span_start"] == 64 and by_doc[1]["n_chunks"] == 4
    assert by_doc[2]["span_start"] == 0 and by_doc[2]["n_chunks"] == 4
    assert by_doc[1]["span_bytes"] == 256 and by_doc[2]["span_bytes"] == 256
