"""Interchange-format round-trips (sources/formats.py): every supported
format reproduces the fixture tables value-for-value, including the
hostile columns (timestamps in ``events``, doubles, nulls)."""

from __future__ import annotations

import pytest

from cdc_algorithms_spark.sources.formats import FORMATS, load_as, save_as
from cdc_algorithms_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, "events", SF_DIR).limit(500)
    path = str(tmp_path / f"events_{fmt}")
    save_as(src, path, fmt)
    back = load_as(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, "event_id") == _sorted_rows(src, "event_id")


@pytest.mark.parametrize("fmt", ("csv", "json"))
def test_text_formats_require_schema(spark, tmp_path, fmt):
    src = load_table(spark, "nation", SF_DIR)
    path = str(tmp_path / f"nation_{fmt}")
    save_as(src, path, fmt)
    with pytest.raises(ValueError, match="schema"):
        load_as(spark, path, fmt)


def test_text_formats_refuse_binary(spark, tmp_path):
    from pyspark.sql import functions as F

    src = load_table(spark, "documents", SF_DIR).select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    with pytest.raises(ValueError, match="binary"):
        save_as(src, str(tmp_path / "x"), "csv")


def test_orc_preserves_chunk_table(spark, tmp_path):
    from cdc_algorithms_spark.operators.chunking import fixed_chunks

    chunks = fixed_chunks(load_table(spark, "documents", SF_DIR), 64)
    path = str(tmp_path / "chunks_orc")
    save_as(chunks, path, "orc")
    back = load_as(spark, path, "orc")
    assert back.count() == chunks.count()
    assert dict(back.dtypes) == dict(chunks.dtypes)


def test_csv_refuses_nested_columns(spark, tmp_path):
    src = load_table(spark, "embeddings", SF_DIR)  # embedding: array<float>
    with pytest.raises(ValueError, match="flat-only"):
        save_as(src, str(tmp_path / "x"), "csv")


def test_embeddings_roundtrip_json_and_orc(spark, tmp_path):
    src = load_table(spark, "embeddings", SF_DIR)
    for fmt in ("json", "orc"):
        path = str(tmp_path / f"emb_{fmt}")
        save_as(src, path, fmt)
        back = load_as(spark, path, fmt, schema=src.schema)
        assert back.schema == src.schema
        assert _sorted_rows(back, "vec_id") == _sorted_rows(src, "vec_id")
