"""Interchange formats: persist / load any engine table as parquet,
ORC, CSV, or JSON(-lines).

The reference's only interchange surface is raw bytes on disk
(``Chunker::read_file``, chunker.rs:31-37). An analytics engine needs
real table interchange, so this module wraps Spark's built-in writers /
readers with the options that make round-trips *lossless*:

* **CSV and JSON are schema-less** — a bare read infers strings/longs
  and silently loses types (timestamps become strings, ints widen).
  ``load_as`` therefore requires (or re-applies) an explicit schema, the
  same posture as a production pipeline where the schema comes from a
  catalog.
* **Timestamps** round-trip via an explicit ISO-8601 µs pattern: CSV/
  JSON default formatting drops sub-second precision in some Spark
  versions, and naive-vs-UTC ambiguity is pinned by the session's UTC
  timezone (session.py).
* **Binary columns don't exist in CSV/JSON** — ``save_as`` refuses them
  rather than writing base64 soup; chunk payload interchange is what
  the parquet/ORC paths and the content-addressed chunk store
  (sources/sinks.py) are for.

Scale posture: these are plain DataFrame writers — each executor writes
its partitions directly (no driver funnel), and readers split files
across the cluster. CSV/JSON are there for interchange with external
tools at corpus edges, not for the 100 TB hot path (columnar formats
with pushdown win there; see PLANS.md pushdown assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_TEXT_OPTIONS = {
    "timestampFormat": _TS_FMT,
    "dateFormat": "yyyy-MM-dd",
}


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    return fmt


def save_as(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` at ``path`` in ``fmt`` so that :func:`load_as` with
    the same format and ``df.schema`` reproduces it value-for-value."""
    fmt = _check_format(fmt)
    if fmt in ("csv", "json"):
        binary_cols = [f.name for f in df.schema.fields if "binary" in f.dataType.simpleString()]
        if binary_cols:
            raise ValueError(
                f"{fmt} cannot represent binary columns {binary_cols}; "
                "use parquet/orc or the content-addressed chunk store"
            )
    if fmt == "csv":
        complex_cols = [
            f.name
            for f in df.schema.fields
            if any(t in f.dataType.simpleString() for t in ("array", "map", "struct"))
        ]
        if complex_cols:
            raise ValueError(
                f"csv is flat-only; columns {complex_cols} are nested — "
                "use json (lossless with schema) or parquet/orc"
            )
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.options(header="true", **_TEXT_OPTIONS)
    elif fmt == "json":
        writer = writer.options(**_TEXT_OPTIONS)
    writer.format(fmt).save(path)


def load_as(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` back. For CSV/JSON a ``schema`` is required — text
    formats carry no types, and silent inference is how timestamps turn
    into strings halfway down a pipeline."""
    fmt = _check_format(fmt)
    reader = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} requires an explicit schema for a lossless read")
        reader = reader.schema(schema).options(**_TEXT_OPTIONS)
        if fmt == "csv":
            reader = reader.options(header="true")
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)
