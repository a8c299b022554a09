from cdc_algorithms_spark.sources.registry import (
    TABLES,
    load_binary_files,
    load_table,
    load_tables,
)

__all__ = ["TABLES", "load_binary_files", "load_table", "load_tables"]
