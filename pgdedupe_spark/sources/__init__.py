from pgdedupe_spark.sources.io import (
    materialize,
    read_csv_source,
    read_json_source,
    read_parquet_table,
    read_training_json,
    write_training_json,
)

__all__ = [
    "materialize",
    "read_csv_source",
    "read_json_source",
    "read_parquet_table",
    "read_training_json",
    "write_training_json",
]
