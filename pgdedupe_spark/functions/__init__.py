from pgdedupe_spark.functions.scalar import (
    generate_series,
    idx,
    pg_concat,
    smaller_ids,
)

__all__ = ["generate_series", "idx", "pg_concat", "smaller_ids"]
