from fastdup_spark.fixtures.pages import (
    PagesData,
    generate_pages,
    pages_schema,
    pages_to_spark,
    write_pages_parquet,
)

__all__ = [
    "PagesData",
    "generate_pages",
    "pages_schema",
    "pages_to_spark",
    "write_pages_parquet",
]
