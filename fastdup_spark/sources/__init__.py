from fastdup_spark.sources.warc import read_warc_pages  # noqa: F401
