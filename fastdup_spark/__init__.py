"""fastdup_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine for webtext.

Re-expresses the query and data-processing capabilities of the reference
(visual-layer/fastdup, an image dataset-analysis tool built around a closed
C++ engine + a pandas relational layer) as an idiomatic Spark pipeline over
Common-Crawl-style pages:

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Pipeline (mirrors fastdup's run(): decode -> features -> ANN graph -> CC ->
stats, see /root/reference/fastdup/__init__.py:472-791):

    extract  -> html->text (vectorized pandas UDF) + quarantine table
    stats    -> per-doc stats (analog of atrain_stats.csv)
    signatures -> k-shingles (JVM-side), MinHash sigs + SimHash (numpy pandas UDFs)
    lsh      -> band/bucket explode, salted self-join candidate generation
    verify   -> exact Jaccard >= threshold, k-NN truncation, LCS confirm
    cc       -> large-star/small-star connected components
    reports  -> similarity()/outliers()/components()/summary()/duplicates()

Every stage checkpoints to a parquet/Iceberg stage store with per-partition
lineage counters for resumable restarts.
"""

from fastdup_spark.config import PipelineConfig
from fastdup_spark.session import get_spark
from fastdup_spark.plans.pipeline import FastdupSpark

__version__ = "0.1.0"

__all__ = ["PipelineConfig", "get_spark", "FastdupSpark", "__version__"]
