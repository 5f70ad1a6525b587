"""jonesy_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference ETL pipeline (``ets-berkeley-edu/jonesy``, surveyed in
``SURVEY.md``): its relational semantics (joins, correlated-subquery
decorrelations, greatest-n-per-group dedup, watermark incremental
extraction, top-k, scalar function surface) and its pipeline semantics
(job registry, per-partition fan-out, typed gzip CSV sinks, multi-target
object stores) — plus the LLM-data-pipeline operator surface (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    session    -- tuned SparkSession builder
    catalog    -- table registry over parquet fixtures (JDBC-ready seam)
    functions/ -- scalar Column builders (strings, dates, text, vectors)
    operators/ -- reusable relational patterns (dedup, windows, joins, similarity)
    plans/     -- named query builders + matching DuckDB oracle SQL
    pipeline/  -- job registry, sinks (gzip CSV, multi-target)
    streaming/ -- watermark/windowed incremental variants
"""

__version__ = "0.1.0"
