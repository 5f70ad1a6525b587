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
    catalog    -- table registry over parquet fixtures (JDBC-ready seam,
                  multi-format lake reads, schema-drift gate)
    functions/ -- scalar Column builders (strings, dates, text, vectors,
                  URL canonicalization)
    operators/ -- reusable relational patterns (dedup, windows, joins,
                  similarity/ANN, corpus prep, hygiene)
    plans/     -- named query builders + matching DuckDB oracle SQL
    pipeline/  -- job registry, sinks (gzip CSV, multi-target), S3A creds
    streaming/ -- watermark/windowed incremental variants, file sink,
                  streaming content dedup
    multimodal/-- binary payload columns + Arrow mapInPandas features

Run a pipeline job: ``JOB=upload_snapshot python -m jonesy_spark``
(see ``scripts/cron/``).
"""

__version__ = "0.2.0"
