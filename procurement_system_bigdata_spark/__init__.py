"""procurement_system_bigdata_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
isMarouaneBen/procurement-system-BigData (an Airflow+Trino+HDFS+Postgres+
Cassandra procurement ETL stack), re-expressed Spark-first:

- Trino federated SQL        -> Spark SQL / DataFrame API (Catalyst + AQE)
- Hive external CSV tables   -> spark.read.csv with explicit all-string schema
- Postgres master data       -> broadcast-joined dimension DataFrames
- Cassandra upsert snapshots -> last-write-wins dedup over a keyed DataFrame
- Airflow sequential DAG     -> run_pipeline(spark, run_date) stage functions

Beyond reference parity, the engine adds large-scale training-data-pipeline
operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, and multimodal column plumbing.

All semantics derive from the public reference at /root/reference (cited
file:line in docstrings) and the public Apache Spark API.
"""

__version__ = "0.1.0"
