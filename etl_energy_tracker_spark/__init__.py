"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL-Energy-Tracker pipeline
(/root/reference), re-expressed Spark-first.

Layout:
- ``session``     SparkSession builder tuned for the lake workload.
- ``schemas``     declared StructTypes + validation (mirrors the
                  reference's utilidades/data_validation_utils.py).
- ``timegrid``    DST-aware time kernel (Europe/Madrid), 15-min grid.
- ``lake``        two-zone lake: raw CSV + processed Parquet with
                  keyed keep-last upsert.
- ``functions``   scalar column expressions (parsing, hashing, text,
                  vectors) — all native Catalyst expressions.
- ``operators``   composed DataFrame operators (dedup, similarity,
                  windows, linking, tracking).
- ``pipelines``   per-source transform pipelines (esios/i90/omie/i3/
                  curtailments).
- ``queries``     the query surface (TPC-H-style analytics + lake
                  readers) used by __spark_entry__ and bench.py.
- ``streaming``   Structured Streaming incremental jobs.
"""

__version__ = "0.1.0"
