"""smart_contract_database_builder_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ``cassc/smart-contract-database-builder``
(a Rust ETL over embedded DuckDB), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB-class datasets.

Layout
------
- ``session``      SparkSession factory with scale-oriented defaults
- ``schemas``      explicit StructType schemas (contract/function/testdata)
- ``functions``    scalar expression builders (hashing, keccak/ABI, text, vectors)
- ``sources``      batch + streaming sources (fiesta folders, etherscan JSON, parquet)
- ``operators``    composite operators (dedup, similarity, as-of join, multimodal)
- ``plans``        the named query registry backing ``__spark_entry__``
- ``streaming``    structured-streaming views of the events table
- ``sinks``        DuckDB staged-parquet sink, source export
- ``compilestage`` solc compile / ABI extraction pipeline (external stage)
"""

__version__ = "0.1.0"
