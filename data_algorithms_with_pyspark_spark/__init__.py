"""data_algorithms_with_pyspark_spark — a PySpark-native analytics engine.

A brand-new DataFrame/SQL-first engine with the query and data-processing
capabilities of the reference repo ``leandro-mana/data-algorithms-with-pyspark``
(see SURVEY.md), extended with LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) and designed for 100 TB scale.

Layout:
  session     — SparkSession factory (AQE, Arrow, UTC, tuned shuffle partitions)
  schemas     — explicit StructTypes for every engine table
  sources     — readers (csv/json/parquet/text; 3 schema modes) and writers
  operators   — reusable DataFrame->DataFrame operators (graph, dedup,
                similarity, text, windows, multimodal)
  functions   — column-expression helpers (vector math, text normalization)
  plans       — the query catalog: named queries over the testdata star schema,
                each paired with a DuckDB oracle SQL string
  streaming   — Structured Streaming entry points for the events table
"""

__version__ = "0.1.0"
