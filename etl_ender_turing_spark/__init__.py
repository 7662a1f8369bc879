"""etl_ender_turing_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the evios/ETL-Ender-Turing reference pipeline (an
Extract/Transform/Load pipeline that flattens nested conversation-session
JSON into a 20-table relational star schema), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication, similarity
search, text analysis, and multimodal column plumbing.

Design stance (see SURVEY.md §7):
- Everything is DataFrame + Spark SQL; plan construction in Python,
  execution in the JVM. Zero Python UDFs on the reference-parity hot path.
- Catalyst does pushdown/pruning/join-selection; we express plans
  declaratively and verify with .explain().
- Tables partitioned by date for the reference's date-range access pattern.
"""

__version__ = "0.1.0"
