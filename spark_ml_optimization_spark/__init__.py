"""spark_ml_optimization_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference repo ``wxhC3SC6OPm8M1HXboMy/spark-ml-optimization`` (checkout at
/root/reference is empty — see SURVEY.md §0; the target surface is defined
by SURVEY.md §2, BASELINE.json and the driver contract in __spark_entry__.py).

Design principles (SURVEY.md §3-4):
- DataFrame/SQL API only; plans stay inside Catalyst. No RDDs.
- Built-in ``pyspark.sql.functions`` in every hot path; Arrow-vectorized
  pandas UDFs only where built-ins can't express the semantics (LSH
  banding, ML stages).
- Every operator is a function ``(spark, sf_dir) -> DataFrame`` registered
  in ``registry`` together with a DuckDB oracle SQL string where the
  semantics are ANSI-SQL-expressible.
- 100 TB posture: broadcast true dims, partial aggregation, pushed-down
  filters/projections, AQE on, no ``collect()`` in library code.
"""

__version__ = "0.1.0"
