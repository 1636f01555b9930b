"""big_ann_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DmitryKey/big-ann (see SURVEY.md).

Everything is expressed Spark-first: DataFrame/SQL logical plans that
Catalyst + Tungsten optimize (predicate pushdown, column pruning,
broadcast joins, AQE), with Arrow-batched Pandas UDFs only where the
built-in operators genuinely cannot express the semantics (scipy-class
statistics, model scoring).

Layout
------
- ``session``    SparkSession factory tuned for the target scale.
- ``catalog``    table loaders for the driver's parquet star schema.
- ``functions``  scalar/array column expressions (vector math, text,
                 interval predicates) — all JVM-side, codegen-friendly.
- ``operators``  relational + vector operators (exact kNN, top-k,
                 stats, interval algebra, dedup, sharding, ANN).
- ``sources``    fbin/u8bin/ibin binary vector format readers/writers
                 (the reference's at-rest format) → Parquet.
- ``streaming``  Structured Streaming operators over the events table.
"""

__version__ = "0.1.0"
