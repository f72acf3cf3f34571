"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference clinical-data ETL pipeline
(rashmitakudamala/Project-Clinical-Data-ETL-Pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession construction + runtime tuning knobs.
- ``tables``     : loaders for the driver's synthetic parquet tables.
- ``operators``  : generic DataFrame-in → DataFrame-out operator library,
                   one function per operator family from SURVEY.md §2.
- ``functions``  : scalar expression helpers (OP-30..38).
- ``sources``    : readers/writers incl. a thin REST-connector stub.
- ``plans``      : domain compositions — the five reference pipelines over
                   FHIR-shaped fixture tables, plus fixture generation.
- ``streaming``  : Structured-Streaming incremental surface (OP-41).
- ``queries``    : the driver-facing query registry: every operator bound to
                   the testdata tables with a matching DuckDB oracle SQL.

Design stance (SURVEY.md §7.1): pure functions, no custom plan IR —
Catalyst is the IR. Every operator is declarative DataFrame/SQL so that
predicate pushdown, column pruning, join selection and AQE apply untouched.
"""

__version__ = "0.1.0"
