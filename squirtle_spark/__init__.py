"""squirtle_spark — a PySpark-native analytics engine with the query surface
of DSLAM-UMD/Squirtle ("Flock", a serverless streaming SQL engine; see
SURVEY.md for the full blueprint).

Layout:

- ``session``   — tuned SparkSession factory (AQE, Arrow, UTC).
- ``catalog``   — fixture tables + derived NEXMark/YSB views, dual-dialect.
- ``dialect``   — Spark-SQL/DuckDB dual-dialect emission helpers.
- ``registry``  — the query registry driving correctness + bench + tests.
- ``queries``   — NEXMark q0–q13, YSB, TPC-H subset, window operators, core ops.
- ``operators`` — LLM-pipeline operators: dedup, similarity, text, multimodal.
- ``sources``   — deterministic NEXMark/YSB event generators.
- ``streaming`` — Structured Streaming wiring (windows, watermarks, sinks).
"""

from .session import get_spark

__version__ = "0.14.0"  # minor tracks the build round

__all__ = ["get_spark", "__version__"]
