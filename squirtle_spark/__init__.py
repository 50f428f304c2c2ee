"""squirtle_spark — a PySpark-native analytics engine with the query surface of
DSLAM-UMD/Squirtle (Flock): NEXMark q0-q13 + YSB + a DataFusion-equivalent batch
SQL surface, rebuilt Spark-first (DataFrame/SQL + Catalyst + Structured
Streaming), plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster scale.
- ``catalog``    testdata table loading + deterministic NEXMark/YSB derived views.
- ``queries``    every declared query (SURVEY.md §2.11) as a DataFrame builder
                 with a matching DuckDB oracle SQL string.
- ``operators``  dedup / similarity / text / multimodal / window helpers.
- ``sources``    deterministic NEXMark & YSB event generators (batch + stream).
- ``streaming``  Structured Streaming wiring (windows, watermarks, sinks).

Reference parity citations use ``/root/reference`` file:line in docstrings.
"""

__version__ = "0.1.0"
