"""Self-check harness mirroring the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names and an
order-insensitive multiset of normalized values. Strict by default: floats
must match exactly (queries are written to be bitwise-stable — see
dialect.dsum), so anything the driver could flag shows up here first.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _norm_cell(v):
    """Normalize one value into a hashable, engine-agnostic token."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return ("f", repr(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_norm_cell(x) for x in v))
    if isinstance(v, (int, bool, str)):
        return v
    # pandas NaT / numpy scalars / Decimal etc.
    if v != v:  # NaN-like
        return "∅"
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("o", str(v))


def _normalize(df: pd.DataFrame) -> Counter:
    df = df.reindex(sorted(df.columns), axis=1)
    return Counter(
        tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_spark: list[str]
    cols_oracle: list[str]
    n_mismatched: int = 0
    samples: list[str] = field(default_factory=list)

    @property
    def rows_match(self) -> bool:
        return self.rows_spark == self.rows_oracle

    @property
    def cols_match(self) -> bool:
        return self.cols_spark == self.cols_oracle

    @property
    def ok(self) -> bool:
        return self.rows_match and self.cols_match and self.n_mismatched == 0

    def message(self) -> str:
        if self.ok:
            return f"{self.name}: OK ({self.rows_spark} rows)"
        parts = [f"{self.name}: MISMATCH"]
        if not self.rows_match:
            parts.append(f"rows spark={self.rows_spark} oracle={self.rows_oracle}")
        if not self.cols_match:
            parts.append(f"cols spark={self.cols_spark} oracle={self.cols_oracle}")
        if self.n_mismatched:
            parts.append(f"{self.n_mismatched} differing rows")
            parts.extend(self.samples[:6])
        return "\n  ".join(parts)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(
        name=name,
        rows_spark=len(spark_pdf),
        rows_oracle=len(oracle_pdf),
        cols_spark=sorted(spark_pdf.columns),
        cols_oracle=sorted(oracle_pdf.columns),
    )
    if not res.cols_match:
        return res
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    if s != o:
        only_s = s - o
        only_o = o - s
        res.n_mismatched = sum(only_s.values()) + sum(only_o.values())
        for row, n in list(only_s.items())[:3]:
            res.samples.append(f"spark-only ×{n}: {row}")
        for row, n in list(only_o.items())[:3]:
            res.samples.append(f"oracle-only ×{n}: {row}")
    return res


def check_query(spark, name: str, sf_dir: str) -> CompareResult:
    """Run one registry query against its oracle; raises KeyError if absent."""
    from .registry import load_all

    q = load_all()[name]
    sdf = q.spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only check (matches the driver's weaker path)
        return CompareResult(
            name=name,
            rows_spark=len(spark_pdf),
            rows_oracle=len(spark_pdf),
            cols_spark=sorted(spark_pdf.columns),
            cols_oracle=sorted(spark_pdf.columns),
        )
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    return compare_frames(name, spark_pdf, oracle_pdf)
