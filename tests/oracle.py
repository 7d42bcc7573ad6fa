"""DuckDB oracle harness — mirrors the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row-count + schema + order-insensitive value-hash with
columns sorted by name. This module reproduces that comparison so
every operator is validated locally before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from data_pipeline_2025_spark.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm_value(v):
    """Canonicalize a cell so Spark and DuckDB values compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    # numpy scalars from duckdb fetch
    if hasattr(v, "item"):
        return _norm_value(v.item())
    return v


def _canon_rows(columns, rows):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(canon, key=repr)


def run_spark(spec, spark, sf_dir):
    df = spec.spark_fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_oracle(spec, sf_dir):
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def compare(spec, spark, sf_dir, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = run_spark(spec, spark, sf_dir)
    problems: list[str] = []
    if spec.oracle is None:
        if not isinstance(s_rows, list):
            problems.append("spark query did not return rows")
        return problems
    o_cols, o_rows = run_oracle(spec, sf_dir)
    sc, sr = _canon_rows(s_cols, s_rows)
    oc, orows = _canon_rows(o_cols, o_rows)
    if sc != oc:
        problems.append(f"column mismatch: spark={sc} oracle={oc}")
        return problems
    if len(sr) != len(orows):
        problems.append(f"row-count mismatch: spark={len(sr)} oracle={len(orows)}")
        return problems
    for i, (a, b) in enumerate(zip(sr, orows)):
        if a == b:
            continue
        if float_tol and _rows_close(a, b, float_tol):
            continue
        problems.append(
            f"row {i} differs (cols {sc}):\n  spark : {a}\n  oracle: {b}"
        )
        if len(problems) >= 5:
            problems.append("... (further diffs suppressed)")
            break
    return problems


def _rows_close(a, b, tol):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                continue
        return False
    return True
