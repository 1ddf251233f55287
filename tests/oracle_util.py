"""Local emulation of the driver's Spark-vs-DuckDB compare.

Sorts columns by name, sorts rows, and compares values exactly (the
driver hashes values, so we want bit-stable agreement, not approx)."""

from __future__ import annotations

import math


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # driver-style canonicalization; exact float compare below
                vals.append(v)
            elif hasattr(v, "item"):  # numpy scalar
                vals.append(v.item())
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out


def compare_frames(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_df = duck_rel.fetchdf()
    d_cols = list(d_df.columns)
    d_rows = [tuple(r) for r in d_df.itertuples(index=False, name=None)]

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    _, s_norm = normalize(s_rows, s_cols)
    _, d_norm = normalize(d_rows, d_cols)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a != b and not _row_close(a, b):
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"row {i}: spark={a} duck={b}")
    if n_bad:
        problems.append(f"{n_bad} mismatched rows total")
    return problems


def _row_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not (x == y or math.isclose(x, y, rel_tol=0, abs_tol=0)):
                return False
        elif x != y:
            if hasattr(x, "timestamp") and hasattr(y, "timestamp"):
                if x.timestamp() == y.timestamp():
                    continue
            return False
    return True
