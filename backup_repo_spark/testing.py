"""Cross-engine result comparison — shared by tools/selfcheck.py and tests/.

Mirrors the driver's correctness gate: row count, sorted column names,
order-insensitive values. Floats get an exact check plus an np.allclose
fallback (exact mismatch → WARN, close mismatch → FAIL)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — hash-comparable."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.apply(
                lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v)
            )
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")
    if len(df.columns):
        key = df.astype(str)
        df = df.loc[key.sort_values(by=list(df.columns)).index]
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return list of problem strings; entries containing WARN are soft."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
    if problems:
        return problems
    a, b = norm(spark_pdf), norm(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            af, bf = av.fillna(-1e307).to_numpy(), bv.fillna(-1e307).to_numpy()
            close = np.isclose(af, bf, rtol=1e-9, atol=1e-9)
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"col {c}: {int((~close).sum())} values differ, e.g. "
                    f"spark={af[i]!r} duck={bf[i]!r}"
                )
            elif not (af == bf).all():
                problems.append(f"col {c}: WARN inexact float match (hash may fail)")
        else:
            eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                i = eq.idxmin()
                problems.append(
                    f"col {c}: {int((~eq).sum())} values differ, e.g. "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return problems


def hard_problems(problems: list[str]) -> list[str]:
    return [p for p in problems if "WARN" not in p]
