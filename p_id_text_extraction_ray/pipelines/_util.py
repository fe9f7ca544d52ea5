"""Shared pipeline helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def collect_with_schema(ds, schema: pa.Schema) -> pd.DataFrame:
    """Materialize a SMALL result Dataset to pandas, preserving column names
    even when every block is empty (Ray's ``to_pandas`` drops the schema of
    an all-empty pandas-block dataset)."""
    df = ds.to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame({f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                           for f in schema})
    return df


def cents(values: np.ndarray | pd.Series) -> np.ndarray:
    """Dollars->cents as exact int64 (rint: values are integers +/- fp eps,
    never near .5). Exact integer sums make money aggregates independent of
    summation order — bit-identical between Ray and the DuckDB oracle."""
    return np.rint(np.asarray(values, dtype=np.float64) * 100).astype(np.int64)
