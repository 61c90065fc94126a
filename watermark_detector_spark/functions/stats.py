"""Numeric UDAF surface: Arrow-batched grouped-aggregate pandas UDFs.

Completes the §2.8 UDF inventory (scalar pandas UDF, mapInPandas,
applyInPandasWithState, UDTF) with the GROUPED_AGG shape: the whole
group's column arrives as one pandas Series per call — the escape hatch
for aggregates Catalyst lacks. Partial aggregation does NOT apply to
pandas UDAFs (each group is shipped whole), so at 100 TB use them only
where a two-phase built-in truly can't express the math — MAD below is
the canonical example (nested medians don't decompose).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation: median(|x - median(x)|). Matches
    quantile_cont(0.5)-based SQL (numpy median interpolates the same
    way) — oracle-checked as driver query q53."""
    m = np.median(v)
    return float(np.median(np.abs(v - m)))
