"""User-defined aggregates (SURVEY §2.10 U3 EXT).

When no built-in aggregate expresses the semantics, a GROUPED_AGG pandas
UDF is the scale-correct escape hatch: Arrow-batched columns in, scalar
out, executed per group after the normal hash-shuffle — never a Python
call per row. (The reference has no UDAFs; its per-row Python transforms
all map to native expressions — see functions.derive.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Σ(v·w)/Σ(w) as a GROUPED_AGG pandas UDF (vectorized numpy inside)."""
    total_w = weight.sum()
    if total_w == 0:
        return float("nan")
    return float((value * weight).sum() / total_w)
