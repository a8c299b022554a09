"""Pandas grouped-aggregate UDAFs (Arrow-batched).

NOTE: no ``from __future__ import annotations`` here on purpose —
``pandas_udf`` resolves the signature from *evaluated* type hints, and
postponed (string) annotations break that resolution.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    return float(v.median())


@pandas_udf("double")
def stddev_pop_udaf(v: pd.Series) -> float:
    return float(v.std(ddof=0))
