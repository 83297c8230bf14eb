"""String-distance features (SURVEY.md T6).

Reference: KotlinRankLibTrainer.kt:45-57 averages JaroWinkler and
Jaccard similarity between query tokens and entity names (via the
java-string-similarity library, pom.xml:21-25). Jaccard is pure column
algebra (parity.jaccard_tokens); JaroWinkler needs per-pair dynamic
logic, so it is a vectorized pandas UDF (Arrow-batched; the per-pair
loop is the algorithm itself, same as the reference's library call).

Standard Jaro-Winkler: match window floor(max(|a|,|b|)/2)-1,
transpositions t/2, winkler boost p=0.1 over the common prefix (<=4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType


def jaro_winkler(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and b[j] == ca:
                a_match[i] = b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    # transpositions contribute floor(t/2) (integer halving, as in the
    # common C implementations incl. DuckDB's)
    jaro = (matches / la + matches / lb + (matches - t // 2) / matches) / 3
    if jaro <= 0.7:  # original Winkler boost threshold (bt = 0.7)
        return jaro
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


def with_jaro_winkler(df: DataFrame, a_col: str, b_col: str,
                      out_col: str = "jaro_winkler") -> DataFrame:
    return df.withColumn(
        out_col, F.round(jaro_winkler_udf(F.col(a_col), F.col(b_col)), 6)
    )
