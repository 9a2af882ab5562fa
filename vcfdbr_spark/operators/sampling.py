"""Deterministic sampling (SURVEY §2 C13).

The reference samples with R's RNG (sample_n / sample_frac /
sample(1:max)); RNGs don't agree across engines, so the engine's
repeatable-sampling primitive is hash-keyed Bernoulli: keep a row iff
the first hex digit of md5(key) falls in the accepted set.  Rate is
k/16 per accepted digit; the same rows are selected on any engine,
any partitioning, any run — which is exactly what a reproducible
training-data pipeline wants from a sample.

Stratified variant: apply per-group accepted sets sized to the
desired per-stratum rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def md5_bernoulli(key: Column, sixteenths: int) -> Column:
    """Boolean keep-predicate with rate ``sixteenths``/16."""
    accepted = list(HEX_DIGITS[:sixteenths])
    return F.substring(F.md5(key.cast("string")), 1, 1).isin(accepted)


def deterministic_sample(
    df: DataFrame, key_col: str, sixteenths: int = 2
) -> DataFrame:
    """Engine-portable repeatable sample at rate ``sixteenths``/16."""
    return df.filter(md5_bernoulli(F.col(key_col), sixteenths))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, int]
) -> DataFrame:
    """Per-stratum deterministic sampling; ``rates`` maps stratum
    value → sixteenths (strata not listed are dropped)."""
    pred = F.lit(False)
    for stratum, sixteenths in rates.items():
        pred = pred | (
            (F.col(stratum_col) == stratum)
            & md5_bernoulli(F.col(key_col), sixteenths)
        )
    return df.filter(pred)
