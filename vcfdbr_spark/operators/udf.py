"""User-level escape hatch (SURVEY §2 C15): per-group pandas apply.

The reference's benchmark harness maps an R function over rows/groups
(purrr map/pmap, benchmarks/00-benchmark-functions.R:170-172,
:209-214).  In this engine every built-in workload stays in column
algebra; when a user genuinely needs imperative Python per group
(model scoring, scipy stats, …) this is the sanctioned shape:
``applyInPandas`` streams each group as an Arrow-backed pandas frame,
runs the function executor-side, and returns a typed frame.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame


def apply_per_group(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Run ``fn`` once per group (Arrow-batched, executor-side).

    Scale notes: one task per group after a hash shuffle on
    ``group_cols``; a single giant group is the failure mode — salt or
    pre-aggregate first if any group exceeds executor memory.
    """
    return df.groupBy(*group_cols).applyInPandas(fn, schema=schema)
