"""Genotype dosage recode — exact parity with the reference's ``gt2snp``
(pipeline/02-build-db.R:101-108).

The reference uses ``str_detect`` (unanchored substring regex) inside an
ordered ``case_when``; Spark's ``rlike`` has the same unanchored-find
semantics, and ``when`` chains evaluate in order, so the translation is
1:1:

    0: contains 0/. | ./0 | 0/0 | 0|0      or equals "0"
    1: contains 0/1 | 1/0 | 0|1 | 1|0 | ./1 | 1/. | .|1 | 1|.  or equals "1"
    2: contains 1/1 | 1|1
    else NULL  (e.g. "2/2", "./.", "1/2")

Result type is double (the R branch returns numeric; NA → NULL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOM_REF_RE = r"0/\.|\./0|0/0|0\|0|^0$"
HET_RE = r"0/1|1/0|0\|1|1\|0|\./1|1/\.|\.\|1|1\|\.|^1$"
HOM_ALT_RE = r"1/1|1\|1"


def gt2snp(gt_raw: Column) -> Column:
    """Dosage 0/1/2/NULL from a raw GT string column."""
    return (
        F.when(gt_raw.rlike(HOM_REF_RE), F.lit(0.0))
        .when(gt_raw.rlike(HET_RE), F.lit(1.0))
        .when(gt_raw.rlike(HOM_ALT_RE), F.lit(2.0))
        .otherwise(F.lit(None).cast("double"))
    )
