from __future__ import annotations

import pytest

from vcfdbr_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="vcfdbr-tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark
