from __future__ import annotations

import pytest

from twitter_flink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tfs-tests")
    yield spark
    spark.stop()
