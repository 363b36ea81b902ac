from __future__ import annotations

import pytest

from ncagg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ncagg-tests",
        cpus=4,
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
