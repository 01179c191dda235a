import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dachshund_spark.session import get_spark

    spark = get_spark(
        app_name="dachshund_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": "/tmp/dachshund_spark_warehouse",
        },
    )
    yield spark
    spark.stop()
