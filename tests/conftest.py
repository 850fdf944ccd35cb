import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_LOGS = "/root/reference/test/logs"


@pytest.fixture(scope="session")
def spark():
    from mysql_log_parser_spark.session import build_session

    s = build_session(
        app_name="mlp-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
