import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from context_aware_rag_spark.session import build_session  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-subprocess integration tests")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()
