import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from named_entity_algorithm_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="kg-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()
