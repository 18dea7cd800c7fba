from __future__ import annotations

import pytest

from omop_concept_automapper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pytest", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
