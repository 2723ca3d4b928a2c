"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest

from entity_resolution_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="er-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
