from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from retailfeaturestore_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rfs-tests", shuffle_partitions=8)
    yield s
