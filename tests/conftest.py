import os
import sys

import pytest

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see xgeo_spark/__init__.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgeo_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xgeo-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()
