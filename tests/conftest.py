from __future__ import annotations

import os

import pytest

from dcosb_cassandra_spark.session import get_spark

#: driver's correctness gate runs at sf0.01 — self-check at the same SF
SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dcosb-tests")
    yield s
