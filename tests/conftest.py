from __future__ import annotations

import os

import pytest

#: Spark python workers inherit the JVM's environment, captured when the
#: gateway launches — so the protobuf-alias worker shim (vendor/
#: sitecustomize.py, needed by the transformWithState parity test) must be
#: on PYTHONPATH BEFORE any session is created. Harmless everywhere else:
#: the shim only installs an import alias for google.* and never fires
#: unless something imports google.protobuf.
_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dcosb_cassandra_spark",
    "vendor",
)
os.environ["PYTHONPATH"] = (
    _VENDOR + (os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")
)

from dcosb_cassandra_spark.session import get_spark  # noqa: E402

#: driver's correctness gate runs at sf0.01 — self-check at the same SF
SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dcosb-tests")
    yield s
