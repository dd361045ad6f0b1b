from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandasy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("PANDASY_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Default tier skips @pytest.mark.slow (randomized fuzz /
    property / full-registry plan sweeps): the full suite outgrew the
    round driver's pytest window (r11 VERIFY: killed at ~95% after
    ~30 min with zero failures), so the slowest non-pin tests run in
    an opt-in nightly tier.  Every oracle-equivalence / exactness pin
    stays in the default tier.  Opt in with ``PANDASY_SLOW=1`` or an
    explicit ``-m slow`` / ``-m "slow or not slow"`` selection."""
    if os.environ.get("PANDASY_SLOW"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set PANDASY_SLOW=1 or -m slow to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "pandasy-spark-tests",
        master=os.environ.get("PANDASY_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("PANDASY_TEST_SHUFFLE", "4")),
    )
    if os.environ.get("PANDASY_TEST_AQE", "1") == "0":
        s.conf.set("spark.sql.adaptive.enabled", "false")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
