from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Known HOST-INFRA failure signatures, retried ONCE per test (r19,
# verdict item 1 hardening). "Python worker failed to connect back" is
# the sandbox's page-cache-pressure worker-spawn failure (root-caused
# by the r18 DSv2 probe, bench_history/dsv2_regime_probe_r18.*): a
# fresh Python worker fork stalls past the JVM's accept timeout under
# memory pressure. It struck twice in r19 profiling runs on
# byte-identical code that passes alone, and a single strike fails the
# driver's `-x` verify. The retry is deliberately NARROW — only this
# exact environmental signature, never assertion failures — and every
# retried test still executes fully and must genuinely pass; the rerun
# is logged loudly so flake frequency stays visible.
_INFRA_RETRY_SIGNATURES = ("Python worker failed to connect back",)


def pytest_runtest_protocol(item, nextitem):
    from _pytest.runner import runtestprotocol

    reports = runtestprotocol(item, nextitem=nextitem, log=False)
    if any(
        r.failed
        and any(s in str(getattr(r, "longrepr", "")) for s in _INFRA_RETRY_SIGNATURES)
        for r in reports
    ):
        sys.stderr.write(
            f"\n[conftest] INFRA FLAKE (worker spawn) in {item.nodeid}; "
            f"rerunning once\n"
        )
        reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for r in reports:
        item.ihook.pytest_runtest_logreport(report=r)
    return True


@pytest.fixture(scope="session")
def spark():
    from data_finder_comparator_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
