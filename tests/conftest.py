from __future__ import annotations

import os

import pytest

from spk_sl_validation_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Per-session warehouse dir: an orphaned ./spark-warehouse/<table>
    # location (from a previously interrupted run) would otherwise
    # poison saveAsTable with LOCATION_ALREADY_EXISTS.
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    spark = build_session(
        app_name="spk-sl-tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.warehouse.dir": str(warehouse),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
