import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_with_aws_glue_workshop_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_session(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-warehouse-"),
            # dim tables here are tiny; disable auto-broadcast ONLY where a
            # test needs to observe bucketing (set per-test via spark.conf)
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
