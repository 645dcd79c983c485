import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peskas_malawi_data_pipeline_spark.core import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("tests", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4",
                                  "spark.sql.warehouse.dir":
                                      "/tmp/peskas_test_warehouse"})
    yield spark


SF_DIR = "/root/testdata/sf0.001"
