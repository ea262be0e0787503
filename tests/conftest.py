import shutil
import tempfile

import pytest

from crawlee_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "crawlee-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh-")},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_dir():
    d = tempfile.mkdtemp(prefix="frontier-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
