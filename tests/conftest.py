import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from cogger_spark.session import get_spark
    s = get_spark("cogger-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    from cogger_spark.fixtures import ensure_test_fixtures
    return ensure_test_fixtures()


@pytest.fixture(scope="session")
def smoke_images(tmp_path_factory):
    """50-row image table with the full dim cycle (incl. 1024px) for the
    pipeline invariant tests; generated deterministically, not committed."""
    import pyarrow.parquet as pq
    from cogger_spark.fixtures import SMOKE_DIMS, make_images_table
    path = tmp_path_factory.mktemp("smoke") / "images_smoke.parquet"
    pq.write_table(make_images_table(50, dims=SMOKE_DIMS), path)
    return str(path)
