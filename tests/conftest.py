from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agf_data_ingestion_spark.session import get_spark  # noqa: E402
from fixtures.generate import generate  # noqa: E402

SF_SMOKE = os.environ.get("AGF_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="agf-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def lake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    n_runs, n_exps = generate(root)
    return {"root": root, "n_runs": n_runs, "n_exps": n_exps}
