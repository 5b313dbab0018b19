from __future__ import annotations

import pytest

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pdf_parser_spark.session import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
