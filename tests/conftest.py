from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = "/root/reference/meus_pdfs"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def fixture_pdfs() -> list[str]:
    return sorted(glob.glob(f"{FIXTURE_DIR}/*.pdf"))


@pytest.fixture(scope="session")
def spark():
    from pdf_extractor_spark.pipeline import build_session

    spark = build_session(master="local[4]", shuffle_partitions=4, app_name="tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA
