from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pysql2neo4j_spark.corpus import generate_corpus  # noqa: E402
from pysql2neo4j_spark.schemas import TRANSCRIPT_SCHEMA  # noqa: E402
from pysql2neo4j_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    transcripts, gold = generate_corpus(n_convs=120, seed=42)
    return transcripts, gold


@pytest.fixture(scope="session")
def transcripts_df(spark, corpus_pdf):
    pdf, _ = corpus_pdf
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="kg_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
