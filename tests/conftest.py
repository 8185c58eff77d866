import shutil
import tempfile

import pytest

from information_retrieval_spark.build import IndexBuilder, IndexConfig
from information_retrieval_spark.corpus import fixture_docs, synthetic_corpus
from information_retrieval_spark.query import QueryEngine
from information_retrieval_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="irs-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def work_dir():
    d = tempfile.mkdtemp(prefix="irs_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def fixture_index(spark, work_dir):
    docs = fixture_docs(spark)
    return IndexBuilder(spark, f"{work_dir}/fixture_idx", IndexConfig()).build(docs, resume=False)


@pytest.fixture(scope="session")
def fixture_engine(fixture_index):
    return QueryEngine(fixture_index)


@pytest.fixture(scope="session")
def synth_docs(spark):
    return synthetic_corpus(spark, n_docs=300, seed=42)


@pytest.fixture(scope="session")
def synth_index(spark, work_dir, synth_docs):
    # tiny blocks/buckets so multi-block & multi-bucket paths are exercised
    cfg = IndexConfig(docs_per_block=16, blocks_per_bucket=4)
    return IndexBuilder(spark, f"{work_dir}/synth_idx", cfg).build(synth_docs, resume=False)


@pytest.fixture(scope="session")
def synth_engine(synth_index):
    return QueryEngine(synth_index)
