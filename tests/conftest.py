import pytest

from logstash_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from logstash_spark.sources.transcripts import register_transcripts

    return register_transcripts(spark, SF_DIR).cache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Session-scoped alias for hypothesis suites (function-scoped fixtures
    trigger hypothesis health-check errors)."""
    return spark
