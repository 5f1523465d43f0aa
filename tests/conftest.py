import pytest


@pytest.fixture(scope="session")
def spark():
    from web_template_forensics_spark.session import get_spark

    s = get_spark("wtf-spark-tests", cores=4, shuffle_partitions=4)
    yield s
