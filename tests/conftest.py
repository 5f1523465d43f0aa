import pytest


@pytest.fixture(scope="session")
def spark():
    from web_template_forensics_spark.session import get_spark

    s = get_spark("wtf-spark-tests", cores=4, shuffle_partitions=4)
    yield s


def reference_execution_enabled() -> bool:
    """Live-reference parity tests import and EXECUTE code from the
    /root/reference checkout — explicitly untrusted public content — so
    they are opt-in (ADVICE r4): set SPARK_GRAFT_REF_PARITY=1 to run
    them. The pinned-golden tests in the same files are the always-on
    contract; the live runs exist to re-derive those goldens."""
    import os

    return os.environ.get("SPARK_GRAFT_REF_PARITY") == "1"
