import pytest

from vtshaver_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="vtshaver-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def features(spark):
    from vtshaver_spark.sources.synthetic import features_df

    df = features_df(spark).cache()
    df.count()
    return df
