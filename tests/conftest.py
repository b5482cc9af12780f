from __future__ import annotations

import pytest

from osm2geojson_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osm2geojson-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixtures(spark):
    from osm2geojson_spark.synth.osm import fixture_tables

    tabs = fixture_tables(spark)
    for df in tabs.values():
        df.cache().count()
    return tabs
