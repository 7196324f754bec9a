"""Every catalog query must handle completely empty tables without raising —
the new-dataset-onboarding scenario (schemas exist, no rows yet)."""

from __future__ import annotations

import pytest

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.sources import TABLE_NAMES, load_table


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).limit(0).write.parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    qd = all_queries()[name]
    rows = qd.fn(spark, empty_sf_dir).collect()
    # global aggregates may legitimately emit a single all-null/zero row;
    # everything else must be empty — either way, no exception is the contract
    assert len(rows) <= 1
