"""SQL-view surface and concurrent-execution safety."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from wikipediaetl_spark.catalog import all_queries
from wikipediaetl_spark.sql import bootstrap_sql


def test_bootstrap_sql_star_schema_queryable(spark, sf_dir):
    names = bootstrap_sql(spark, sf_dir)
    assert {"pages", "categories", "page_categories", "html_texts", "lineitem"} <= set(names)
    # the reference's Superset query, as plain SQL over the views
    dist = spark.sql(
        """
        SELECT c.name AS category, count(*) AS n_pages
        FROM page_categories pc
        JOIN categories c ON pc.category_id = c.category_id
        GROUP BY c.name ORDER BY n_pages DESC, category LIMIT 5
        """
    ).collect()
    assert len(dist) == 5 and all(r.n_pages > 0 for r in dist)
    # cross-surface join: star schema view ⋈ fixture view
    joined = spark.sql(
        "SELECT count(*) AS n FROM pages p JOIN documents d "
        "ON p.file_name = concat('Doc_', CAST(d.doc_id AS STRING))"
    ).collect()[0].n
    assert joined == spark.table("pages").count()


def test_concurrent_query_execution(spark, sf_dir):
    """Four catalog queries on one session from four threads — including one
    that toggles session confs (BFS) — must all return correct results.
    Conf toggles are perf-only (results are deterministic by design at any
    partitioning), so concurrency can never corrupt output."""
    qs = all_queries()
    names = [
        "q01_pricing_summary",
        "q38_bfs_reachability",
        "q11_star_join",
        "q50_exact_dedup",
    ]
    expected = {n: sorted(map(str, qs[n].fn(spark, sf_dir).collect())) for n in names}

    def run(n):
        return n, sorted(map(str, qs[n].fn(spark, sf_dir).collect()))

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = dict(pool.map(run, names))
    for n in names:
        assert results[n] == expected[n], f"concurrent divergence in {n}"
