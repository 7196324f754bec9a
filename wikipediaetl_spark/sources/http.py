"""HTTP source — distributed fetch over a URL DataFrame.

Spark has no native HTTP source; the reference fetches row-at-a-time with
requests inside a queue consumer (WikipediaCrawler/fetcher/app/main.py:28-38:
10 s timeout, raise-for-status, None on failure). The engine generalizes
that to a mapInPandas stage: each Arrow batch of URLs is fetched
worker-side, so fetching scales with executors, not with the driver.

The transport is injectable: production passes a real ``fetch(url) ->
(status, body, last_modified)`` callable (requests-based); tests pass a
deterministic fake. Without a transport the operator refuses to run rather
than silently hitting the network — this container has no egress.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

Transport = Callable[[str], tuple[int, str | None, str | None]]


def requests_transport(timeout_s: int = 10) -> Transport:
    """Real transport with the reference's fetch semantics
    (fetcher/app/main.py:28-38): GET with timeout, None body on any error,
    Last-Modified header passthrough (fetcher/app/main.py:63-77)."""
    import requests  # deferred: not needed for tests

    def fetch(url: str) -> tuple[int, str | None, str | None]:
        try:
            r = requests.get(url, timeout=timeout_s)
            r.raise_for_status()
            return r.status_code, r.text, r.headers.get("Last-Modified")
        except Exception:
            return 0, None, None

    return fetch


def fetch_urls(urls: DataFrame, transport: Transport) -> DataFrame:
    """urls(url) → (url, status, html, last_modified_raw).

    Failed fetches yield null html (the reference drops them at
    fetcher/app/main.py:91-94 — callers filter ``html IS NOT NULL``).
    Scale: repartition upstream to spread hot domains; the fetch itself is
    batch-parallel Arrow with no driver involvement.
    """
    if transport is None:
        raise ValueError("fetch_urls requires an explicit transport (no default egress)")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [transport(u) for u in pdf["url"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "status": [r[0] for r in results],
                    "html": [r[1] for r in results],
                    "last_modified_raw": [r[2] for r in results],
                }
            )

    return urls.select("url").mapInPandas(
        op, schema="url string, status int, html string, last_modified_raw string"
    )


def throttle_frontier(
    urls: DataFrame, max_per_host: int
) -> tuple[DataFrame, DataFrame]:
    """Politeness split: at most ``max_per_host`` URLs per host proceed this
    round; the rest defer to later rounds.

    The distributed form of crawl rate limiting: rank URLs within their host
    (deterministic ordering) and admit the first k — the deferred remainder
    feeds the next round's frontier, so a huge site cannot monopolize a
    fetch wave (the reference throttles implicitly via 3 fetcher replicas,
    WikipediaCrawler/docker-compose.yaml:91-93; this is the explicit,
    per-host version). Returns (admitted, deferred).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from wikipediaetl_spark.functions.urls import url_host

    ranked = urls.withColumn("_host", url_host(F.col("url"))).withColumn(
        "_rn", F.row_number().over(W.partitionBy("_host").orderBy("url"))
    )
    admitted = ranked.filter(F.col("_rn") <= max_per_host).drop("_host", "_rn")
    deferred = ranked.filter(F.col("_rn") > max_per_host).drop("_host", "_rn")
    return admitted, deferred
