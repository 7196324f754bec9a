"""Engine configuration — the reference's .env surface as a typed config.

Parity: WikipediaCrawler/.env.example (queue names, seed URL, replica count)
and the operational knobs in BASELINE.md. Queue names become table/checkpoint
paths; replica counts become partition parallelism; broker TTLs become retry
backoff seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    """Crawler semantics knobs (reference values as defaults)."""

    seed_urls: tuple[str, ...] = ("https://en.wikipedia.org/wiki/Main_Page",)
    domain_suffix: str = "en.wikipedia.org"  # parser/app/main.py:24
    fetch_timeout_s: int = 10  # fetcher/app/main.py:33
    retry_backoff_s: int = 30  # startup/init_queues.py:23-26 (x-message-ttl)
    max_retries: int = 3
    fetch_parallelism: int = 3  # FETCHER_REPLICAS, docker-compose.yaml:91-93
    max_rounds: int = 10
    max_per_host: int = 64  # politeness cap per fetch wave


@dataclass(frozen=True)
class PipelineConfig:
    """Batch-ETL knobs (reference: ETL/dags/pipeline.py defaults)."""

    landing_dir: str = "landing"
    archive_dir: str = "archive"
    task_retries: int = 1  # pipeline.py:19
    output_partitions: dict[str, list[str]] = field(default_factory=dict)
