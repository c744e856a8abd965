"""Custom Python DataSource (Spark 4 API): the synthetic web-page
landing source.

The reference's S7 web-page source is a Selenium scraper
(``scraper/selenium_scraper.py:20-199``) — acquisition infrastructure,
out of engine scope by design. What IS engine scope is the landing
contract: pages arrive as (url, fetched_batch, html) rows that the
X1-X6 extractors consume. This module implements that contract as a
first-class Spark 4 ``DataSource``, so a landing zone can be mounted
with ``spark.read.format("leader_pages")`` like any other source —
partition planning, schema, and option handling all go through Spark's
own source API instead of an ad-hoc loader.

The generator is deterministic (md5-derived page structure, same
synthesis family as the extraction oracles), so tests can assert exact
contents; a production deployment swaps the per-partition ``read``
body for fetching from the real landing bucket — the partition layout
(one partition per page shard, independent readers) is exactly how the
scraper's per-proxy output dirs would be mounted at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class PageShard(InputPartition):
    def __init__(self, shard: int, pages_per_shard: int):
        self.shard = shard
        self.pages_per_shard = pages_per_shard


def synth_page(page_id: int) -> tuple[str, int, str]:
    """Deterministic synthetic page: url, shard-able id hash, html.
    Exported so tests can assert source output exactly."""
    h = hashlib.md5(f"page|{page_id}".encode()).hexdigest()
    title = f"Person {h[:6]}"
    html = (
        f"<html><head><title>{title}</title></head><body>"
        f"<h1>{title}</h1>"
        f"<dl><dt>Alias</dt><dd>p{h[:4]}</dd></dl>"
        f"<p>profile text {h[6:14]}</p>"
        "</body></html>"
    )
    return (f"https://example.test/p/{h[:10]}", page_id, html)


class LeaderPagesDataSource(DataSource):
    """``spark.read.format("leader_pages").option("n_pages", N)
    .option("n_shards", K)`` → (url, page_id, html)."""

    @classmethod
    def name(cls) -> str:
        return "leader_pages"

    def schema(self) -> str:
        return "url string, page_id bigint, html string"

    def reader(self, schema: StructType) -> "LeaderPagesReader":
        return LeaderPagesReader(self.options)


class LeaderPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("n_pages", 64))
        self.n_shards = int(options.get("n_shards", 4))

    def partitions(self) -> list[PageShard]:
        per = -(-self.n_pages // self.n_shards)  # ceil
        return [PageShard(i, per) for i in range(self.n_shards)]

    def read(self, partition: PageShard) -> Iterator[tuple]:
        start = partition.shard * partition.pages_per_shard
        stop = min(start + partition.pages_per_shard, self.n_pages)
        for page_id in range(start, stop):
            yield synth_page(page_id)


def register(spark) -> None:
    """Idempotent registration of the format with a SparkSession."""
    spark.dataSource.register(LeaderPagesDataSource)
