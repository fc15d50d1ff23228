"""Python Data Source (Spark 4 API): the reference's HTTP JSON APIs as a
first-class ``spark.read.format(...)`` source.

The driver-side fetch in http.py is the reference-faithful path (one
payload per ingest, extractor.go:23-56).  This module is the scale path:
``spark.dataSource.register(EnvelopeApiDataSource)`` then

    spark.read.format("envelope_api")
         .option("urls", "http://api/page1,http://api/page2,...")
         .option("source_type", "ads")          # or "crm"
         .load()

Each URL becomes an InputPartition, so N API pages are fetched by N
executor tasks in parallel — at 100 TB ingest the page list comes from a
manifest and the cluster fans out the I/O instead of serializing it
through the driver.  Retry/backoff semantics match the reference
(linear backoff, config via options).

Rows come back in WIRE shape (the envelope's record fields, created_at
still a raw string); downstream conforming — flexible date parse, zero
fills, ingest stamping — is shared with the payload path so the two can
never drift.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ADS_WIRE_SCHEMA = (
    "date string, campaign_id string, channel string, clicks int, "
    "impressions int, cost double, utm_campaign string, utm_source string, "
    "utm_medium string"
)
CRM_WIRE_SCHEMA = (
    "opportunity_id string, contact_email string, stage string, "
    "amount double, created_at string, utm_campaign string, "
    "utm_source string, utm_medium string"
)

_ADS_FIELDS = [f.split()[0] for f in ADS_WIRE_SCHEMA.split(", ")]
_CRM_FIELDS = [f.split()[0] for f in CRM_WIRE_SCHEMA.split(", ")]


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class EnvelopeApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.source_type = options.get("source_type", "ads")
        urls = options.get("urls") or options.get("url") or ""
        self.urls = [u.strip() for u in urls.split(",") if u.strip()]
        self.timeout = int(options.get("timeout_seconds", "30"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.backoff_ms = int(options.get("backoff_ms", "1000"))

    def partitions(self):
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition):
        # runs ON AN EXECUTOR: stdlib-only fetch with the reference's
        # linear retry/backoff (extractor.go:23-56)
        import json
        import time
        import urllib.request

        payload = None
        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                with urllib.request.urlopen(partition.url, timeout=self.timeout) as r:
                    if r.status != 200:
                        raise OSError(f"HTTP {r.status}")
                    payload = json.loads(r.read())
                    break
            except Exception as exc:  # noqa: BLE001 — retry any transport error
                last_err = exc
                time.sleep(self.backoff_ms * (attempt + 1) / 1000.0)
        if payload is None:
            raise RuntimeError(
                f"fetch failed after {self.max_retries} attempts: {partition.url}"
            ) from last_err

        if self.source_type == "ads":
            records = payload.get("external", {}).get("ads", {}).get("performance", [])
            fields = _ADS_FIELDS
            zeros = {"clicks": 0, "impressions": 0, "cost": 0.0}
        else:
            records = payload.get("external", {}).get("crm", {}).get("opportunities", [])
            fields = _CRM_FIELDS
            zeros = {"amount": 0.0}
        for rec in records:
            # Go-unmarshal zero values for absent fields (ads.go/crm.go)
            yield tuple(
                rec.get(f, zeros.get(f, "" if f != "created_at" else None))
                for f in fields
            )


class EnvelopeApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch page consumption: the offset is the index of the next
    unread page, so progress checkpoints/replays exactly (pages are
    deterministic URLs — ``readBetweenOffsets`` just refetches the range).
    In production the page list is a feed/manifest that grows; each batch
    consumes up to ``pages_per_batch`` new pages."""

    def __init__(self, options: dict):
        self._batch = EnvelopeApiReader(options)
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, lo: int, hi: int):
        out = []
        for url in self._batch.urls[lo:hi]:
            out.extend(self._batch.read(_UrlPartition(url)))
        return out

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.pages_per_batch, len(self._batch.urls))
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["next"], end["next"]))


class EnvelopeApiDataSource(DataSource):
    """``format("envelope_api")`` — partition-parallel envelope ingestion
    (batch) and offset-tracked page consumption (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "envelope_api"

    def schema(self) -> str:
        if self.options.get("source_type", "ads") == "ads":
            return ADS_WIRE_SCHEMA
        return CRM_WIRE_SCHEMA

    def reader(self, schema) -> EnvelopeApiReader:
        return EnvelopeApiReader(dict(self.options))

    def simpleStreamReader(self, schema) -> EnvelopeApiStreamReader:
        return EnvelopeApiStreamReader(dict(self.options))
