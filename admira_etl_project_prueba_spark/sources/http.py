"""HTTP JSON source with retry/backoff (reference S1).

Reference parity: ``fetchWithRetry`` —
/root/reference/internal/etl/extractor.go:23-56: per-attempt timeout,
``max_retries`` attempts, linear backoff ``backoff_ms * (attempt+1)``,
non-2xx counts as a failed attempt.

This is driver-side I/O by design (SURVEY.md §2.1): the sources are small
control-plane API payloads, not data-plane files.  The two extracts run
concurrently (a deliberate upgrade over the reference's sequential calls,
handlers.go:92-102).  For data-plane-scale HTTP ingestion the right tool is
a distributed read of the landed objects, not this function.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor


class FetchError(RuntimeError):
    """All retry attempts failed."""


def fetch_with_retry(
    url: str,
    timeout_seconds: float = 30.0,
    max_retries: int = 3,
    backoff_ms: int = 1000,
    _sleep=time.sleep,
    _opener=None,
) -> str:
    """GET ``url`` returning the body text; linear backoff between attempts."""
    opener = _opener or urllib.request.urlopen
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            with opener(url, timeout=timeout_seconds) as resp:
                status = getattr(resp, "status", 200)
                if status and not (200 <= status < 300):
                    raise FetchError(f"status {status} from {url}")
                body = resp.read()
                return body.decode("utf-8") if isinstance(body, bytes) else body
        except Exception as exc:  # timeout, connection, non-2xx
            last_err = exc
            if attempt < max_retries - 1:
                # linear backoff, extractor.go:36,43
                _sleep(backoff_ms * (attempt + 1) / 1000.0)
    raise FetchError(f"failed to fetch {url} after {max_retries} attempts") from last_err


def fetch_json(url: str, **kwargs) -> dict:
    return json.loads(fetch_with_retry(url, **kwargs))


def fetch_many(urls: list[str], **kwargs) -> list[str]:
    """Fetch several URLs concurrently (ads + crm extract in parallel)."""
    with ThreadPoolExecutor(max_workers=max(2, len(urls))) as pool:
        return list(pool.map(lambda u: fetch_with_retry(u, **kwargs), urls))
