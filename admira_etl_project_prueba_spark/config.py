"""Environment configuration (reference S7).

Reference parity: /root/reference/pkg/config/config.go:22-40 + .env.example —
same variable names and defaults.  A plain dataclass: Spark confs are engine
tuning and live in session.py, not here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _load_dotenv(path: str = ".env") -> dict[str, str]:
    """Minimal .env reader (KEY=VALUE lines, # comments)."""
    out: dict[str, str] = {}
    if not os.path.isfile(path):
        return out
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip().strip("'\"")
    return out


@dataclass
class Config:
    port: int = 8080
    ads_api_url: str = ""
    crm_api_url: str = ""
    sink_url: str = ""
    sink_secret: str = ""
    timeout_seconds: float = 30.0   # config.go:26,36
    max_retries: int = 3            # config.go:27,37
    backoff_ms: int = 1000          # config.go:28,38
    store_path: str = field(default="/tmp/admira_metrics_store")
    #: beyond-reference: the stream_metrics_ingest batch log this
    #: deployment folds from ("" = no streaming ingest configured —
    #: /store/health then reports stream_log: null)
    stream_log_path: str = ""

    @classmethod
    def from_env(cls, dotenv_path: str = ".env") -> "Config":
        env = {**_load_dotenv(dotenv_path), **os.environ}
        return cls(
            port=int(env.get("PORT", 8080)),
            ads_api_url=env.get("ADS_API_URL", ""),
            crm_api_url=env.get("CRM_API_URL", ""),
            sink_url=env.get("SINK_URL", ""),
            sink_secret=env.get("SINK_SECRET", ""),
            timeout_seconds=float(env.get("TIMEOUT_SECONDS", 30)),
            max_retries=int(env.get("MAX_RETRIES", 3)),
            backoff_ms=int(env.get("BACKOFF_MS", 1000)),
            store_path=env.get("STORE_PATH", "/tmp/admira_metrics_store"),
            stream_log_path=env.get("STREAM_LOG_PATH", ""),
        )
