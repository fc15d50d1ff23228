"""HMAC-SHA256 payload signing for the export sink (reference F13/S6).

Reference parity: ``generateHMACSignature`` —
/root/reference/internal/api/handlers.go:379-383.

This is deliberately driver-side Python: the sink receives ONE signed JSON
payload per export day, not one per partition, so a Spark-native keyed hash
would be the wrong shape (and ``F.sha2`` is unkeyed anyway).
"""

from __future__ import annotations

import hashlib
import hmac


def hmac_sha256_hex(secret: str, payload: bytes) -> str:
    """hex(HMAC-SHA256(secret, payload)) — byte-for-byte the Go behavior."""
    return hmac.new(secret.encode("utf-8"), payload, hashlib.sha256).hexdigest()
