"""Flexible timestamp parsing (reference F7/F8) and day-grain formatting.

Reference parity:
* ``parseDateTime`` — /root/reference/internal/models/crm.go:50-76: trim,
  replace ``/`` with ``-``, then try 8 layouts in order.
* fallback-to-now — crm.go:37-45: if every layout fails the record is KEPT
  and ``CreatedAt`` is stamped with wall-clock now.  That is
  nondeterministic and untestable, so the engine default (SURVEY.md §7
  decision 3) is: parse failure ⇒ ``created_at`` NULL + ``_date_fallback``
  flag true, and the consolidation step routes the row by its
  ``ingested_at`` day instead.  ``compat_now_fallback=True`` restores the
  literal reference behavior.

Implementation note: ``try_to_timestamp`` + ``coalesce`` keeps the whole
cascade inside codegen — one projection, no Python, no exceptions — and the
first matching layout wins exactly like the Go loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 8 accepted layouts, in the reference's trial order (crm.go:58-67).
# Go reference layouts → Spark datetime patterns.
TIMESTAMP_FORMATS: list[str] = [
    "yyyy-MM-dd'T'HH:mm:ss'Z'",     # 2006-01-02T15:04:05Z
    "yyyy-MM-dd HH:mm:ss",          # 2006-01-02 15:04:05
    "yyyy-MM-dd",                   # 2006-01-02
    "yyyy-MM-dd'T'HH:mm:ssXXX",     # RFC3339 / ±07:00 offset
    "yyyy-MM-dd HH:mm:ss Z",        # 2006-01-02 15:04:05 -0700
    "yyyy-MM-dd HH:mm:ss zzz",      # 2006-01-02 15:04:05 MST
    "yyyy-MM-dd HH:mm:ss.SSS",      # 2006-01-02 15:04:05.000
]


def normalize_raw_timestamp(col: Column | str) -> Column:
    """trim + '/'→'-' — the reference's pre-normalization (crm.go:52-56)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), "/", "-")


def parse_flexible_timestamp(col: Column | str) -> Column:
    """Try each accepted layout in order; NULL if none match.

    ``try_to_timestamp`` returns NULL (instead of raising) on mismatch, so
    ``coalesce`` picks the first layout that parses — same first-match-wins
    contract as the reference's loop.
    """
    norm = normalize_raw_timestamp(col)
    attempts = [F.try_to_timestamp(norm, F.lit(fmt)) for fmt in TIMESTAMP_FORMATS]
    # Final permissive attempt: Spark's own cast handles RFC3339 variants
    # with fractional seconds + offsets that the fixed list may miss.
    attempts.append(F.try_to_timestamp(norm))
    return F.coalesce(*attempts)


def day_string(ts: Column | str) -> Column:
    """timestamp → "YYYY-MM-DD" string (reference F10, transformer.go:82)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM-dd")
