"""Training-data export sinks.

The reference's only sink is the HMAC-signed JSON POST (S6,
handlers.go:331-383 — implemented in operators/export.py).  This module
adds the corpus-scale handoff: sharded JSONL plus a manifest, the format
training loaders consume (one shard per reader worker, manifest for
integrity + resumability).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shards: int = 16,
    shard_key: str | None = None,
) -> dict:
    """Write ``df`` as ``shards`` JSONL files plus ``manifest.json``.

    * ``shard_key=None``: round-robin repartition — uniform shard sizes,
      the right default for training (loaders want balanced workers).
    * ``shard_key=<col>``: hash-partition by that column — co-locates a
      key's rows in one shard (e.g. all of a document's chunks).

    The manifest records row count, schema, and per-shard files so a
    consumer can verify completeness without listing-and-hoping.  Returns
    the manifest dict.
    """
    if shard_key is None:
        out = df.repartition(shards)
    else:
        out = df.repartition(shards, shard_key)
    out.write.mode("overwrite").json(path)

    shard_files = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and not f.endswith(".crc")
    )
    manifest = {
        "format": "jsonl",
        "n_rows": df.count(),
        "n_shards": len(shard_files),
        "shard_key": shard_key,
        "schema": df.schema.jsonValue(),
        "shards": shard_files,
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def read_jsonl_shards(spark, path: str) -> DataFrame:
    """Read a sharded JSONL export back with its manifest schema (no
    inference pass — manifests make re-reads schema-stable)."""
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    schema = StructType.fromJson(manifest["schema"])
    return spark.read.schema(schema).json(os.path.join(path, "part-*"))
