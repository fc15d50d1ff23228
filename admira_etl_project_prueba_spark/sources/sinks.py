"""Training-data export sinks.

The reference's only sink is the HMAC-signed JSON POST (S6,
handlers.go:331-383 — implemented in operators/export.py).  This module
adds the corpus-scale handoff: sharded JSONL plus a manifest, the format
training loaders consume (one shard per reader worker, manifest for
integrity + resumability).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from admira_etl_project_prueba_spark.functions import fs


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

    # Hadoop-FS listing + manifest write (functions/fs) — the sink must
    # behave identically on HDFS/S3A URIs, same posture as the stores
    spark = df.sparkSession
    shard_files = sorted(
        f
        for f in fs.list_child_names(spark, path)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    manifest = {
        "format": "jsonl",
        "n_rows": df.count(),
        "n_shards": len(shard_files),
        "shard_key": shard_key,
        "schema": df.schema.jsonValue(),
        "shards": shard_files,
    }
    fs.write_text(spark, f"{path.rstrip('/')}/manifest.json", json.dumps(manifest, indent=2))
    return manifest


def read_jsonl_shards(spark, path: str) -> DataFrame:
    """Read a sharded JSONL export back with its manifest schema (no
    inference pass — manifests make re-reads schema-stable)."""
    from pyspark.sql.types import StructType

    manifest = json.loads(
        fs.read_text(spark, f"{path.rstrip('/')}/manifest.json")
    )
    schema = StructType.fromJson(manifest["schema"])
    return spark.read.schema(schema).json(f"{path.rstrip('/')}/part-*")


def read_jsonl_audited(
    spark,
    path: str,
    schema_ddl: str,
) -> tuple[DataFrame, DataFrame]:
    """Read raw JSONL (the format training-data dumps actually arrive in)
    with a malformed-record AUDIT instead of silent drops or job aborts.

    PERMISSIVE mode + ``columnNameOfCorruptRecord``: well-formed rows
    parse into the declared schema; malformed lines land with the raw
    text in the corrupt column and NULLs elsewhere.  Returns
    ``(clean, corrupt)`` — clean rows schema-typed, corrupt rows as
    (raw_line,) for quarantine/reprocessing.  At 100 TB a dump ALWAYS
    has bad lines; dropping them silently (DROPMALFORMED) destroys
    lineage and failing the job (FAILFAST) destroys the run — the audit
    split is the production posture.

    Caveat (documented Spark behavior): a JSON line that parses but
    type-mismatches a column yields a row that is BOTH partially NULL
    and captured in the corrupt column; the split below sends it to
    ``corrupt``, never double-counts.
    """
    full = spark.read.schema(f"{schema_ddl}, _corrupt string").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt").json(path)
    # Spark requires caching/materializing before filtering on the
    # corrupt column alone (queries over only internal corrupt column
    # are disallowed un-cached)
    full = full.cache()
    clean = full.filter("_corrupt IS NULL").drop("_corrupt")
    corrupt = full.filter("_corrupt IS NOT NULL").select(
        full["_corrupt"].alias("raw_line")
    )
    return clean, corrupt


def read_csv_audited(
    spark,
    path: str,
    schema_ddl: str,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl_audited`: schema-declared CSV read
    with a malformed-record audit split instead of silent drops or job
    aborts — the other format bulk data dumps actually arrive in.

    Same PERMISSIVE + corrupt-column contract: rows that fail the
    declared schema (wrong arity, untypeable cells) land raw in
    ``corrupt``; clean rows come back fully typed.  No schema inference
    pass — inference re-reads the data AND yields data-dependent types,
    both wrong at 100 TB.
    """
    full = (
        spark.read.schema(f"{schema_ddl}, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
    full = full.cache()  # required before filtering on the corrupt column
    clean = full.filter("_corrupt IS NULL").drop("_corrupt")
    corrupt = full.filter("_corrupt IS NOT NULL").select(
        full["_corrupt"].alias("raw_line")
    )
    return clean, corrupt
