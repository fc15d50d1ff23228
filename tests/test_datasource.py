"""Python Data Source API: the envelope HTTP APIs as spark.read.format
with one InputPartition per URL (executor-parallel page fetch)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from admira_etl_project_prueba_spark.sources.datasource import EnvelopeApiDataSource


@pytest.fixture()
def paged_api():
    calls = {"n500": 0}

    def page(i):
        return {
            "external": {"ads": {"performance": [
                {"date": f"2024-03-0{i}", "campaign_id": f"C-{i}", "channel": "g",
                 "clicks": i, "impressions": 10 * i, "cost": 1.5 * i,
                 "utm_campaign": "x", "utm_source": "google", "utm_medium": "cpc"},
            ]}}
        }

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/flaky"):
                calls["n500"] += 1
                if calls["n500"] == 1:       # first hit fails → retry succeeds
                    self.send_response(500)
                    self.end_headers()
                    return
                body = json.dumps(page(9))
            elif self.path.startswith("/crm"):
                body = json.dumps({"external": {"crm": {"opportunities": [
                    {"opportunity_id": "O-1", "stage": "lead",
                     "created_at": "2024-03-01", "utm_campaign": "x",
                     "utm_source": "google", "utm_medium": "cpc"},  # partial row
                ]}}})
            else:
                body = json.dumps(page(int(self.path[-1])))
            data = body.encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(data)

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_envelope_datasource_parallel_pages(spark, paged_api):
    spark.dataSource.register(EnvelopeApiDataSource)
    df = (
        spark.read.format("envelope_api")
        .option("urls", f"{paged_api}/page1,{paged_api}/page2,{paged_api}/page3")
        .option("source_type", "ads")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3     # one partition per URL
    rows = {r["campaign_id"]: r for r in df.collect()}
    assert set(rows) == {"C-1", "C-2", "C-3"}
    assert rows["C-2"]["clicks"] == 2 and rows["C-2"]["cost"] == 3.0


def test_envelope_datasource_retry_and_crm_zero_values(spark, paged_api):
    spark.dataSource.register(EnvelopeApiDataSource)
    flaky = (
        spark.read.format("envelope_api")
        .option("urls", f"{paged_api}/flaky")
        .option("source_type", "ads")
        .option("backoff_ms", "10")
        .load()
    )
    assert flaky.count() == 1                  # 500 then 200: retry succeeded

    crm = (
        spark.read.format("envelope_api")
        .option("urls", f"{paged_api}/crm")
        .option("source_type", "crm")
        .load()
    )
    r = crm.first()
    assert r["stage"] == "lead"
    assert r["contact_email"] == "" and r["amount"] == 0.0  # Go zero values


def test_envelope_datasource_streaming_pages(spark, paged_api, tmp_path):
    """readStream over the same source: pages consumed one per micro-batch
    with the page index as the checkpointed offset."""
    spark.dataSource.register(EnvelopeApiDataSource)
    collected = []

    def run_once():
        stream = (
            spark.readStream.format("envelope_api")
            .option("urls", f"{paged_api}/page1,{paged_api}/page2,{paged_api}/page3")
            .option("source_type", "ads")
            .option("pages_per_batch", "1")
            .load()
        )
        out_dir = tmp_path / "env_out"
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out_dir))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "env_ckpt"))
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["campaign_id"], r["clicks"])
            for r in spark.read.parquet(str(out_dir)).collect()
        )

    # each restart resumes from the checkpointed page offset
    assert run_once() == [("C-1", 1)]
    assert run_once() == [("C-1", 1), ("C-2", 2)]
    assert run_once() == [("C-1", 1), ("C-2", 2), ("C-3", 3)]
    assert run_once() == [("C-1", 1), ("C-2", 2), ("C-3", 3)]  # exhausted: no dups


def test_jsonl_shard_roundtrip(spark, tmp_path, sf_dir):
    """Sharded JSONL export: manifest accounts for every row; the re-read
    (manifest schema, no inference) matches the source exactly."""
    from admira_etl_project_prueba_spark.sources.sinks import (
        read_jsonl_shards,
        write_jsonl_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, out, shards=4)
    assert manifest["n_rows"] == docs.count()
    assert manifest["n_shards"] == 4

    back = read_jsonl_shards(spark, out)
    assert back.schema == docs.schema  # manifest schema, not inference
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_jsonl_shard_key_colocates(spark, tmp_path):
    import json as _json

    from admira_etl_project_prueba_spark.sources.sinks import write_jsonl_shards

    df = spark.createDataFrame(
        [(i % 5, i) for i in range(100)], "group long, item long"
    )
    out = str(tmp_path / "keyed")
    write_jsonl_shards(df, out, shards=8, shard_key="group")
    import os

    seen = {}
    for f in os.listdir(out):
        if f.startswith("part-"):
            with open(os.path.join(out, f)) as fh:
                for line in fh:
                    g = _json.loads(line)["group"]
                    seen.setdefault(g, set()).add(f)
    assert all(len(files) == 1 for files in seen.values())  # one shard per group


def test_read_csv_audited_splits_clean_and_corrupt(spark, tmp_path):
    """Typed rows parse; wrong-arity and untypeable rows quarantine with
    the raw line; nothing silently drops."""
    from admira_etl_project_prueba_spark.sources.sinks import read_csv_audited

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,2.5\n"
        "2,beta,notanumber\n"      # untypeable score
        "3,gamma\n"                 # wrong arity
        "4,delta,9.0\n"
    )
    clean, corrupt = read_csv_audited(
        spark, str(p), "id long, name string, score double"
    )
    got = {r["id"]: (r["name"], r["score"]) for r in clean.collect()}
    assert got == {1: ("alpha", 2.5), 4: ("delta", 9.0)}
    bad = {r["raw_line"] for r in corrupt.collect()}
    assert bad == {"2,beta,notanumber", "3,gamma"}
    assert clean.count() + corrupt.count() == 4
