"""Route-parity regression gate for the HTTP tier.

The round-5 gap class (a service method implemented but unreachable via
``serve.py``) recurred once — this test makes it structurally impossible
to land silently:

* COVERAGE — every public method of ``CorpusService`` and
  ``MetricsService`` must appear in the route table below.  A new
  service method without a table entry fails the test; adding the entry
  then forces the dispatch + passthrough checks to pass, i.e. a real
  route must exist.
* DISPATCH — each route is driven over a real socket against recording
  stubs; the named method must be the one called.
* PASSTHROUGH — the recorded kwargs must equal the table's expectation
  (every value deliberately non-default, so a dropped query param can't
  hide behind a default), and must cover EVERY named parameter of the
  real method's signature — a method that grows a keyword the route
  doesn't plumb fails here.
"""

from __future__ import annotations

import inspect
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from admira_etl_project_prueba_spark.corpus_service import CorpusService
from admira_etl_project_prueba_spark.serve import make_handler
from admira_etl_project_prueba_spark.service import MetricsService

RID = "req-parity-1"

#: external query embedding for the POST body route — 0.5s survive a
#: JSON round-trip bit-exactly
_QV = [0.5] * 64

# method -> (http method, path?query with every param set NON-default,
#            exact kwargs the handler must pass[, JSON body to send])
CORPUS_ROUTES = {
    "health_report": ("GET", "/corpus/health", {"request_id": RID}),
    "dedup_summary": (
        "GET", "/corpus/dedup?normalized=true",
        {"normalized": True, "request_id": RID},
    ),
    "near_dup_pairs": (
        "GET",
        "/corpus/dedup/pairs?method=semantic&limit=7&offset=3&threshold=0.8",
        {
            "method": "semantic", "limit": 7, "offset": 3,
            "threshold": 0.8, "request_id": RID,
        },
    ),
    "dup_profile": (
        "GET", "/corpus/dup_profile?normalized=true",
        {"normalized": True, "request_id": RID},
    ),
    "similar_docs": (
        "GET", "/corpus/similar?vec_id=5&k=3&mode=pq",
        {"vec_id": 5, "k": 3, "mode": "pq", "request_id": RID},
    ),
    "similar_by_vector": (
        "POST", "/corpus/similar",
        {
            "query_vec": _QV, "k": 4, "mode": "pq_rerank",
            "request_id": RID,
        },
        {"query_vec": _QV, "k": 4, "mode": "pq_rerank"},
    ),
    "similar_by_vectors": (
        "POST", "/corpus/similar",
        {
            "query_vecs": [_QV, _QV], "k": 3, "mode": "pq",
            "request_id": RID,
        },
        {"query_vecs": [_QV, _QV], "k": 3, "mode": "pq"},
    ),
    "importance_weights": (
        "GET", "/corpus/weights?target_lang=es&limit=7",
        {"target_lang": "es", "limit": 7, "request_id": RID},
    ),
    "perplexity_outliers": (
        "GET", "/corpus/perplexity?reference_lang=es&limit=9",
        {"reference_lang": "es", "limit": 9, "request_id": RID},
    ),
    "recall_report": (
        "GET", "/corpus/recall?threshold=0.7",
        {"threshold": 0.7, "request_id": RID},
    ),
    "fertility_report": ("GET", "/corpus/fertility", {"request_id": RID}),
    "lang_mismatch_report": (
        "GET", "/corpus/lang_mismatch?limit=11",
        {"limit": 11, "request_id": RID},
    ),
    "language_breakdown": ("GET", "/corpus/languages", {"request_id": RID}),
    "source_report": (
        "GET", "/corpus/sources?min_kept_fraction=0.25",
        {"min_kept_fraction": 0.25, "request_id": RID},
    ),
    "pii_report": ("GET", "/corpus/pii", {"request_id": RID}),
    "boilerplate_report": (
        "GET", "/corpus/boilerplate?threshold=0.6&segment_tokens=5",
        {"threshold": 0.6, "segment_tokens": 5, "request_id": RID},
    ),
    "search": (
        "GET", "/corpus/search?q=zz&mode=hybrid&limit=4",
        {"q": "zz", "mode": "hybrid", "limit": 4, "request_id": RID},
    ),
    "drift_report": (
        "GET",
        "/corpus/drift?kl_threshold=0.9&base=/b&current=/c"
        "&psi_threshold=0.5&n_bins=64",
        {
            "kl_threshold": 0.9, "base": "/b", "current": "/c",
            "psi_threshold": 0.5, "n_bins": 64, "request_id": RID,
        },
    ),
    "quality_report": ("GET", "/corpus/quality", {"request_id": RID}),
    "index_health": ("GET", "/corpus/index_health", {"request_id": RID}),
    "index_retrain": (
        "POST", "/corpus/index_retrain?n_centroids=12&assign_mode=coarse",
        {"n_centroids": 12, "assign_mode": "coarse", "request_id": RID},
    ),
    "index_compact": ("POST", "/corpus/index_compact", {"request_id": RID}),
    "assemble": (
        "POST", "/corpus/assemble?train_pct=70&salt=s2&langs=en,fr",
        {
            "langs": ("en", "fr"), "train_pct": 70, "salt": "s2",
            "request_id": RID,
        },
    ),
}

METRICS_ROUTES = {
    "healthz": ("GET", "/healthz", {}),
    "readyz": ("GET", "/readyz", {}),
    "store_health": ("GET", "/store/health", {"request_id": RID}),
    "ingest_run": (
        "POST", "/ingest/run?since=2024-02-03&store_mode=replace",
        {"since": "2024-02-03", "store_mode": "replace", "request_id": RID},
    ),
    "export_run": (
        "POST", "/export/run?date=2024-02-03",
        {"date": "2024-02-03", "request_id": RID},
    ),
    "metrics_channel": (
        "GET",
        "/metrics/channel?channel=x&from=2024-01-01&to=2024-01-31"
        "&limit=7&offset=3",
        {
            "channel": "x", "date_from": "2024-01-01",
            "date_to": "2024-01-31", "limit": 7, "offset": 3,
            "request_id": RID,
        },
    ),
    "metrics_funnel": (
        "GET", "/metrics/funnel?utm_campaign=c&from=2024-01-01&to=2024-01-31",
        {
            "utm_campaign": "c", "date_from": "2024-01-01",
            "date_to": "2024-01-31", "request_id": RID,
        },
    ),
    "debug_ads": (
        "GET", "/debug/ads?date=2024-02-03",
        {"date": "2024-02-03", "request_id": RID},
    ),
    "debug_crm": (
        "GET", "/debug/crm?date=2024-02-03",
        {"date": "2024-02-03", "request_id": RID},
    ),
    "debug_matches": (
        "GET", "/debug/matches?utm_campaign=c",
        {"utm_campaign": "c", "request_id": RID},
    ),
}


def _public_methods(cls) -> set[str]:
    return {
        n
        for n, m in vars(cls).items()
        if not n.startswith("_") and inspect.isfunction(m)
    }


class _Recorder:
    """Duck-types any service: records (method name -> kwargs), returns
    an empty-dict envelope so the handler can serialize a 200."""

    def __init__(self):
        self.calls: dict[str, dict] = {}

    def __getattr__(self, name):
        def record(**kwargs):
            self.calls[name] = kwargs
            return {"stub": name}

        return record


def test_every_service_method_has_a_route_entry():
    """A new public method on either service class without a route-table
    entry fails HERE — the author must add the route AND the entry."""
    assert _public_methods(CorpusService) == set(CORPUS_ROUTES)
    assert _public_methods(MetricsService) == set(METRICS_ROUTES)


def test_route_kwargs_cover_every_signature_param():
    """Each table entry must exercise EVERY named parameter of the real
    method — so a method that grows a keyword forces the route (and this
    table) to plumb it."""
    for cls, table in ((CorpusService, CORPUS_ROUTES), (MetricsService, METRICS_ROUTES)):
        for name, (_, _, kwargs, *_rest) in table.items():
            sig = inspect.signature(getattr(cls, name))
            params = set(sig.parameters) - {"self"}
            assert params == set(kwargs), (
                f"{cls.__name__}.{name}: route passes {sorted(kwargs)}, "
                f"signature wants {sorted(params)}"
            )


@pytest.fixture()
def parity_server():
    svc, corpus = _Recorder(), _Recorder()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(svc, corpus=corpus)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", svc, corpus
    server.shutdown()


def _call(base: str, http_method: str, path: str, body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, method=http_method, data=data)
    req.add_header("X-Request-ID", RID)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def test_every_route_dispatches_with_full_passthrough(parity_server):
    base, svc, corpus = parity_server
    for name, (http_method, path, expected, *rest) in CORPUS_ROUTES.items():
        code, body = _call(base, http_method, path, rest[0] if rest else None)
        assert code == 200, f"{name}: {code} {body}"
        assert corpus.calls.get(name) == expected, (
            f"{name}: dispatched kwargs {corpus.calls.get(name)} "
            f"!= expected {expected}"
        )
    for name, (http_method, path, expected) in METRICS_ROUTES.items():
        code, body = _call(base, http_method, path)
        assert code == 200, f"{name}: {code} {body}"
        assert svc.calls.get(name) == expected


def test_post_similar_body_validation_is_400(parity_server):
    """POST /corpus/similar must 400 — without dispatching — on a
    missing body, non-object or malformed JSON, and a non-int k; a
    silently defaulted body would turn garbage into a full ANN query."""
    base, _, corpus = parity_server
    assert _call(base, "POST", "/corpus/similar")[0] == 400
    assert _call(base, "POST", "/corpus/similar", [1, 2])[0] == 400
    assert _call(
        base, "POST", "/corpus/similar", {"query_vec": _QV, "k": "three"}
    )[0] == 400
    req = urllib.request.Request(
        f"{base}/corpus/similar", method="POST", data=b"{not json"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    # giving both keys is ambiguous — 400, no dispatch to either method
    assert _call(
        base, "POST", "/corpus/similar",
        {"query_vec": _QV, "query_vecs": [_QV]},
    )[0] == 400
    assert "similar_by_vector" not in corpus.calls
    assert "similar_by_vectors" not in corpus.calls


def test_post_similar_k_default_is_per_form(parity_server):
    """A body without k must get each METHOD's documented default — 10
    for the single form, 5 for the batched form — not one shared route
    fallback that silently hands batch callers 10 hits per query."""
    base, _, corpus = parity_server
    assert _call(base, "POST", "/corpus/similar", {"query_vec": _QV})[0] == 200
    assert corpus.calls["similar_by_vector"]["k"] == 10
    assert _call(
        base, "POST", "/corpus/similar", {"query_vecs": [_QV]}
    )[0] == 200
    assert corpus.calls["similar_by_vectors"]["k"] == 5


def test_index_retrain_invalid_n_centroids_is_400(parity_server):
    """_int()-style silent default would map garbage to a DESTRUCTIVE
    centroid count; the route must 400 on unparseable or < 1 values and
    never dispatch to the service."""
    base, _, corpus = parity_server
    for q in ("abc", "0", "-4"):
        req = urllib.request.Request(
            f"{base}/corpus/index_retrain?n_centroids={q}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400, q
    assert "index_retrain" not in corpus.calls
