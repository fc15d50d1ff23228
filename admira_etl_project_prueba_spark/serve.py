"""Runnable HTTP tier: the reference's routes mounted 1:1 over the
framework-free service layer (stdlib ThreadingHTTPServer — no web
framework in the container, none needed).

Route table parity: /root/reference/cmd/server/main.go via
internal/api/handlers.go:41-59 —

    GET  /healthz            GET  /readyz
    GET  /store/health   (beyond-reference: fact-store layout + the
         stream-fold scheduling probe — pending batches, oldest age —
         when STREAM_LOG_PATH is configured)
    POST /ingest/run?since=  POST /export/run?date=
    GET  /metrics/channel?channel=&from=&to=&limit=&offset=
    GET  /metrics/funnel?utm_campaign=&from=&to=
    GET  /debug/ads?date=    GET  /debug/crm?date=
    GET  /debug/matches?utm_campaign=

With a ``CorpusService`` mounted, the beyond-reference corpus surface is
served 1:1 (every service method has a route, every method param a query
param):

    GET  /corpus/health       /corpus/dedup?normalized=
    GET  /corpus/dedup/pairs?method=&limit=&offset=&threshold=
    GET  /corpus/dup_profile?normalized=   /corpus/similar?vec_id=&k=&mode=
    GET  /corpus/weights?target_lang=&limit=
    GET  /corpus/perplexity?reference_lang=&limit=
    GET  /corpus/recall?threshold=         /corpus/languages
    GET  /corpus/sources?min_kept_fraction=   /corpus/pii
    GET  /corpus/boilerplate?threshold=&segment_tokens=
    GET  /corpus/search?q=&mode=&limit=    /corpus/fertility
    GET  /corpus/lang_mismatch?limit=      /corpus/quality
    GET  /corpus/drift?kl_threshold=  |  ?base=&current=&psi_threshold=
         (the latter diffs two persisted histogram snapshots via PSI)
    GET  /corpus/index_health   (index maintenance: fan-out, skew, triggers)
    POST /corpus/assemble?train_pct=&salt=
    POST /corpus/similar   (JSON body {"query_vec": [...], "k":, "mode":} —
         external-embedding ANN; k/mode fall back to query params; or
         {"query_vecs": [[...], ...]} for the BATCHED pq-only form)

Status mapping preserved: ValidationError → 400, EmptyExportError /
NotFoundError → 404, anything else → 500 with the error string.  The
inbound ``X-Request-ID`` header is echoed into every envelope (the
reference's middleware contract, middleware.go:11-37).

Run:  python -m admira_etl_project_prueba_spark.serve [--port 8080]
(config from env/.env exactly like the reference's pkg/config).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from admira_etl_project_prueba_spark.operators.export import EmptyExportError
from admira_etl_project_prueba_spark.service import (
    MetricsService,
    ValidationError,
)

# the corpus tier raises the SAME ValidationError class (corpus_service
# imports it from service), and its NotFoundError subclasses LookupError —
# the status mapping below covers both tiers with no extra imports


def _int(qs: dict, name: str, default: int) -> int:
    try:
        return int(qs.get(name, [default])[0])
    except (TypeError, ValueError):
        return default


def _float(qs: dict, name: str, default: float) -> float:
    try:
        return float(qs.get(name, [default])[0])
    except (TypeError, ValueError):
        return default


def _bool(qs: dict, name: str, default: bool = False) -> bool:
    vals = qs.get(name)
    if not vals:
        return default
    return str(vals[0]).lower() in ("1", "true", "yes")


def _first(qs: dict, name: str) -> str | None:
    vals = qs.get(name)
    return vals[0] if vals else None


def make_handler(svc: MetricsService, corpus=None):
    """Bind the service(s) into a request-handler class (stdlib
    pattern).  ``corpus`` (a CorpusService) additionally mounts the
    beyond-reference GET /corpus/* routes."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default; stderr stays clean
            pass

        def _send(self, code: int, body: dict) -> None:
            # rows carry datetimes (ingested_at); stringify like gin
            # marshals time.Time rather than failing the response
            payload = json.dumps(body, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _json_body(self) -> dict:
            """Parse the request's JSON object body (400 on absence or
            garbage — the same strict-validation posture as the query
            params: a malformed body must never be silently defaulted)."""
            try:
                n = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                raise ValidationError("invalid Content-Length")
            raw = self.rfile.read(n) if n > 0 else b""
            if not raw:
                raise ValidationError("missing JSON body")
            try:
                body = json.loads(raw)
            except ValueError:
                raise ValidationError("malformed JSON body")
            if not isinstance(body, dict):
                raise ValidationError("JSON body must be an object")
            return body

        def _dispatch(self, method: str) -> None:
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            rid = self.headers.get("X-Request-ID")
            try:
                route = (method, url.path)
                if route == ("GET", "/healthz"):
                    return self._send(200, svc.healthz())
                if route == ("GET", "/readyz"):
                    return self._send(200, svc.readyz())
                if route == ("GET", "/store/health"):
                    return self._send(200, svc.store_health(request_id=rid))
                if route == ("POST", "/ingest/run"):
                    # optional params are passed ONLY when supplied, so the
                    # service's own defaults stay the single source of truth
                    kw = {}
                    if _first(qs, "store_mode"):
                        kw["store_mode"] = _first(qs, "store_mode")
                    return self._send(
                        200,
                        svc.ingest_run(
                            since=_first(qs, "since"), request_id=rid, **kw
                        ),
                    )
                if route == ("POST", "/export/run"):
                    return self._send(
                        200, svc.export_run(date=_first(qs, "date"), request_id=rid)
                    )
                if route == ("GET", "/metrics/channel"):
                    return self._send(
                        200,
                        svc.metrics_channel(
                            channel=_first(qs, "channel"),
                            date_from=_first(qs, "from"),
                            date_to=_first(qs, "to"),
                            limit=_int(qs, "limit", 100),
                            offset=_int(qs, "offset", 0),
                            request_id=rid,
                        ),
                    )
                if route == ("GET", "/metrics/funnel"):
                    return self._send(
                        200,
                        svc.metrics_funnel(
                            utm_campaign=_first(qs, "utm_campaign"),
                            date_from=_first(qs, "from"),
                            date_to=_first(qs, "to"),
                            request_id=rid,
                        ),
                    )
                if route == ("GET", "/debug/ads"):
                    return self._send(
                        200, svc.debug_ads(date=_first(qs, "date"), request_id=rid)
                    )
                if route == ("GET", "/debug/crm"):
                    return self._send(
                        200, svc.debug_crm(date=_first(qs, "date"), request_id=rid)
                    )
                if route == ("GET", "/debug/matches"):
                    return self._send(
                        200,
                        svc.debug_matches(
                            utm_campaign=_first(qs, "utm_campaign"), request_id=rid
                        ),
                    )
                if corpus is not None and method == "GET":
                    if url.path == "/corpus/health":
                        return self._send(200, corpus.health_report(request_id=rid))
                    if url.path == "/corpus/dedup":
                        return self._send(
                            200,
                            corpus.dedup_summary(
                                normalized=_bool(qs, "normalized"),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/dedup/pairs":
                        return self._send(
                            200,
                            corpus.near_dup_pairs(
                                method=_first(qs, "method") or "minhash",
                                limit=_int(qs, "limit", 100),
                                offset=_int(qs, "offset", 0),
                                threshold=_float(qs, "threshold", 0.92),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/dup_profile":
                        return self._send(
                            200,
                            corpus.dup_profile(
                                normalized=_bool(qs, "normalized"),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/similar":
                        vec = _first(qs, "vec_id")
                        try:
                            vec_id = int(vec) if vec is not None else None
                        except ValueError:
                            raise ValidationError(f"invalid vec_id: {vec!r}")
                        return self._send(
                            200,
                            corpus.similar_docs(
                                vec_id=vec_id,
                                k=_int(qs, "k", 10),
                                mode=_first(qs, "mode") or "auto",
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/weights":
                        return self._send(
                            200,
                            corpus.importance_weights(
                                target_lang=_first(qs, "target_lang"),
                                limit=_int(qs, "limit", 20),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/perplexity":
                        return self._send(
                            200,
                            corpus.perplexity_outliers(
                                reference_lang=_first(qs, "reference_lang"),
                                limit=_int(qs, "limit", 20),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/recall":
                        return self._send(
                            200,
                            corpus.recall_report(
                                threshold=_float(qs, "threshold", 0.5),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/fertility":
                        return self._send(200, corpus.fertility_report(request_id=rid))
                    if url.path == "/corpus/lang_mismatch":
                        return self._send(
                            200,
                            corpus.lang_mismatch_report(
                                limit=_int(qs, "limit", 100), request_id=rid
                            ),
                        )
                    if url.path == "/corpus/languages":
                        return self._send(
                            200, corpus.language_breakdown(request_id=rid)
                        )
                    if url.path == "/corpus/sources":
                        return self._send(
                            200,
                            corpus.source_report(
                                min_kept_fraction=_float(
                                    qs, "min_kept_fraction", 0.5
                                ),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/pii":
                        return self._send(200, corpus.pii_report(request_id=rid))
                    if url.path == "/corpus/boilerplate":
                        return self._send(
                            200,
                            corpus.boilerplate_report(
                                threshold=_float(qs, "threshold", 0.5),
                                segment_tokens=_int(qs, "segment_tokens", 3),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/search":
                        return self._send(
                            200,
                            corpus.search(
                                q=_first(qs, "q"),
                                mode=_first(qs, "mode") or "bm25",
                                limit=_int(qs, "limit", 20),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/drift":
                        return self._send(
                            200,
                            corpus.drift_report(
                                kl_threshold=_float(qs, "kl_threshold", 0.5),
                                base=_first(qs, "base"),
                                current=_first(qs, "current"),
                                psi_threshold=_float(qs, "psi_threshold", 0.25),
                                n_bins=_int(qs, "n_bins", 256),
                                request_id=rid,
                            ),
                        )
                    if url.path == "/corpus/quality":
                        return self._send(200, corpus.quality_report(request_id=rid))
                    if url.path == "/corpus/index_health":
                        return self._send(200, corpus.index_health(request_id=rid))
                if corpus is not None and (method, url.path) == (
                    "POST",
                    "/corpus/similar",
                ):
                    # external-query ANN: the embedding arrives in the
                    # JSON body ({"query_vec": [...], "k":, "mode":});
                    # k/mode fall back to query params so curl one-liners
                    # can keep tuning in the URL
                    body = self._json_body()
                    # the k fallback is PER FORM: the batched method
                    # documents default k=5, the single form k=10 — a
                    # shared fallback would silently hand batch callers
                    # 10 hits per query
                    k_default = 5 if "query_vecs" in body else 10
                    k = body.get("k", _int(qs, "k", k_default))
                    if not isinstance(k, int) or isinstance(k, bool):
                        raise ValidationError(f"invalid k: {k!r}")
                    if "query_vecs" in body:
                        # batched form — exactly one of the two keys
                        if "query_vec" in body:
                            raise ValidationError(
                                "give query_vec OR query_vecs, not both"
                            )
                        return self._send(
                            200,
                            corpus.similar_by_vectors(
                                query_vecs=body.get("query_vecs"),
                                k=k,
                                mode=body.get(
                                    "mode", _first(qs, "mode") or "pq"
                                ),
                                request_id=rid,
                            ),
                        )
                    mode = body.get("mode", _first(qs, "mode") or "auto")
                    return self._send(
                        200,
                        corpus.similar_by_vector(
                            query_vec=body.get("query_vec"),
                            k=k,
                            mode=mode,
                            request_id=rid,
                        ),
                    )
                if corpus is not None and (method, url.path) == (
                    "POST",
                    "/corpus/index_retrain",
                ):
                    # n_centroids only passed when supplied — omitting it
                    # selects the service's provisioning-rule default.
                    # Parse STRICTLY: _int's silent default-on-garbage would
                    # map "?n_centroids=abc" to a destructive value instead
                    # of a 400 (the operator also validates >= 1 at depth)
                    kw = {}
                    raw_k = _first(qs, "n_centroids")
                    if raw_k:
                        try:
                            kw["n_centroids"] = int(raw_k)
                        except ValueError:
                            raise ValidationError(
                                f"invalid n_centroids: {raw_k!r}"
                            )
                        if kw["n_centroids"] < 1:
                            raise ValidationError(
                                f"n_centroids must be >= 1, got {raw_k}"
                            )
                    raw_mode = _first(qs, "assign_mode")
                    if raw_mode:
                        # validated in the service method (400 on garbage)
                        kw["assign_mode"] = raw_mode
                    return self._send(
                        200, corpus.index_retrain(request_id=rid, **kw)
                    )
                if corpus is not None and (method, url.path) == (
                    "POST",
                    "/corpus/index_compact",
                ):
                    return self._send(200, corpus.index_compact(request_id=rid))
                if corpus is not None and (method, url.path) == (
                    "POST",
                    "/corpus/assemble",
                ):
                    # langs only passed when supplied — the service's
                    # default tuple stays the single source of truth
                    kw = {}
                    langs = _first(qs, "langs")
                    if langs:
                        kw["langs"] = tuple(
                            x.strip() for x in langs.split(",") if x.strip()
                        )
                    return self._send(
                        200,
                        corpus.assemble(
                            train_pct=_int(qs, "train_pct", 80),
                            salt=_first(qs, "salt") or "v1",
                            request_id=rid,
                            **kw,
                        ),
                    )
                return self._send(404, {"error": f"no route: {method} {url.path}"})
            except ValidationError as exc:
                return self._send(400, {"error": str(exc)})
            except (EmptyExportError, LookupError) as exc:
                return self._send(404, {"error": str(exc)})
            except Exception as exc:  # 500 with the error string, like gin
                return self._send(500, {"error": str(exc)})

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

    return Handler


def serve(svc: MetricsService, port: int = 8080, corpus=None) -> ThreadingHTTPServer:
    """Start the HTTP tier on ``port``; returns the (running) server so
    callers/tests own its lifecycle (``shutdown()`` to stop)."""
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(svc, corpus))
    import threading

    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main() -> None:  # pragma: no cover - thin CLI shell over serve()
    import argparse

    from admira_etl_project_prueba_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    svc = MetricsService(get_spark())
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(svc))
    print(f"listening on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
