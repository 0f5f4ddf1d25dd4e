"""Control-plane HTTP API — the reference's dataset-management surface
(EP1/EP3, app/api/v1/endpoints/file.py) on the standard library.

Endpoints (JSON in/out, mirroring the reference's routes):

- ``POST   /api/v1/files/``        create a managed dataset (rejects
  encrypted forms, optionally triggers an immediate sync) — EP1,
  file.py:223-285;
- ``GET    /api/v1/files/``        list datasets — file.py:42-88;
- ``GET    /api/v1/files/{id}``    dataset metadata + status — file.py:91-114;
- ``POST   /api/v1/files/{id}/sync`` forced refresh; 202 when already
  queued/syncing — file.py:163-201;
- ``DELETE /api/v1/files/{id}``    remove the dataset — file.py:146-160.

The OAuth2 code flow (``GET /oauth/login`` → 302 authorize redirect,
``GET /oauth/callback`` → token; app/api/v1/endpoints/oauth.py) is
served by duva_spark.oauth.OAuthFlow when one is attached, and
``GET /metrics`` exposes the sync gauge/counters in Prometheus text
format (app/main.py:56-64) when the SyncJob carries a MetricsRegistry.

FastAPI isn't available in this environment, so the server is a
ThreadingHTTPServer with a plain routing table — the HTTP semantics
(status codes, the 202 already-syncing contract, encrypted-form 400,
the OAuth state/redirect contract) are what's being reproduced, not the
framework.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from duva_spark.oauth import OAuthFlow
from duva_spark.orchestration import FileStatus, LockHeld, MetadataStore, SyncJob
from duva_spark.security import EncryptedFormError, reject_encrypted_form


class ControlPlane:
    """Route logic, transport-free (easy to test and to graft onto any
    framework)."""

    def __init__(
        self,
        store: MetadataStore,
        sync_job: SyncJob,
        out_root: str,
        oauth: OAuthFlow | None = None,
    ):
        self.store = store
        self.sync_job = sync_job
        self.out_root = out_root
        self.oauth = oauth
        self._forms: dict[str, dict] = {}

    # ---- handlers: (status_code, body) --------------------------------
    def create_file(self, body: dict) -> tuple[int, dict]:
        form = body.get("form", {})
        try:
            reject_encrypted_form(form)
        except EncryptedFormError as exc:
            return 400, {"detail": str(exc)}
        dataset_id = str(body.get("form_id") or form.get("formid") or "")
        if not dataset_id:
            return 422, {"detail": "form_id is required"}
        state = self.store.get(dataset_id)
        self._forms[dataset_id] = form
        if body.get("sync_immediately"):
            try:
                self.sync_job.run(dataset_id, f"{self.out_root}/{dataset_id}")
            except Exception:
                pass  # failure recorded in state; creation still succeeds
        return 201, self._view(dataset_id)

    def list_files(self) -> tuple[int, list]:
        return 200, [self._view(d) for d in self.store.ids()]

    def get_file(self, dataset_id: str) -> tuple[int, dict]:
        if not self.store.exists(dataset_id):
            return 404, {"detail": "File not found"}
        return 200, self._view(dataset_id)

    def sync_file(self, dataset_id: str) -> tuple[int, dict]:
        if not self.store.exists(dataset_id):
            return 404, {"detail": "File not found"}
        state = self.store.get(dataset_id)
        if state.file_status in (FileStatus.QUEUED.value, FileStatus.SYNCING.value):
            return 202, {"detail": "Sync already in progress"}
        try:
            self.sync_job.run(dataset_id, f"{self.out_root}/{dataset_id}")
        except LockHeld:
            return 202, {"detail": "Sync already in progress"}
        except Exception:
            pass  # recorded by the state machine
        return 200, self._view(dataset_id)

    def delete_file(self, dataset_id: str) -> tuple[int, dict | None]:
        if not self.store.delete(dataset_id):
            return 404, {"detail": "File not found"}
        self._forms.pop(dataset_id, None)
        return 204, None

    def oauth_login(self, params: dict) -> tuple[int, dict | None, dict]:
        if self.oauth is None:
            return 404, {"detail": "OAuth not configured"}, {}
        server_url = params.get("server_url", "")
        if not server_url:
            return 422, {"detail": "server_url is required"}, {}
        return self.oauth.login(server_url, params.get("redirect_url"))

    def oauth_callback(self, params: dict) -> tuple[int, dict | None, dict]:
        if self.oauth is None:
            return 404, {"detail": "OAuth not configured"}, {}
        code, state = params.get("code"), params.get("state")
        if not code or not state:
            return 422, {"detail": "code and state are required"}, {}
        return self.oauth.callback(code, state)

    def _view(self, dataset_id: str) -> dict:
        s = self.store.get(dataset_id)
        return {
            "id": s.dataset_id,
            "file_status": s.file_status,
            "is_active": s.is_active,
            "sync_failures": s.sync_failures,
            "last_updated": s.last_updated,
        }


_ROUTES = [
    ("POST", re.compile(r"^/api/v1/files/?$"), "create"),
    ("GET", re.compile(r"^/api/v1/files/?$"), "list"),
    ("GET", re.compile(r"^/oauth/login$"), "oauth_login"),
    ("GET", re.compile(r"^/oauth/callback$"), "oauth_callback"),
    ("GET", re.compile(r"^/metrics$"), "metrics"),
    ("GET", re.compile(r"^/api/v1/files/(?P<id>[^/]+)$"), "get"),
    ("POST", re.compile(r"^/api/v1/files/(?P<id>[^/]+)/sync$"), "sync"),
    ("DELETE", re.compile(r"^/api/v1/files/(?P<id>[^/]+)$"), "delete"),
]


def _make_handler(cp: ControlPlane):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _dispatch(self, method: str):
            for m, pat, action in _ROUTES:
                if m != method:
                    continue
                match = pat.match(self.path.split("?")[0])
                if not match:
                    continue
                body = {}
                if method == "POST":
                    n = int(self.headers.get("Content-Length") or 0)
                    if n:
                        body = json.loads(self.rfile.read(n) or b"{}")
                if action == "metrics":
                    reg = getattr(cp.sync_job, "metrics", None)
                    if reg is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    text = reg.exposition().encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
                    self.send_header("Content-Length", str(len(text)))
                    self.end_headers()
                    self.wfile.write(text)
                    return
                headers: dict = {}
                if action == "create":
                    code, payload = cp.create_file(body)
                elif action == "list":
                    code, payload = cp.list_files()
                elif action in ("oauth_login", "oauth_callback"):
                    qs = parse_qs(urlsplit(self.path).query)
                    params = {k: v[0] for k, v in qs.items()}
                    code, payload, headers = getattr(cp, action)(params)
                elif action == "get":
                    code, payload = cp.get_file(match["id"])
                elif action == "sync":
                    code, payload = cp.sync_file(match["id"])
                else:
                    code, payload = cp.delete_file(match["id"])
                data = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                for k, v in headers.items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self.send_response(404)
            self.end_headers()

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def serve(cp: ControlPlane, port: int = 0) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the API on a background thread; returns (server, thread).
    port=0 picks a free port (server.server_address[1])."""
    server = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(cp))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
