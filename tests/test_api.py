"""Control-plane HTTP API: the reference's route semantics over a live
socket (EP1/EP3 — create/list/get/sync/delete, encrypted-form 400,
already-syncing 202)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from duva_spark.api import ControlPlane, serve
from duva_spark.orchestration import FileStatus, MetadataStore, SyncJob

CSV = "name,age\nalice,34\nbob,41\n"


def _req(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(f"{base}{path}", data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


@pytest.fixture()
def api(spark, tmp_path):
    csv = tmp_path / "export.csv"
    csv.write_text(CSV)
    store = MetadataStore(tmp_path / "catalog.json")
    job = SyncJob(spark, store, tmp_path, fetch=lambda _id: csv)
    cp = ControlPlane(store, job, str(tmp_path / "out"))
    server, thread = serve(cp)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, store
    server.shutdown()


def test_create_and_immediate_sync(api, spark, tmp_path):
    base, store = api
    code, body = _req(base, "POST", "/api/v1/files/", {"form_id": 7, "sync_immediately": True})
    assert code == 201
    assert body["file_status"] == FileStatus.FILE_AVAILABLE.value
    assert spark.read.parquet(str(tmp_path / "out" / "7")).count() == 2


def test_encrypted_form_rejected_400(api):
    base, _ = api
    code, body = _req(
        base, "POST", "/api/v1/files/", {"form_id": 9, "form": {"public_key": "PEM"}}
    )
    assert code == 400
    assert body["detail"] == "Encrypted forms are not supported"


def test_list_get_delete_lifecycle(api):
    base, _ = api
    _req(base, "POST", "/api/v1/files/", {"form_id": 1})
    _req(base, "POST", "/api/v1/files/", {"form_id": 2})
    code, files = _req(base, "GET", "/api/v1/files/")
    assert code == 200 and [f["id"] for f in files] == ["1", "2"]
    code, one = _req(base, "GET", "/api/v1/files/1")
    assert code == 200 and one["file_status"] == FileStatus.QUEUED.value
    code, _ = _req(base, "DELETE", "/api/v1/files/1")
    assert code == 204
    code, _ = _req(base, "GET", "/api/v1/files/1")
    assert code == 404


def test_forced_sync_and_already_syncing_202(api):
    base, store = api
    _req(base, "POST", "/api/v1/files/", {"form_id": 5})
    code, body = _req(base, "POST", "/api/v1/files/5/sync")
    # the fresh dataset is QUEUED → contract says 202 until first sync
    assert code == 202
    # mark it available, then a forced sync runs and succeeds
    store.record_success("5")
    code, body = _req(base, "POST", "/api/v1/files/5/sync")
    assert code == 200 and body["file_status"] == FileStatus.FILE_AVAILABLE.value


def test_sync_unknown_dataset_404(api):
    base, _ = api
    code, _ = _req(base, "POST", "/api/v1/files/nope/sync")
    assert code == 404
