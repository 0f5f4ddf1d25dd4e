"""OAuth2 code flow + token refresh over a live socket, mirroring the
reference's test_oauth.py cases (login redirect, callback token issue)
plus the state-expiry and refresh-grant semantics of
app/api/v1/endpoints/oauth.py:24-146 and app/core/onadata.py:163-202."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from duva_spark.api import ControlPlane, serve
from duva_spark.oauth import (
    ExpiringStateStore,
    FailedExternalRequest,
    InvalidGrant,
    OAuthFlow,
    ServerConfig,
    create_access_token,
    verify_access_token,
)
from duva_spark.orchestration import MetadataStore, SyncJob
from duva_spark.security import fernet_decrypt, fernet_encrypt

SECRET = "unit-test-secret"
SERVER_URL = "https://ona.example.org"


class FakeUpstream:
    """The OnaData server: token endpoint + user profile endpoint."""

    def __init__(self):
        self.exchanged: list[dict] = []
        self.refresh_calls: list[dict] = []
        self.fail_refresh_with: str | None = None

    def post(self, url, data, auth):
        assert auth == ("cid", "plain-secret")  # decrypted client secret used
        if data["grant_type"] == "authorization_code":
            self.exchanged.append(data)
            if data["code"] == "badcode":
                return 400, "invalid code"
            return 200, json.dumps({"access_token": "AT1", "refresh_token": "RT1"})
        self.refresh_calls.append(data)
        if self.fail_refresh_with:
            return 401, self.fail_refresh_with
        return 200, json.dumps({"access_token": "AT2", "refresh_token": "RT2"})

    def get(self, url, headers):
        if headers.get("Authorization") != "Bearer AT1":
            return 401, "unauthorized"
        return 200, json.dumps({"username": "alice"})


@pytest.fixture()
def upstream():
    return FakeUpstream()


def _flow(upstream, clock=None):
    states = ExpiringStateStore(clock=clock) if clock else ExpiringStateStore()
    return OAuthFlow(
        secret_key=SECRET,
        servers=[
            ServerConfig(
                id=1,
                url=SERVER_URL,
                client_id="cid",
                client_secret_enc=fernet_encrypt("plain-secret", SECRET),
            )
        ],
        http_post=upstream.post,
        http_get=upstream.get,
        states=states,
    )


@pytest.fixture()
def oauth_api(spark, tmp_path, upstream):
    store = MetadataStore(tmp_path / "catalog.json")
    job = SyncJob(spark, store, tmp_path, fetch=lambda _id: tmp_path / "none.csv")
    flow = _flow(upstream)
    cp = ControlPlane(store, job, str(tmp_path / "out"), oauth=flow)
    server, _ = serve(cp)
    yield f"http://127.0.0.1:{server.server_address[1]}", flow
    server.shutdown()


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *a, **kw):
        return None


def _get(base, path):
    opener = urllib.request.build_opener(_NoRedirect)
    try:
        with opener.open(f"{base}{path}") as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None, dict(resp.headers)
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None, dict(e.headers)


def test_oauth_login_redirects(oauth_api):
    base, flow = oauth_api
    code, _, headers = _get(base, f"/oauth/login?server_url={SERVER_URL}")
    assert code == 302
    loc = headers["Location"]
    assert loc.startswith(f"{SERVER_URL}/o/authorize?client_id=cid&response_type=code&state=")
    assert headers["Cache-Control"] == "no-cache, no-store, revalidate"


def test_oauth_login_unknown_server_400(oauth_api):
    base, _ = oauth_api
    code, body, _ = _get(base, "/oauth/login?server_url=https://other.example.net")
    assert code == 400
    assert body["detail"] == "Server not configured"


def test_oauth_callback_issues_bearer_and_stores_encrypted_tokens(oauth_api, upstream):
    base, flow = oauth_api
    _, _, headers = _get(base, f"/oauth/login?server_url={SERVER_URL}")
    state = headers["Location"].rsplit("state=", 1)[1]
    code, body, _ = _get(base, f"/oauth/callback?code=c0de&state={state}")
    assert code == 200
    assert body["token_type"] == "bearer"
    payload = verify_access_token(body["access_token"], SECRET)
    assert payload["sub"] == "alice:1"
    user = flow.users[("alice", 1)]
    # Tokens are Fernet-encrypted at rest, not plaintext.
    assert user.access_token_enc != "AT1"
    assert fernet_decrypt(user.access_token_enc, SECRET) == "AT1"
    assert fernet_decrypt(user.refresh_token_enc, SECRET) == "RT1"


def test_oauth_callback_redirects_when_login_asked_for_it(oauth_api):
    base, _ = oauth_api
    _, _, headers = _get(
        base, f"/oauth/login?server_url={SERVER_URL}&redirect_url=https://app.example.org/done"
    )
    state = headers["Location"].rsplit("state=", 1)[1]
    code, _, headers = _get(base, f"/oauth/callback?code=c0de&state={state}")
    assert code == 302
    assert headers["Location"] == "https://app.example.org/done"


def test_oauth_callback_state_is_single_use_and_unknown_is_401(oauth_api):
    base, _ = oauth_api
    _, _, headers = _get(base, f"/oauth/login?server_url={SERVER_URL}")
    state = headers["Location"].rsplit("state=", 1)[1]
    assert _get(base, f"/oauth/callback?code=c0de&state={state}")[0] == 200
    code, body, _ = _get(base, f"/oauth/callback?code=c0de&state={state}")  # replay
    assert code == 401
    assert body["detail"] == "Authorization state can not be confirmed."
    assert _get(base, "/oauth/callback?code=x&state=nonsense")[0] == 401


def test_oauth_callback_bad_code_is_400(oauth_api):
    base, _ = oauth_api
    _, _, headers = _get(base, f"/oauth/login?server_url={SERVER_URL}")
    state = headers["Location"].rsplit("state=", 1)[1]
    code, body, _ = _get(base, f"/oauth/callback?code=badcode&state={state}")
    assert code == 400


def test_oauth_state_expires_after_ttl(upstream):
    now = [1000.0]
    flow = _flow(upstream, clock=lambda: now[0])
    _, _, headers = flow.login(SERVER_URL)
    state = headers["Location"].rsplit("state=", 1)[1]
    now[0] += 301  # past the 5-minute TTL
    code, body, _ = flow.callback("c0de", state)
    assert code == 401
    assert body["detail"] == "Authorization state can not be confirmed."


def test_refresh_rotates_both_tokens_reencrypted(upstream):
    flow = _flow(upstream)
    _, _, headers = flow.login(SERVER_URL)
    state = headers["Location"].rsplit("state=", 1)[1]
    flow.callback("c0de", state)
    user = flow.refresh_access_token("alice", 1)
    assert upstream.refresh_calls[0]["grant_type"] == "refresh_token"
    assert upstream.refresh_calls[0]["refresh_token"] == "RT1"  # decrypted for the wire
    assert fernet_decrypt(user.access_token_enc, SECRET) == "AT2"
    assert fernet_decrypt(user.refresh_token_enc, SECRET) == "RT2"


def test_refresh_invalid_grant_raises_401_type(upstream):
    flow = _flow(upstream)
    _, _, headers = flow.login(SERVER_URL)
    state = headers["Location"].rsplit("state=", 1)[1]
    flow.callback("c0de", state)
    upstream.fail_refresh_with = "invalid_grant"
    with pytest.raises(InvalidGrant):
        flow.refresh_access_token("alice", 1)
    upstream.fail_refresh_with = "upstream exploded"
    with pytest.raises(FailedExternalRequest):
        flow.refresh_access_token("alice", 1)
    with pytest.raises(ValueError, match="User is required"):
        flow.refresh_access_token("nobody", 1)


def test_access_token_signature_and_expiry():
    tok = create_access_token("alice:1", SECRET, expires_in=3600)
    assert verify_access_token(tok, SECRET)["sub"] == "alice:1"
    assert verify_access_token(tok, "wrong-secret") is None
    assert verify_access_token(tok + "x", SECRET) is None
    expired = create_access_token("alice:1", SECRET, expires_in=-1)
    assert verify_access_token(expired, SECRET) is None


def test_oauth_callback_sets_signed_session_cookie(spark, tmp_path, upstream):
    """SessionMiddleware parity (reference app/main.py:42-47 +
    security.py:84): the callback that mints the bearer token also sets
    a signed session cookie carrying it, HttpOnly + SameSite=lax."""
    store = MetadataStore(tmp_path / "catalog.json")
    job = SyncJob(spark, store, tmp_path, fetch=lambda _id: tmp_path / "none.csv")
    flow = _flow(upstream)
    cp = ControlPlane(
        store, job, str(tmp_path / "out"), oauth=flow,
        secret_key=SECRET, https_only=False,
    )
    server, _ = serve(cp)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        _, _, headers = _get(base, f"/oauth/login?server_url={SERVER_URL}")
        state = headers["Location"].rsplit("state=", 1)[1]
        code, body, headers = _get(base, f"/oauth/callback?code=c0de&state={state}")
        assert code == 200
        cookie_hdr = headers["Set-Cookie"]
        assert cookie_hdr.startswith("session=")
        assert "HttpOnly" in cookie_hdr and "SameSite=lax" in cookie_hdr
        assert "Secure" not in cookie_hdr  # https_only=False
        session = cp.sessions.from_cookie_header(cookie_hdr.split(";")[0])
        assert session["token"] == body["access_token"]
        # a session signed with another key is empty, like Starlette's
        from duva_spark.middleware import SessionCodec
        assert SessionCodec("other").from_cookie_header(cookie_hdr.split(";")[0]) == {}
    finally:
        server.shutdown()
