"""HTTP middleware parity for the stdlib control plane.

The reference mounts three middlewares on its FastAPI app
(app/main.py:41-58): Starlette ``SessionMiddleware`` (signed session
cookie carrying the OAuth token, ``https_only``/``same_site`` from
settings, app/core/config.py:78-79), ``CORSMiddleware`` (origin
allow-list + credentials flag + preflight caching,
app/core/config.py:84-88), and Prometheus (already served by
duva_spark.metrics).  It also applies a ``dictConfig`` logging setup at
startup (app/core/logger.py, app/main.py:36-38).

This module reproduces those three behaviors framework-free so
duva_spark.api's ThreadingHTTPServer can mount them:

- :class:`CORSPolicy` — the browser-facing contract: preflight
  (``OPTIONS`` + ``Origin`` + ``Access-Control-Request-Method``)
  answers 200 with the allow-headers when the origin passes the
  allow-list and 400 ``Disallowed CORS origin`` when it does not;
  simple requests get ``Access-Control-Allow-Origin`` echoed (plus
  ``Vary: Origin`` — required whenever the allow-origin value depends
  on the request, which it always does with a non-wildcard list) and
  ``Access-Control-Allow-Credentials`` when the credentials flag is on.
  Defaults mirror app/core/config.py:84-88 (credentials on, all
  methods/headers, max_age 3600).
- :class:`SessionCodec` — the signed-cookie format: base64url(JSON
  payload) ``.`` issue-timestamp ``.`` HMAC-SHA256 over both with the
  server secret.  Tampered payloads, bad signatures, and cookies older
  than ``max_age`` (two weeks — "User sessions last for 2 weeks",
  reference oauth.py:87) decode to ``{}`` exactly like Starlette
  treats an invalid ``itsdangerous`` signature.  ``https_only`` maps
  to the ``Secure`` attribute and ``same_site`` is emitted verbatim
  (SECURE_SESSIONS / SESSION_SAME_SITE, app/core/config.py:78-79).
- :func:`configure_logging` — ``dictConfig`` with the reference's
  formatter/handler/logger shape (console + optional file handler,
  ``%(asctime)s - %(name)s - %(levelname)s - %(message)s``).
- :class:`ErrorReporter` — Sentry-equivalent error reporting, gated
  exactly like the reference gates ``SentryAsgiMiddleware`` on
  ``SENTRY_DSN`` (app/main.py:59-61): ``dsn=None`` → disabled no-op.
  No vendor SDK — events are dicts handed to a pluggable transport
  (default: an in-memory buffer), and :meth:`ErrorReporter.
  logging_handler` returns a stdlib ``logging.Handler`` that captures
  any ERROR-with-exc_info record, the log-handler integration Sentry's
  SDK installs.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import hmac
import json
import logging
import time
from dataclasses import dataclass, field
from logging.config import dictConfig

SESSION_COOKIE = "session"

# ---------------------------------------------------------------------------
# CORS (reference app/main.py:48-55, config defaults app/core/config.py:84-88)
# ---------------------------------------------------------------------------


@dataclass
class CORSPolicy:
    """Origin allow-list CORS, the subset of Starlette's CORSMiddleware
    the reference actually configures."""

    allowed_origins: list[str] = field(default_factory=list)
    allow_credentials: bool = True
    allow_methods: list[str] = field(default_factory=lambda: ["*"])
    allow_headers: list[str] = field(default_factory=lambda: ["*"])
    max_age: int = 3600

    def origin_allowed(self, origin: str | None) -> bool:
        if not origin:
            return False
        return "*" in self.allowed_origins or origin in self.allowed_origins

    def is_preflight(self, method: str, headers) -> bool:
        return (
            method == "OPTIONS"
            and headers.get("Origin") is not None
            and headers.get("Access-Control-Request-Method") is not None
        )

    def preflight(self, headers) -> tuple[int, dict[str, str], str]:
        """Answer an OPTIONS preflight: (status, headers, text body)."""
        origin = headers.get("Origin")
        req_method = headers.get("Access-Control-Request-Method", "")
        req_headers = headers.get("Access-Control-Request-Headers", "")
        failures = []
        if not self.origin_allowed(origin):
            failures.append("origin")
        if "*" not in self.allow_methods and req_method not in self.allow_methods:
            failures.append("method")
        if req_headers and "*" not in self.allow_headers:
            allowed = {h.lower() for h in self.allow_headers}
            if any(
                h.strip().lower() not in allowed
                for h in req_headers.split(",")
                if h.strip()
            ):
                failures.append("headers")
        if failures:
            # Starlette's wording: "Disallowed CORS origin, method"
            return 400, {"Vary": "Origin"}, "Disallowed CORS " + ", ".join(failures)
        out = {
            "Access-Control-Allow-Origin": origin,
            "Access-Control-Allow-Methods": (
                "DELETE, GET, HEAD, OPTIONS, PATCH, POST, PUT"
                if "*" in self.allow_methods
                else ", ".join(self.allow_methods)
            ),
            "Access-Control-Max-Age": str(self.max_age),
            "Vary": "Origin",
        }
        if req_headers:
            # "*" allow-list echoes whatever the browser asked for
            out["Access-Control-Allow-Headers"] = (
                req_headers if "*" in self.allow_headers else ", ".join(self.allow_headers)
            )
        if self.allow_credentials:
            out["Access-Control-Allow-Credentials"] = "true"
        return 200, out, "OK"

    def response_headers(self, origin: str | None) -> dict[str, str]:
        """CORS headers to merge into a simple (non-preflight) response.
        Disallowed origins get none — the request is still served (the
        browser enforces the block), matching CORSMiddleware."""
        if not self.origin_allowed(origin):
            return {}
        out = {"Access-Control-Allow-Origin": origin, "Vary": "Origin"}
        if self.allow_credentials:
            out["Access-Control-Allow-Credentials"] = "true"
        return out


# ---------------------------------------------------------------------------
# Signed session cookie (reference app/main.py:42-47, security.py:84,
# auth_deps.py:26-38)
# ---------------------------------------------------------------------------


@dataclass
class SessionCodec:
    secret_key: str
    https_only: bool = True
    same_site: str = "lax"
    max_age: int = 14 * 24 * 3600  # "User sessions last for 2 weeks"

    def _sign(self, payload: bytes, ts: str) -> str:
        mac = hmac.new(
            self.secret_key.encode(), payload + b"." + ts.encode(), hashlib.sha256
        )
        return base64.urlsafe_b64encode(mac.digest()).decode().rstrip("=")

    def encode(self, data: dict) -> str:
        payload = base64.urlsafe_b64encode(
            json.dumps(data, separators=(",", ":")).encode()
        )
        ts = str(int(time.time()))
        return f"{payload.decode()}.{ts}.{self._sign(payload, ts)}"

    def decode(self, value: str | None) -> dict:
        """Invalid, tampered, or expired cookies are an empty session,
        never an error (Starlette SessionMiddleware semantics)."""
        if not value:
            return {}
        parts = value.split(".")
        if len(parts) != 3:
            return {}
        payload, ts, sig = parts
        # compare as BYTES: compare_digest(str, str) raises TypeError on
        # non-ASCII input, so a hostile cookie with a non-ASCII signature
        # segment would crash instead of decoding to {} (ADVICE r4)
        if not hmac.compare_digest(
            self._sign(payload.encode(), ts).encode(), sig.encode()
        ):
            return {}
        try:
            if time.time() - int(ts) > self.max_age:
                return {}
            return json.loads(base64.urlsafe_b64decode(payload.encode()))
        except (ValueError, binascii.Error):
            return {}

    def set_cookie_header(self, data: dict) -> str:
        attrs = [
            f"{SESSION_COOKIE}={self.encode(data)}",
            "Path=/",
            f"Max-Age={self.max_age}",
            "HttpOnly",
            f"SameSite={self.same_site}",
        ]
        if self.https_only:
            attrs.append("Secure")
        return "; ".join(attrs)

    def from_cookie_header(self, cookie_header: str | None) -> dict:
        """Extract and decode the session from a raw ``Cookie`` header."""
        if not cookie_header:
            return {}
        for part in cookie_header.split(";"):
            name, _, val = part.strip().partition("=")
            if name == SESSION_COOKIE:
                return self.decode(val)
        return {}


# ---------------------------------------------------------------------------
# Logging (reference app/core/logger.py + app/main.py:36-38)
# ---------------------------------------------------------------------------

LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def log_config(filename: str | None = None) -> dict:
    """The reference's dictConfig shape: a ``default`` formatter feeding
    a console handler (plus a file handler when a path is given) wired
    to the root and server loggers at INFO."""
    handlers: dict = {
        "console": {
            "class": "logging.StreamHandler",
            "formatter": "default",
            "stream": "ext://sys.stdout",
        }
    }
    handler_names = ["console"]
    if filename:
        handlers["file"] = {
            "class": "logging.FileHandler",
            "formatter": "default",
            "filename": filename,
        }
        handler_names.append("file")
    return {
        "version": 1,
        "disable_existing_loggers": False,
        "formatters": {
            "default": {"format": LOG_FORMAT, "datefmt": "%Y-%m-%d %H:%M:%S"}
        },
        "handlers": handlers,
        "loggers": {
            "duva_spark": {
                "level": "INFO",
                "handlers": handler_names,
                "propagate": False,
            }
        },
    }


def configure_logging(filename: str | None = None) -> logging.Logger:
    dictConfig(log_config(filename))
    return logging.getLogger("duva_spark")


# ---------------------------------------------------------------------------
# Error reporting (reference app/main.py:59-61 — SentryAsgiMiddleware,
# mounted only when SENTRY_DSN is configured)
# ---------------------------------------------------------------------------


@dataclass
class ErrorReporter:
    """Sentry-equivalent error reporting with the reference's gating and
    no vendor SDK: ``dsn=None`` disables everything (the SENTRY_DSN
    check, app/main.py:59), a truthy dsn turns every captured exception
    into an event dict handed to ``transport`` — by default an
    in-memory ``events`` buffer that tests and operators drain; a real
    deployment plugs an HTTP sender in without touching call sites.

    Two integration points, mirroring what the Sentry SDK installs:
    explicit :meth:`capture_exception` (the ASGI-middleware catch-all —
    duva_spark.api wires this around route dispatch), and
    :meth:`logging_handler`, a stdlib ``logging.Handler`` that captures
    any ERROR-or-worse record carrying ``exc_info``.
    """

    dsn: str | None = None
    transport: "Callable[[dict], None] | None" = None
    events: list = field(default_factory=list)

    @property
    def enabled(self) -> bool:
        return bool(self.dsn)

    def capture_exception(self, exc: BaseException, **context) -> dict | None:
        if not self.enabled:
            return None
        # one event per exception OBJECT: the api catch-all both captures
        # and logs with exc_info, so an attached logging_handler would
        # otherwise re-capture the same exception (r5 review). Exceptions
        # aren't weakref-able, so the dedup marker rides the object
        # itself — no registry to leak, window = the object's lifetime,
        # exactly the double-report path.
        try:
            if getattr(exc, "_duva_error_reported", False):
                return None
            exc._duva_error_reported = True  # type: ignore[attr-defined]
        except (AttributeError, TypeError):
            pass  # attribute-less exception type — capture anyway
        import traceback

        event = {
            "dsn": self.dsn,
            "type": type(exc).__name__,
            "message": str(exc),
            "traceback": "".join(
                traceback.format_exception(type(exc), exc, exc.__traceback__)
            ),
            "context": context,
            "timestamp": time.time(),
        }
        (self.transport or self.events.append)(event)
        return event

    def logging_handler(self, level: int = logging.ERROR) -> logging.Handler:
        reporter = self

        class _ReportingHandler(logging.Handler):
            def emit(self, record: logging.LogRecord) -> None:
                exc = record.exc_info[1] if record.exc_info else None
                if exc is not None:
                    reporter.capture_exception(
                        exc, logger=record.name, log_message=record.getMessage()
                    )

        return _ReportingHandler(level=level)
