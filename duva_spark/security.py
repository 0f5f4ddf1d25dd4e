"""Secret handling for the control plane.

Reference behavior reproduced (app/core/security.py:25-46): all stored
credentials (OAuth tokens, client secrets, Tableau PATs) are
Fernet-encrypted at rest with the service SECRET_KEY; plus the
encrypted-XLSForm rejection rule (forms with a public_key are refused,
app/api/v1/endpoints/file.py:259-260 / app/utils/onadata_utils.py:283-284).
"""

from __future__ import annotations

import base64
import hashlib


def _fernet(secret_key: str):
    try:
        from cryptography.fernet import Fernet  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover
        raise ImportError("cryptography not installed — secret encryption unavailable") from exc
    # derive a stable 32-byte urlsafe key from an arbitrary secret string
    digest = hashlib.sha256(secret_key.encode()).digest()
    return Fernet(base64.urlsafe_b64encode(digest))


def fernet_encrypt(value: str, secret_key: str) -> str:
    return _fernet(secret_key).encrypt(value.encode()).decode()


def fernet_decrypt(token: str, secret_key: str) -> str:
    return _fernet(secret_key).decrypt(token.encode()).decode()


class EncryptedFormError(ValueError):
    """'Encrypted forms are not supported' (file.py:259-260)."""


def reject_encrypted_form(form_meta: dict) -> None:
    """Raise when the form declares a public_key (submissions would be
    client-side encrypted and unparseable by the engine)."""
    if form_meta.get("public_key"):
        raise EncryptedFormError("Encrypted forms are not supported")
