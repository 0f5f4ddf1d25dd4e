"""Secret-handling parity (reference app/core/security.py:25-46 +
encrypted-form rejection)."""

import pytest

from duva_spark.security import (
    EncryptedFormError,
    fernet_decrypt,
    fernet_encrypt,
    reject_encrypted_form,
)


def test_fernet_roundtrip():
    token = fernet_encrypt("oauth-access-token", "service-secret")
    assert token != "oauth-access-token"
    assert fernet_decrypt(token, "service-secret") == "oauth-access-token"


def test_fernet_wrong_key_fails():
    from cryptography.fernet import InvalidToken

    token = fernet_encrypt("x", "key-a")
    with pytest.raises(InvalidToken):
        fernet_decrypt(token, "key-b")


def test_encrypted_form_rejected():
    with pytest.raises(EncryptedFormError, match="Encrypted forms are not supported"):
        reject_encrypted_form({"formid": 1, "public_key": "PEM..."})
    reject_encrypted_form({"formid": 1, "public_key": ""})  # empty → allowed
    reject_encrypted_form({"formid": 1})
