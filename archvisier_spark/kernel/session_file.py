"""Reference-compatible encrypted session files (S10's storage layer).

The reference persists GUI sessions as ``.arch`` files: a plain-text
header line ``ARCHIWIZATOR_SESSION_V1`` followed by a Fernet token of
the JSON state, keyed either from machine identity
(``urlsafe_b64(sha256(COMPUTERNAME + user + salt))``,
app_session_manager.py:54-64) or from an optional password
(``sha256(password)[:16]`` doubled, :145-149).  The Spark engine's
resume story is the lineage checkpoint table (pipeline/lineage.py — the
Iceberg-MERGE analog); THIS module is the compatibility layer that lets
a reference user carry their saved sessions (counters, table rows,
work mode) across to the Spark pipeline: the kernel Fernet
implementation is byte-compatible with ``cryptography.fernet`` (pinned
against the fernet-spec verification vector), so files written by the
reference decrypt here unchanged, and files written here open in the
reference app.

Error contract mirrors the reference's load_session messages verbatim
(:174-201) so migration tooling can pattern-match on them.
"""

from __future__ import annotations

import base64
import getpass
import hashlib
import json
import os

from archvisier_spark.kernel.fernet import InvalidToken, decrypt, encrypt

HEADER = b"ARCHIWIZATOR_SESSION_V1"
# the reference's fixed application salt (app_session_manager.py:58)
APP_SALT = "ArchiwizatorIGG_v3.2_2025"

MSG_BAD_HEADER = "To nie jest prawidłowy plik sesji Archiwizatora."
MSG_NEEDS_PASSWORD = (
    "Ten plik sesji jest zabezpieczony hasłem. Proszę podać hasło."
)
MSG_BAD_PASSWORD = "Nieprawidłowe hasło lub uszkodzony plik sesji."


def default_machine_info() -> str:
    """The reference's machine identity string (COMPUTERNAME + user)."""
    return os.environ.get("COMPUTERNAME", "") + getpass.getuser()


def derive_machine_key(machine_info: str | None = None) -> bytes:
    info = default_machine_info() if machine_info is None else machine_info
    digest = hashlib.sha256((info + APP_SALT).encode()).digest()
    return base64.urlsafe_b64encode(digest)


def derive_password_key(password: str) -> bytes:
    """sha256(password)[:16] doubled — the reference's password key
    (app_session_manager.py:145-147)."""
    half = hashlib.sha256(password.encode()).digest()[:16]
    return base64.urlsafe_b64encode(half + half)


def save_session(
    path: str,
    session_data: dict,
    machine_info: str | None = None,
    password: str | None = None,
) -> str:
    """Write a reference-format ``.arch`` file; returns ``path``."""
    session_json = json.dumps(session_data, indent=2)
    key = (
        derive_password_key(password)
        if password
        else derive_machine_key(machine_info)
    )
    token = encrypt(key, session_json.encode())
    with open(path, "wb") as f:
        f.write(HEADER + b"\n")
        f.write(token)
    return path


def load_session(
    path: str,
    machine_info: str | None = None,
    password: str | None = None,
) -> tuple[bool, dict | str]:
    """Load a ``.arch`` file; ``(True, session_dict)`` or
    ``(False, reference-exact error message)``."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header != HEADER:
            return False, MSG_BAD_HEADER
        token = f.read()
    key = (
        derive_password_key(password)
        if password
        else derive_machine_key(machine_info)
    )
    try:
        session_json = decrypt(key, token).decode()
        return True, json.loads(session_json)
    except (InvalidToken, ValueError, UnicodeDecodeError):
        if not password:
            return False, MSG_NEEDS_PASSWORD
        return False, MSG_BAD_PASSWORD
