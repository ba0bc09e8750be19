"""Multi-tenant storage layout, auth, validation, listing.

Re-expresses the reference's per-tenant lifecycle (SURVEY §2.11):

* L1 auth gate: SHA-256 password compare vs a users registry
  (serve_flight.py:41-78).
* L2 "Smart Validation Gate": reject an upload whose filename does not
  contain the tenant's industry keyword (serve_flight.py:110-124).
* L3 path construction: ``storage/<client_id>/{Raw,Clean,Downloads}``
  (admin_setup_storage.py:29-47) — here Clean is a parquet warehouse
  dir per upload instead of a DuckDB file.
* S11 file listing, sorted ascending (serve_flight.py:264-269,337-366).

Unlike the reference there is no global transform lock (L4): Spark jobs
for different tenants run concurrently; isolation is per-tenant output
paths.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from dataclasses import dataclass

SUBDIRS = ("Raw", "Clean", "Downloads")


class AuthError(PermissionError):
    pass


class ValidationError(ValueError):
    pass


def hash_password(password: str) -> str:
    """SHA-256 digest of the trimmed password (serve_flight.py:41-44)."""
    return hashlib.sha256(str(password).strip().encode()).hexdigest()


@dataclass(frozen=True)
class Tenant:
    client_id: str
    industry: str
    password_sha256: str


class TenantRegistry:
    """users.json equivalent: client_id -> (industry, password hash),
    persisted to ``{root}/users.json`` so registrations survive process
    restarts (the reference ships a static users.json; here registration
    is dynamic but equally durable)."""

    def __init__(self, root: str):
        self.root = root
        self._tenants: dict[str, Tenant] = {}
        # registry WRITES are lock-serialized (two concurrent saves race
        # on the same tmp file); transforms/queries stay lock-free —
        # this is metadata, not the reference's global transform lock
        self._write_lock = threading.Lock()
        self._load()

    @property
    def _users_path(self) -> str:
        return os.path.join(self.root, "users.json")

    def _load(self) -> None:
        if not os.path.isfile(self._users_path):
            return
        with open(self._users_path, encoding="utf-8") as f:
            for cid, rec in json.load(f).items():
                self._tenants[cid] = Tenant(
                    cid, rec["industry"], rec["password_sha256"]
                )

    def _save(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        data = {
            cid: {"industry": t.industry, "password_sha256": t.password_sha256}
            for cid, t in sorted(self._tenants.items())
        }
        tmp = self._users_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, self._users_path)  # atomic on POSIX

    def register(self, client_id: str, industry: str, password: str) -> Tenant:
        t = Tenant(client_id, industry, hash_password(password))
        with self._write_lock:
            self._tenants[client_id] = t
            self._save()
        for sub in SUBDIRS:
            os.makedirs(self.storage_path(client_id, sub), exist_ok=True)
        return t

    def authenticate(self, client_id: str, password: str) -> Tenant:
        t = self._tenants.get(client_id)
        if t is None or t.password_sha256 != hash_password(password):
            raise AuthError(f"authentication failed for {client_id!r}")
        return t

    def storage_path(self, client_id: str, subdir: str = "") -> str:
        return os.path.join(self.root, "storage", client_id, subdir)

    def validate_filename(self, client_id: str, filename: str) -> None:
        """L2: the industry keyword must appear in the filename."""
        t = self._tenants[client_id]
        if t.industry.lower() not in os.path.basename(filename).lower():
            raise ValidationError(
                f"filename {filename!r} does not contain industry keyword "
                f"{t.industry!r}"
            )

    def clean_path(self, client_id: str, upload_basename: str) -> str:
        """Per-upload warehouse dir: {client_id}_{industry}_{base}
        (naming parity with serve_flight.py:131)."""
        t = self._tenants[client_id]
        base = os.path.splitext(os.path.basename(upload_basename))[0]
        return os.path.join(
            self.storage_path(client_id, "Clean"), f"{client_id}_{t.industry}_{base}"
        )

    def list_files(self, client_id: str, subdir: str = "Clean") -> list[str]:
        """S11: sorted listing of a tenant storage dir.

        ``subdir`` is caller-supplied (the Flight ``list_files`` action
        forwards it verbatim), so it must be confined to the tenant's
        own storage root: an absolute path makes ``os.path.join``
        discard the prefix entirely, and ``..`` segments climb into
        other tenants' directories — both are rejected against the
        resolved real path, not by string inspection."""
        tenant_root = os.path.realpath(self.storage_path(client_id))
        path = os.path.realpath(self.storage_path(client_id, subdir))
        if path != tenant_root and not path.startswith(tenant_root + os.sep):
            raise ValidationError(
                f"subdir {subdir!r} escapes the tenant storage root"
            )
        return sorted(os.listdir(path)) if os.path.isdir(path) else []
