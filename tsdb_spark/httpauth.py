"""HTTP client auth for outbound requests — the subset of upstream's
common/config HTTPClientConfig (config.go) that scrape targets,
Alertmanager endpoints, and remote_write endpoints share:

    basic_auth:     {username[, username_file], password[, password_file]}
    authorization:  {type (default "Bearer"), credentials[, credentials_file]}
    tls_config:     {insecure_skip_verify, ca_file, cert_file, key_file}

basic_auth and authorization are mutually exclusive, like upstream's
Validate. Secret *_file values are re-read on every request (upstream
reloads secret files per request so rotated credentials apply without
a config reload).

Everything here is driver-side, human-scale plumbing: the headers ride
on the scrape GETs / notifier POSTs / remote-write POSTs, never through
a Spark job.
"""

from __future__ import annotations

import base64
import os
from dataclasses import dataclass

__all__ = ["HTTPClientConfig", "http_client_config_from"]


@dataclass(frozen=True)
class HTTPClientConfig:
    basic_username: str = ""
    basic_username_file: str = ""
    basic_password: str = ""
    basic_password_file: str = ""
    auth_type: str = ""
    auth_credentials: str = ""
    auth_credentials_file: str = ""
    tls_insecure_skip_verify: bool = False
    tls_ca_file: str = ""
    tls_cert_file: str = ""
    tls_key_file: str = ""

    @property
    def _has_basic(self) -> bool:
        return bool(
            self.basic_username or self.basic_username_file
            or self.basic_password or self.basic_password_file
        )

    @property
    def _has_auth(self) -> bool:
        return bool(
            self.auth_type or self.auth_credentials
            or self.auth_credentials_file
        )

    def __post_init__(self):
        if self._has_basic and self._has_auth:
            raise ValueError(
                "at most one of basic_auth & authorization must be "
                "configured"  # config.go Validate wording
            )

    @staticmethod
    def _read_secret(path: str) -> str:
        with open(path) as f:
            # upstream strips trailing newlines from secret files
            return f.read().strip()

    def headers(self) -> dict[str, str]:
        """The request headers for this client — secret files re-read
        at call time."""
        if self._has_basic:
            user = self.basic_username or (
                self._read_secret(self.basic_username_file)
                if self.basic_username_file else ""
            )
            pw = self.basic_password or (
                self._read_secret(self.basic_password_file)
                if self.basic_password_file else ""
            )
            token = base64.b64encode(f"{user}:{pw}".encode()).decode()
            return {"Authorization": f"Basic {token}"}
        if self._has_auth:
            cred = self.auth_credentials or (
                self._read_secret(self.auth_credentials_file)
                if self.auth_credentials_file else ""
            )
            typ = self.auth_type or "Bearer"
            return {"Authorization": f"{typ} {cred}".strip()}
        return {}

    def ssl_context(self):
        """An ssl.SSLContext for https targets, or None for defaults.
        Built per the tls_config block (common/config TLSConfig)."""
        if not (
            self.tls_insecure_skip_verify or self.tls_ca_file
            or self.tls_cert_file
        ):
            return None
        import ssl

        ctx = ssl.create_default_context(
            cafile=self.tls_ca_file or None
        )
        if self.tls_cert_file:
            ctx.load_cert_chain(
                self.tls_cert_file, self.tls_key_file or None
            )
        if self.tls_insecure_skip_verify:
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        return ctx


def _join(base_dir: str, path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(base_dir, path)


def http_client_config_from(
    block: dict | None, base_dir: str = "."
) -> HTTPClientConfig | None:
    """Parse the HTTPClientConfig fields embedded in a scrape_config /
    alertmanager / remote_write yaml block (upstream inlines them at
    that level). Returns None when the block configures nothing —
    callers skip the header plumbing entirely for the common case.
    Relative *_file paths resolve against the config file's directory
    (config.go JoinDir)."""
    if not block:
        return None
    ba = block.get("basic_auth") or {}
    az = block.get("authorization") or {}
    tls = block.get("tls_config") or {}
    if not (ba or az or tls):
        return None
    return HTTPClientConfig(
        basic_username=str(ba.get("username", "") or ""),
        basic_username_file=(
            _join(base_dir, ba["username_file"])
            if ba.get("username_file") else ""
        ),
        basic_password=str(ba.get("password", "") or ""),
        basic_password_file=(
            _join(base_dir, ba["password_file"])
            if ba.get("password_file") else ""
        ),
        auth_type=str(az.get("type", "") or ""),
        auth_credentials=str(az.get("credentials", "") or ""),
        auth_credentials_file=(
            _join(base_dir, az["credentials_file"])
            if az.get("credentials_file") else ""
        ),
        tls_insecure_skip_verify=bool(
            tls.get("insecure_skip_verify", False)
        ),
        tls_ca_file=(
            _join(base_dir, tls["ca_file"]) if tls.get("ca_file") else ""
        ),
        tls_cert_file=(
            _join(base_dir, tls["cert_file"])
            if tls.get("cert_file") else ""
        ),
        tls_key_file=(
            _join(base_dir, tls["key_file"]) if tls.get("key_file") else ""
        ),
    )
