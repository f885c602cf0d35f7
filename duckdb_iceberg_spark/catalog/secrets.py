"""``CREATE SECRET (TYPE ICEBERG)`` analogue: a process-level named
secret registry the catalog attach path resolves against, mirroring the
reference's secret flow (reference:
src/catalog/rest/storage/authorization/oauth2.cpp:270-300 — secret
lookup by name, endpoint inference when ATTACH gives none, token and
client-credential extraction; error texts match its
InvalidConfigurationException messages so its fixture tests port
verbatim: inferred_endpoint_from_secret.test,
setup_errors/cant_infer_endpoint.test).

Keys are case-insensitive like DuckDB secret parameters. Recognized keys
for TYPE ICEBERG: ``endpoint``, ``token``, ``client_id``,
``client_secret``, ``oauth2_server_uri``, ``oauth2_scope``,
``oauth2_grant_type``, ``extra_http_headers`` (dict).
"""

from __future__ import annotations

from typing import Any, Optional

_SECRETS: dict[str, dict[str, Any]] = {}


def create_secret(name: str, *, type: str = "iceberg", **kv: Any) -> None:
    """Register (or replace) a named secret. Only TYPE ICEBERG is
    meaningful to the catalog attach path; other types are stored
    verbatim for callers' own use."""
    _SECRETS[name.lower()] = {
        "type": type.lower(),
        **{k.lower(): v for k, v in kv.items()},
    }


def drop_secret(name: str) -> None:
    _SECRETS.pop(name.lower(), None)


def get_secret(name: str) -> Optional[dict[str, Any]]:
    return _SECRETS.get(name.lower())
