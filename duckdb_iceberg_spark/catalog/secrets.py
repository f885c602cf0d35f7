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


def get_secret(name: str, type: str | None = None) -> Optional[dict[str, Any]]:
    """Look up a named secret, optionally scoped to a type. The catalog
    attach path passes ``type='iceberg'`` (ADVICE r10): the reference
    scopes its lookup to TYPE ICEBERG, so a same-named secret of another
    type must NOT be silently consumed for endpoint/token inference —
    scoped lookup returns None and the caller raises its usual
    'no ICEBERG secret' error."""
    sec = _SECRETS.get(name.lower())
    if sec is not None and type is not None and sec.get("type") != type.lower():
        return None
    return sec
