"""Iceberg REST catalog client (driver-side, stdlib HTTP).

PySpark-native re-expression of the reference's catalog layer:
- ATTACH / endpoint + auth resolution: /root/reference/src/iceberg_attach.cpp
- REST calls (GetTable, ListTables, CreateTable, CommitTable, namespaces):
  /root/reference/src/catalog/rest/api/catalog_api.cpp:189-246 and peers
- OAuth2 client-credentials + refresh:
  /root/reference/src/catalog/rest/storage/authorization/oauth2.cpp
- optimistic commit retry with requirement re-validation:
  /root/reference/src/catalog/rest/transaction/iceberg_transaction.cpp:93-330

All catalog work happens on the Spark driver; executors only ever see file
paths. SigV4 request signing (Glue/S3Tables) is implemented in
``catalog/sigv4.py`` and enabled per-catalog via ``RestCatalogConfig``."""

from __future__ import annotations

import json
import time
import time as _time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Optional

from ..metadata.table_metadata import Snapshot, TableMetadata


class CatalogError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class CommitConflict(CatalogError):
    """409: requirements failed — caller may refresh and retry."""


@dataclass
class OAuth2Config:
    """Client-credentials flow (RFC 6749 §4.4), token refresh on expiry
    (reference: oauth2.cpp FetchOAuth2TokenResponse)."""

    server_uri: str
    client_id: str
    client_secret: str
    scope: str = "PRINCIPAL_ROLE:ALL"
    grant_type: str = "client_credentials"


@dataclass
class RestCatalogConfig:
    uri: str
    #: named secret to resolve attach parameters from (the reference's
    #: ATTACH ... (SECRET <name>) — see catalog.secrets.create_secret);
    #: an empty uri is inferred from the secret's 'endpoint'
    secret: str | None = None
    warehouse: str | None = None
    prefix: str | None = None  # filled from GET /v1/config when None
    token: str | None = None  # static bearer token
    oauth2: OAuth2Config | None = None
    sigv4: "SigV4Config | None" = None  # Glue/S3Tables-style signed requests
    default_headers: dict[str, str] = field(default_factory=dict)
    max_commit_retries: int = 4
    #: ATTACH option MAX_TABLE_STALENESS '<interval>' (reference:
    #: test_max_table_staleness.test): loadTable responses are served from
    #: cache within the window; None disables caching (every read re-GETs)
    max_table_staleness: str | float | None = None
    #: catalog-compatibility toggles (reference ATTACH options,
    #: attach_options/horizon_compatible_writes.test): some hosted
    #: catalogs lack /transactions/commit or reject stage-create
    disable_multi_table_commit: bool = False
    stage_create_tables: bool = False
    #: when False, expire_snapshots and transaction rollback never delete
    #: storage files (catalog-managed storage cleans up itself)
    remove_files_on_delete: bool = True
    #: per-request socket timeout in seconds (reference: the AWS suite's
    #: test_timeout_aws.test drives DuckDB's http timeout option). Without
    #: one, a hung catalog endpoint blocks the DRIVER indefinitely — at
    #: cluster scale that stalls every query planning against the catalog.
    #: None disables (not recommended).
    request_timeout_s: float | None = 60.0


_GLUE_WAREHOUSE_FORMS = (
    r"^:$",                   # default catalog, current account
    r"^\d{12}$",              # default catalog, specific account
    r"^\d{12}:[^:/]+$",       # specific catalog in a specific account
    r"^[^:]+/[^:]+$",         # nested catalog, current account
    r"^\d{12}:[^/]+/[^:]+$",  # nested catalog, specific account
)


def attach_aws_catalog_config(
    warehouse: str,
    *,
    access_key: str,
    secret_key: str,
    region: str | None = None,
    session_token: str | None = None,
    endpoint: str | None = None,
    **extra,
) -> RestCatalogConfig:
    """ATTACH sugar for AWS-hosted catalogs (reference:
    iceberg_attach.cpp:104-161 S3TablesAttach/GlueAttach +
    S3OrGlueAttachInternal): hand it either

    - an S3Tables ARN ``arn:aws:s3tables:<region>:<acct>:bucket/<name>`` —
      the region comes out of the ARN, or
    - a Glue warehouse (``:``, ``<acct-id>``, ``<acct>:<catalog>``,
      ``cat1/cat2``, ``<acct>:cat1/cat2``) plus ``region=``,

    and get a SigV4-signed :class:`RestCatalogConfig` pointing at
    ``https://<service>.<region>.amazonaws.com/iceberg``."""
    import re as _re

    from .sigv4 import SigV4Config

    if warehouse.startswith("arn:"):
        parts = warehouse.split(":", 5)
        if len(parts) < 6 or parts[2] != "s3tables":
            raise ValueError(
                f"unsupported ARN {warehouse!r}: expected "
                "arn:aws:s3tables:<region>:<account>:bucket/<name>")
        arn_region = parts[3]
        if not arn_region:
            raise ValueError(
                f"ARN {warehouse!r} has an empty REGION section")
        service, region = "s3tables", arn_region
    else:
        if not any(_re.match(p, warehouse) for p in _GLUE_WAREHOUSE_FORMS):
            raise ValueError(
                f"invalid Glue warehouse {warehouse!r}: expected ':', a "
                "12-digit account id, 'catalog1/catalog2', or "
                "'<account>:catalog1/catalog2'")
        if not region:
            raise ValueError("Glue attach requires region=")
        service = "glue"
    uri = endpoint or f"https://{service}.{region}.amazonaws.com/iceberg"
    return RestCatalogConfig(
        uri=uri.rstrip("/"),
        warehouse=warehouse,
        sigv4=SigV4Config(access_key=access_key, secret_key=secret_key,
                          region=region, service=service,
                          session_token=session_token),
        **extra,
    )


def _retry_config(properties: dict | None,
                  default_retries: int) -> tuple[int, float, float, float]:
    """``commit.retry.*`` table properties → (num_retries, min_wait_ms,
    max_wait_ms, total_timeout_ms) with the reference's defaults and
    guards (iceberg_retry.cpp FromTableMetadata: num-retries may be 0 —
    single attempt; invalid/negative values fall back; min clamped to
    max)."""
    p = properties or {}

    def _int(key, fallback, allow_zero):
        v = p.get(key, "")
        try:
            n = int(str(v))
        except (TypeError, ValueError):
            return fallback
        if n < 0 or (n == 0 and not allow_zero):
            return fallback
        return n

    num = _int("commit.retry.num-retries", default_retries, True)
    min_w = float(_int("commit.retry.min-wait-ms", 100, False))
    max_w = float(_int("commit.retry.max-wait-ms", 60_000, False))
    total = float(_int("commit.retry.total-timeout-ms", 30 * 60 * 1000, False))
    if min_w > max_w:
        min_w = max_w
    return num, min_w, max_w, total


_STALENESS_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0, "minute": 60.0,
    "hour": 3600.0, "day": 86400.0, "week": 7 * 86400.0,
    "month": 30 * 86400.0, "year": 365.25 * 86400.0,
}
#: int64 microseconds — the reference stores the interval as micros and
#: rejects values that overflow ('1000000 years')
_STALENESS_MAX_S = (2 ** 63 - 1) / 1e6


def _parse_staleness(v) -> float | None:
    """MAX_TABLE_STALENESS interval → seconds ('10 seconds', '5 minutes',
    '4 hours'; a bare number is seconds). Unparseable strings and
    overflowing intervals raise, matching the attach-time errors in
    test_max_table_staleness.test."""
    if v is None:
        return None
    if isinstance(v, (int, float)):
        secs = float(v)
    else:
        import re as _re

        m = _re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*", str(v))
        if m:
            unit = m.group(2).lower().rstrip("s")
            if unit not in _STALENESS_UNITS:
                raise ValueError(f"invalid MAX_TABLE_STALENESS interval {v!r}")
            secs = float(m.group(1)) * _STALENESS_UNITS[unit]
        else:
            m = _re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*", str(v))
            if not m:
                raise ValueError(f"invalid MAX_TABLE_STALENESS interval {v!r}")
            secs = float(m.group(1))
    if secs < 0 or secs > _STALENESS_MAX_S:
        raise ValueError(f"MAX_TABLE_STALENESS interval out of range: {v!r}")
    return secs


def _resolve_secret(config: RestCatalogConfig) -> RestCatalogConfig:
    """Resolve ATTACH parameters from a named ICEBERG secret (reference:
    oauth2.cpp:270-300): an empty uri is inferred from the secret's
    'endpoint' (error text matches cant_infer_endpoint.test when neither
    side has one); token / client credentials / extra headers fill in
    only where the config didn't set them explicitly. A config with no
    secret AND a uri passes through untouched."""
    from dataclasses import replace

    from .secrets import get_secret

    sec = None
    if config.secret is not None:
        # scoped to TYPE ICEBERG like the reference: a same-named secret
        # of another type resolves to None → the error below (ADVICE r10)
        sec = get_secret(config.secret, type="iceberg")
        if sec is None:
            raise ValueError(
                f"No ICEBERG secret by the name of '{config.secret}' "
                "could be found")
    if not config.uri:
        ep = (sec or {}).get("endpoint")
        if not ep:
            raise ValueError(
                "No 'endpoint' was given to attach, and no 'endpoint' "
                "could be retrieved from the ICEBERG secret!")
        config = replace(config, uri=str(ep).rstrip("/"))
    if sec is None:
        return config
    if config.token is None and config.oauth2 is None:
        if sec.get("token") is not None:
            config = replace(config, token=str(sec["token"]))
        elif sec.get("client_id") and sec.get("client_secret"):
            # no explicit oauth2 server: the spec's (deprecated) default
            # token endpoint under the catalog uri — same fallback the
            # reference applies
            server = sec.get("oauth2_server_uri") \
                or config.uri.rstrip("/") + "/v1/oauth/tokens"
            kwargs = {}
            if sec.get("oauth2_scope"):
                kwargs["scope"] = str(sec["oauth2_scope"])
            if sec.get("oauth2_grant_type"):
                kwargs["grant_type"] = str(sec["oauth2_grant_type"])
            config = replace(config, oauth2=OAuth2Config(
                server_uri=str(server),
                client_id=str(sec["client_id"]),
                client_secret=str(sec["client_secret"]), **kwargs))
    headers = sec.get("extra_http_headers")
    if headers:
        merged = {**dict(headers), **config.default_headers}
        config = replace(config, default_headers=merged)
    return config


class RestCatalog:
    """Minimal-complete Iceberg REST catalog client."""

    def __init__(self, config: RestCatalogConfig, *, opener=None):
        config = _resolve_secret(config)
        self.config = config
        if opener is None:
            to = config.request_timeout_s

            def opener(req, _to=to):  # noqa: F811 - default opener
                return urllib.request.urlopen(req, timeout=_to)
        self._opener = opener
        self._token: str | None = config.token
        self._token_expiry: float = float("inf") if config.token else 0.0
        self._prefix = config.prefix
        self._staleness_s = _parse_staleness(config.max_table_staleness)
        self._table_cache: dict[tuple, tuple[float, dict]] = {}
        if self._prefix is None:
            self._load_config()

    def _cache_key(self, namespace, name) -> tuple:
        return (self._ns(namespace), name)

    def invalidate_table_cache(self, namespace=None, name=None) -> None:
        """Drop cached loadTable responses — the whole cache, or one
        table's entry. Writes call this so a read after a local commit
        never serves pre-write metadata (reference:
        test_stale_cache_after_write.test)."""
        if namespace is None:
            self._table_cache.clear()
        else:
            self._table_cache.pop(self._cache_key(namespace, name), None)

    # -- auth ---------------------------------------------------------------

    def _ensure_token(self) -> str | None:
        o = self.config.oauth2
        if o is None:
            return self._token
        if self._token is not None and time.time() < self._token_expiry - 30:
            return self._token
        body = urllib.parse.urlencode({
            "grant_type": o.grant_type,
            "client_id": o.client_id,
            "client_secret": o.client_secret,
            "scope": o.scope,
        }).encode()
        req = urllib.request.Request(
            o.server_uri, data=body, method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with self._opener(req) as resp:
            payload = json.loads(resp.read().decode())
        self._token = payload["access_token"]
        self._token_expiry = time.time() + float(payload.get("expires_in", 3600))
        return self._token

    # -- plumbing -----------------------------------------------------------

    def _url(self, path: str) -> str:
        base = self.config.uri.rstrip("/")
        pfx = f"/{self._prefix}" if self._prefix else ""
        return f"{base}/v1{pfx}{path}"

    def _request(self, method: str, path: str, body: Any = None,
                 *, absolute: bool = False, params: dict | None = None) -> dict:
        url = path if absolute else self._url(path)
        if params:
            url += "?" + urllib.parse.urlencode(params)
        data = json.dumps(body).encode() if body is not None else None
        headers = {"Content-Type": "application/json", **self.config.default_headers}
        if self.config.sigv4 is not None:
            from .sigv4 import sign_request

            headers = sign_request(self.config.sigv4, method, url, headers, data)
        else:
            token = self._ensure_token()
            if token:
                headers["Authorization"] = f"Bearer {token}"
        req = urllib.request.Request(url, data=data, method=method, headers=headers)
        try:
            with self._opener(req) as resp:
                raw = resp.read()
                return json.loads(raw.decode()) if raw else {}
        except urllib.error.HTTPError as e:
            msg = e.read().decode(errors="replace")
            if e.code == 409:
                raise CommitConflict(e.code, msg) from None
            raise CatalogError(e.code, msg) from None

    def _load_config(self) -> None:
        base = self.config.uri.rstrip("/")
        url = f"{base}/v1/config"
        if self.config.warehouse:
            url += "?" + urllib.parse.urlencode({"warehouse": self.config.warehouse})
        resp = self._request("GET", url, absolute=True)
        overrides = resp.get("overrides", {}) or {}
        defaults = resp.get("defaults", {}) or {}
        self._prefix = overrides.get("prefix") or defaults.get("prefix") or ""

    @staticmethod
    def _ns(namespace: str | tuple) -> str:
        parts = namespace.split(".") if isinstance(namespace, str) else list(namespace)
        # multipart namespaces joined by the %1F unit separator per REST spec
        return urllib.parse.quote("\x1f".join(parts), safe="")

    # -- namespaces ---------------------------------------------------------

    def _paged(self, path: str, key: str) -> list:
        """GET with pageToken pagination (REST spec next-page-token;
        reference: catalog_api.cpp:309-361 loops the same way) — a catalog
        holding thousands of tables returns them in pages, and stopping at
        page one would silently hide the rest."""
        out: list = []
        token = ""
        while True:
            q = f"?pageToken={urllib.parse.quote(token, safe='')}" if token else ""
            resp = self._request("GET", path + q)
            out.extend(resp.get(key, []) or [])
            token = resp.get("next-page-token") or ""
            if not token:
                return out

    def list_namespaces(self) -> list[list[str]]:
        return self._paged("/namespaces", "namespaces")

    def create_namespace(self, namespace: str | tuple,
                         properties: dict[str, str] | None = None) -> dict:
        parts = namespace.split(".") if isinstance(namespace, str) else list(namespace)
        return self._request("POST", "/namespaces", {
            "namespace": parts, "properties": properties or {}})

    def drop_namespace(self, namespace: str | tuple) -> None:
        self._request("DELETE", f"/namespaces/{self._ns(namespace)}")

    def namespace_properties(self, namespace: str | tuple) -> dict[str, str]:
        resp = self._request("GET", f"/namespaces/{self._ns(namespace)}")
        return resp.get("properties", {}) or {}

    def update_namespace_properties(
        self, namespace: str | tuple, *, updates: dict[str, str] | None = None,
        removals: list[str] | None = None,
    ) -> dict:
        """reference: iceberg_schema_properties_functions.cpp set/remove."""
        return self._request(
            "POST", f"/namespaces/{self._ns(namespace)}/properties",
            {"updates": updates or {}, "removals": removals or []})

    # -- tables -------------------------------------------------------------

    def list_tables(self, namespace: str | tuple) -> list[dict]:
        return self._paged(
            f"/namespaces/{self._ns(namespace)}/tables", "identifiers")

    def load_table(self, namespace: str | tuple, name: str) -> "RestTable":
        key = self._cache_key(namespace, name)
        if self._staleness_s is not None:
            hit = self._table_cache.get(key)
            if hit is not None and _time.monotonic() - hit[0] < self._staleness_s:
                return RestTable.from_load_result(self, namespace, name, hit[1])
        resp = self._request(
            "GET", f"/namespaces/{self._ns(namespace)}/tables/{urllib.parse.quote(name)}")
        if self._staleness_s is not None:
            self._table_cache[key] = (_time.monotonic(), resp)
        return RestTable.from_load_result(self, namespace, name, resp)

    def table_exists(self, namespace: str | tuple, name: str) -> bool:
        try:
            self.load_table(namespace, name)
            return True
        except CatalogError as e:
            if e.status == 404:
                return False
            raise

    def create_table(self, namespace: str | tuple, name: str, schema: dict,
                     *, location: str | None = None,
                     partition_spec: dict | None = None,
                     properties: dict[str, str] | None = None,
                     stage_create: bool | None = None,
                     if_not_exists: bool = False) -> "RestTable":
        """reference: physical_iceberg_create_table.cpp — stage-create, then
        the first append commits it. ``if_not_exists`` mirrors CREATE TABLE
        IF NOT EXISTS (nested_namespaces/test_create_if_not_exists.test):
        an already-existing table makes the create a no-op that LOADS and
        returns the existing table instead of raising the 409."""
        if stage_create is None:
            stage_create = self.config.stage_create_tables
        body: dict[str, Any] = {
            "name": name, "schema": schema,
            "stage-create": stage_create,
            "properties": properties or {},
        }
        if location:
            body["location"] = location
        if partition_spec:
            body["partition-spec"] = partition_spec
        try:
            resp = self._request(
                "POST", f"/namespaces/{self._ns(namespace)}/tables", body)
        except CatalogError as e:
            if if_not_exists and e.status == 409:
                return self.load_table(namespace, name)
            raise
        return RestTable.from_load_result(self, namespace, name, resp)

    def register_table(self, namespace: str | tuple, name: str,
                       metadata_location: str, *,
                       overwrite: bool = False) -> "RestTable":
        """Register an EXISTING table's metadata file into the catalog
        (spec ``POST /namespaces/{ns}/register``; the reference models
        the request — rest_catalog/objects/register_table_request.cpp:
        required name + metadata-location, optional overwrite). The
        classic migration path for filesystem tables this engine wrote
        with ``write_iceberg``: no data moves, the catalog just starts
        tracking the current metadata JSON."""
        body: dict[str, Any] = {
            "name": name, "metadata-location": metadata_location}
        if overwrite:
            body["overwrite"] = True
        resp = self._request(
            "POST", f"/namespaces/{self._ns(namespace)}/register", body)
        return RestTable.from_load_result(self, namespace, name, resp)

    def create_table_as(self, spark, namespace: str | tuple, name: str, df,
                        *, location: str | None = None,
                        properties: dict[str, str] | None = None) -> "RestTable":
        """CTAS through the catalog: derive the Iceberg schema (field-ids
        allocated) from the DataFrame, create the table, then append the
        rows as the first snapshot (reference:
        physical_iceberg_create_table.cpp — create + insert sink)."""
        from ..metadata import types as ice_types

        schema, _last = ice_types.struct_to_schema_json(df.schema)
        table = self.create_table(namespace, name, schema,
                                  location=location, properties=properties)
        return table.append(spark, df)

    def drop_table(self, namespace: str | tuple, name: str, *, purge: bool = False) -> None:
        self.invalidate_table_cache(namespace, name)
        self._request(
            "DELETE", f"/namespaces/{self._ns(namespace)}/tables/{urllib.parse.quote(name)}",
            params={"purgeRequested": "true"} if purge else None)

    def rename_table(self, src_ns: str | tuple, src_name: str,
                     dst_ns: str | tuple, dst_name: str) -> None:
        """reference: iceberg_schema_entry.cpp:333-350 (RENAME TABLE)."""
        # both keys: the source must stop serving pre-rename metadata and a
        # stale destination entry (from an earlier table of that name) must
        # not shadow the renamed table
        self.invalidate_table_cache(src_ns, src_name)
        self.invalidate_table_cache(dst_ns, dst_name)

        def ident(ns, n):
            parts = ns.split(".") if isinstance(ns, str) else list(ns)
            return {"namespace": parts, "name": n}

        self._request("POST", "/tables/rename", {
            "source": ident(src_ns, src_name),
            "destination": ident(dst_ns, dst_name)})

    # -- commits ------------------------------------------------------------

    def commit_table(self, namespace: str | tuple, name: str,
                     requirements: list[dict], updates: list[dict]) -> dict:
        self.invalidate_table_cache(namespace, name)
        return self._request(
            "POST", f"/namespaces/{self._ns(namespace)}/tables/{urllib.parse.quote(name)}",
            {"identifier": {
                "namespace": namespace.split(".") if isinstance(namespace, str) else list(namespace),
                "name": name},
             "requirements": requirements, "updates": updates})

    def commit_transaction(self, table_changes: list[dict]) -> dict:
        """Atomic multi-table commit (CommitTransactionRequest; reference:
        iceberg_transaction.cpp:141-145): every table's requirements are
        validated and all updates apply, or none do. Each entry:
        {"identifier": {"namespace": [...], "name": ...},
         "requirements": [...], "updates": [...]}."""
        self.invalidate_table_cache()  # conservative: any table may change
        return self._request("POST", "/transactions/commit",
                             {"table-changes": table_changes})

    def transaction(self) -> "CatalogTransaction":
        """Begin a multi-table DATA-PLANE transaction: run any dml function
        (or RestTable-style append) against ``txn.table(ns, name)`` targets
        — data files and manifests land in storage immediately, snapshot
        commits are STAGED — then ``txn.commit()`` applies every staged
        snapshot atomically via CommitTransactionRequest."""
        return CatalogTransaction(self)

    # -- views (Iceberg view spec v1 over the REST /views endpoints; the
    # reference ships only the generated request/response objects for
    # these — rest_catalog/objects/sqlview_representation.cpp,
    # assert_view_uuid.cpp — with no engine wiring, so this surface is
    # beyond-reference but spec-shaped) --------------------------------

    def list_views(self, namespace: str | tuple) -> list[dict]:
        return self._paged(
            f"/namespaces/{self._ns(namespace)}/views", "identifiers")

    def load_view(self, namespace: str | tuple, name: str) -> "RestView":
        resp = self._request(
            "GET",
            f"/namespaces/{self._ns(namespace)}/views/"
            f"{urllib.parse.quote(name)}")
        return RestView(self, namespace, name, resp.get("metadata", {}),
                        resp.get("metadata-location"))

    def view_exists(self, namespace: str | tuple, name: str) -> bool:
        try:
            self.load_view(namespace, name)
            return True
        except CatalogError as e:
            if e.status == 404:
                return False
            raise

    def create_view(self, namespace: str | tuple, name: str, sql: str, *,
                    schema: dict | None = None, dialect: str = "spark",
                    location: str | None = None,
                    properties: dict[str, str] | None = None) -> "RestView":
        """CreateViewRequest: one initial version with a single SQL
        representation. ``schema`` defaults to an empty struct — engines
        that can infer the view schema pass the real one."""
        ns_parts = (namespace.split(".") if isinstance(namespace, str)
                    else list(namespace))
        version = {
            "version-id": 1,
            "timestamp-ms": int(_time.time() * 1000),
            "schema-id": (schema or {}).get("schema-id", 0),
            "summary": {"engine-name": "duckdb_iceberg_spark"},
            "representations": [
                {"type": "sql", "sql": sql, "dialect": dialect}],
            "default-namespace": ns_parts,
        }
        body: dict[str, Any] = {
            "name": name,
            "schema": schema or {"type": "struct", "schema-id": 0,
                                 "fields": []},
            "view-version": version,
            "properties": properties or {},
        }
        if location:
            body["location"] = location
        resp = self._request(
            "POST", f"/namespaces/{self._ns(namespace)}/views", body)
        return RestView(self, namespace, name, resp.get("metadata", {}),
                        resp.get("metadata-location"))

    def replace_view(self, namespace: str | tuple, name: str, sql: str, *,
                     dialect: str = "spark",
                     schema: dict | None = None) -> "RestView":
        """CREATE OR REPLACE VIEW: commits add-view-version +
        set-current-view-version(-1) (the spec's 'last added' sentinel)
        under an assert-view-uuid requirement, so a concurrent re-create
        (different uuid) conflicts instead of being clobbered."""
        cur = self.load_view(namespace, name)
        ns_parts = (namespace.split(".") if isinstance(namespace, str)
                    else list(namespace))
        next_id = max(
            (v.get("version-id", 0)
             for v in cur.metadata.get("versions", [])), default=0) + 1
        version = {
            "version-id": next_id,
            "timestamp-ms": int(_time.time() * 1000),
            "schema-id": (schema or {}).get("schema-id",
                                            cur.current_version()
                                            .get("schema-id", 0)),
            "summary": {"engine-name": "duckdb_iceberg_spark"},
            "representations": [
                {"type": "sql", "sql": sql, "dialect": dialect}],
            "default-namespace": ns_parts,
        }
        updates: list[dict] = []
        if schema is not None:
            updates.append({"action": "add-schema", "schema": schema})
        updates += [
            {"action": "add-view-version", "view-version": version},
            {"action": "set-current-view-version", "view-version-id": -1},
        ]
        resp = self._request(
            "POST",
            f"/namespaces/{self._ns(namespace)}/views/"
            f"{urllib.parse.quote(name)}",
            {"identifier": {"namespace": ns_parts, "name": name},
             "requirements": [{"type": "assert-view-uuid",
                               "uuid": cur.metadata.get("view-uuid")}],
             "updates": updates})
        return RestView(self, namespace, name, resp.get("metadata", {}),
                        resp.get("metadata-location"))

    def drop_view(self, namespace: str | tuple, name: str) -> None:
        self._request(
            "DELETE",
            f"/namespaces/{self._ns(namespace)}/views/"
            f"{urllib.parse.quote(name)}")

    def rename_view(self, src_ns: str | tuple, src_name: str,
                    dst_ns: str | tuple, dst_name: str) -> None:
        def ident(ns, n):
            parts = ns.split(".") if isinstance(ns, str) else list(ns)
            return {"namespace": parts, "name": n}

        self._request("POST", "/views/rename", {
            "source": ident(src_ns, src_name),
            "destination": ident(dst_ns, dst_name)})


class RestView:
    """An Iceberg view loaded from the REST catalog: versioned SQL
    representations per the view spec v1. ``sql()`` resolves the current
    version's representation (exact dialect match first, else the first
    SQL representation — the spec's cross-engine fallback), and
    ``register()`` exposes it to Spark as a temp view so `spark.sql`
    queries compose it with attached Iceberg tables."""

    def __init__(self, catalog: "RestCatalog", namespace, name: str,
                 metadata: dict, metadata_location: str | None = None):
        self.catalog = catalog
        self.namespace = namespace
        self.name = name
        self.metadata = metadata or {}
        self.metadata_location = metadata_location

    def current_version(self) -> dict:
        cur = self.metadata.get("current-version-id")
        for v in self.metadata.get("versions", []):
            if v.get("version-id") == cur:
                return v
        return {}

    def sql(self, dialect: str = "spark") -> str:
        reps = self.current_version().get("representations", [])
        for r in reps:
            if r.get("type") == "sql" and r.get("dialect") == dialect:
                return r["sql"]
        for r in reps:
            if r.get("type") == "sql":
                return r["sql"]
        raise ValueError(
            f"view {self.name} has no SQL representation")

    def register(self, spark, alias: str | None = None,
                 dialect: str = "spark") -> str:
        view = alias or self.name
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {view} AS {self.sql(dialect)}")
        return view


@dataclass
class RestTable:
    """A catalog-resident table: parsed metadata + commit affordances."""

    catalog: RestCatalog
    namespace: str | tuple
    name: str
    metadata_location: Optional[str]
    metadata: TableMetadata
    #: vended storage credentials from LoadTableResult config (may be empty)
    storage_config: dict = field(default_factory=dict)

    @classmethod
    def from_load_result(cls, catalog: RestCatalog, namespace, name, resp: dict) -> "RestTable":
        meta_json = resp["metadata"]
        tm = TableMetadata(meta_json, meta_json.get("location", ""))
        # vended per-table storage credentials (LoadTableResult `config` /
        # `storage-credentials`; reference:
        # iceberg_table_secret_provider.cpp CreateSecret): register a
        # location-scoped FileIO so every metadata/data read under this table
        # uses the vended credentials, not ambient ones.
        config = dict(resp.get("config") or {})
        for cred in resp.get("storage-credentials") or []:
            if tm.location.startswith(cred.get("prefix", "")):
                config.update(cred.get("config") or {})
        if config and tm.location:
            from .. import io as fio

            fio.io_for_storage_config(tm.location, config)
        table = cls(catalog=catalog, namespace=namespace, name=name,
                    metadata_location=resp.get("metadata-location"), metadata=tm)
        table.storage_config = config
        return table

    def spark_hadoop_options(self) -> dict[str, str]:
        """Per-bucket Hadoop conf for clusters reading the data plane
        natively (hadoop-aws): apply with
        ``for k, v in t.spark_hadoop_options().items():
        spark.conf.set("spark.hadoop." + k, v)``."""
        from .. import io as fio

        return fio.spark_hadoop_options(
            self.metadata.location, getattr(self, "storage_config", {}) or {})

    def refresh(self) -> "RestTable":
        fresh = self.catalog.load_table(self.namespace, self.name)
        self.metadata_location = fresh.metadata_location
        self.metadata = fresh.metadata
        return self

    # -- data-plane DML committed through the catalog -----------------------

    def append(self, spark, df) -> "RestTable":
        """INSERT INTO through the catalog (the reference's IcebergInsert →
        transaction commit flow): parquet + manifests + manifest list are
        written to the table's storage, then the snapshot commits via
        CommitTableRequest with CAS requirements and rebase retry —
        metadata is never swapped on the filesystem directly."""
        from ..sources.writer import commit_snapshot, write_data_files

        files, _ = write_data_files(spark, df, self.metadata)
        commit_snapshot(
            self.metadata, operation="append", new_data_files=files,
            commit_fn=lambda s, rebuild=None: self.commit_snapshot(
                s.to_json(), rebuild_fn=rebuild))
        return self  # commit_snapshot POST path refreshes on success

    def delete_where(self, spark, where: str,
                     mode: str = "merge-on-read") -> "RestTable":
        """DELETE through the catalog: row deletes (Puffin DVs on v3,
        positional parquet on v2) or copy-on-write rewrites land in table
        storage and the snapshot commits via the catalog. Retries follow
        DeleteCanReapply: reapplied only over pure-append histories."""
        from ..sources.dml import delete_from

        delete_from(spark, self, where, mode=mode)
        return self

    def update_where(self, spark, assignments, where=None,
                     mode: str = "merge-on-read") -> "RestTable":
        """UPDATE through the catalog (delete+insert, one snapshot)."""
        from ..sources.dml import update_iceberg

        update_iceberg(spark, self, assignments, where, mode=mode)
        return self

    def merge(self, spark, source, on: str, **kwargs) -> "RestTable":
        """MERGE INTO through the catalog (see sources.dml.merge_into)."""
        from ..sources.dml import merge_into

        merge_into(spark, self, source, on, **kwargs)
        return self

    def _delete_can_reapply(self, base_snapshot_id: Optional[int]) -> bool:
        """A retried DELETE/overwrite is safe iff every commit in
        (base, tip] was a pure append — anything else may have removed or
        rewritten the rows the delete targeted (reference:
        iceberg_transaction.cpp DeleteCanReapply, :210-240). Ranges over
        sequence numbers; an unprovable history counts as not reappliable."""
        tip_id = self.metadata.current_snapshot_id
        if base_snapshot_id == tip_id:
            return True
        by_id = {s.snapshot_id: s for s in self.metadata.snapshots}
        base = by_id.get(base_snapshot_id)
        tip = by_id.get(tip_id)
        if base is None or tip is None:
            return False
        lo, hi = base.sequence_number, tip.sequence_number
        for s in self.metadata.snapshots:
            if lo < s.sequence_number <= hi and s.operation != "append":
                return False
        return True

    def commit_snapshot(self, snapshot_json: dict, *,
                        operation: str = "append", rebuild_fn=None,
                        branch: str | None = None) -> dict:
        """Optimistic commit with retry: on 409 refresh and re-validate.
        Appends are always retry-eligible; deletes/overwrites retry only
        when every intervening snapshot was a pure append (reference:
        iceberg_transaction.cpp VerifyDeleteRetryability, :243-273),
        otherwise the conflict surfaces to the caller to re-run.

        ``branch`` (r12) commits against a branch ref instead of main:
        the CAS requirement asserts THAT ref's head (None = the ref must
        not exist yet — a new branch forks atomically), only the branch
        ref advances, and main never moves. Branch conflicts retry for
        appends only; the delete-reapply analysis walks main lineage and
        does not transfer, so non-append branch conflicts surface.

        ``rebuild_fn(refreshed_metadata) -> Snapshot`` is REQUIRED for a
        retry to actually happen: the staged snapshot's manifest list was
        authored against the pre-conflict base, so it omits the concurrent
        winner's manifests — re-POSTing it with a patched parent id would
        make the tip silently drop the winner's files. The writer's
        commit_snapshot supplies a rebuilder that re-runs carry-forward +
        manifest-list authoring (and v3 row-id assignment) against the
        refreshed metadata. Without one, conflicts surface immediately."""
        append_retryable = operation == "append"
        ref_name = branch or "main"
        base_snapshot_id = self.metadata.current_snapshot_id
        # retry-state fingerprint (reference: iceberg_transaction_data.cpp
        # RetryStateMatches, :160-178): the staged data files were written
        # under THIS schema/spec/sort-order — if a concurrent commit
        # changed any of them, a rebase would graft old-layout files onto
        # a new-layout table, so the conflict must surface instead
        retry_state = (self.metadata.table_uuid,
                       self.metadata.current_schema_id,
                       self.metadata.default_spec_id,
                       self.metadata.default_sort_order_id)
        num_retries, min_wait_ms, max_wait_ms, total_wait_ms = \
            _retry_config(self.metadata.properties,
                          self.catalog.config.max_commit_retries)
        attempts = num_retries + 1  # retries come AFTER the first attempt
        started = time.time()
        prev_sleep_ms = min_wait_ms
        last: Exception | None = None
        for attempt in range(attempts):
            # v3 row lineage: a JSON-only commit (no data-plane manifests)
            # derives its range start from the table's next-row-id; data-
            # plane snapshots arrive with first-row-id already assigned by
            # the build (and re-assigned by each rebuild)
            if (self.metadata.format_version >= 3
                    and snapshot_json.get("first-row-id") is None):
                snapshot_json = dict(snapshot_json)
                snapshot_json["first-row-id"] = self.metadata.next_row_id
            if ref_name == "main":
                cur = self.metadata.current_snapshot_id
            else:
                cur = (self.metadata.refs.get(ref_name) or {}).get(
                    "snapshot-id")
            requirements: list[dict] = [{"type": "assert-table-uuid",
                                         "uuid": self.metadata.table_uuid}]
            requirements.append({"type": "assert-ref-snapshot-id",
                                 "ref": ref_name,
                                 "snapshot-id": cur})
            updates = [
                {"action": "add-snapshot", "snapshot": snapshot_json},
                {"action": "set-snapshot-ref", "ref-name": ref_name,
                 "type": "branch",
                 "snapshot-id": snapshot_json["snapshot-id"]},
            ]
            try:
                resp = self.catalog.commit_table(
                    self.namespace, self.name, requirements, updates)
                self.refresh()
                return resp
            except CommitConflict as e:
                last = e
                self.refresh()
                if retry_state != (self.metadata.table_uuid,
                                   self.metadata.current_schema_id,
                                   self.metadata.default_spec_id,
                                   self.metadata.default_sort_order_id):
                    raise CommitConflict(
                        409,
                        f"Table {self.namespace}.{self.name} changed "
                        "incompatibly while retrying commit") from e
                if branch and branch != "main" and not append_retryable:
                    # delete-reapply analysis walks MAIN lineage — it does
                    # not transfer to branch heads; surface the conflict
                    raise
                if not append_retryable and not self._delete_can_reapply(
                        base_snapshot_id):
                    raise
                if rebuild_fn is None:
                    # no rebuilder: a parent-id rebase would re-commit the
                    # stale manifest list WITHOUT the winner's manifests —
                    # surface the conflict instead of losing data
                    raise
                if attempt == attempts - 1:
                    raise
                # decorrelated-jitter backoff between retries, bounded by
                # commit.retry.{min,max}-wait-ms and the total timeout
                # (reference: iceberg_retry.cpp DecorrelatedBackoffMs;
                # only enforced after >=1 retry, mirroring Java Tasks)
                import random as _random

                hi = min(prev_sleep_ms * 3, max_wait_ms)
                lo = min(min_wait_ms, hi)
                sleep_ms = lo + _random.random() * (hi - lo)
                elapsed_ms = (time.time() - started) * 1000
                if attempt >= 1 and elapsed_ms + sleep_ms > total_wait_ms:
                    raise
                time.sleep(sleep_ms / 1000.0)
                prev_sleep_ms = sleep_ms
                snapshot_json = rebuild_fn(self.metadata).to_json()
        raise last  # type: ignore[misc]


class _StagedTable:
    """A transaction-scoped table target: duck-types RestTable's
    refresh()/metadata/commit_snapshot surface so every dml function works
    unchanged, but snapshot commits are staged into the owning transaction
    instead of POSTed."""

    def __init__(self, table: RestTable, txn: "CatalogTransaction"):
        self._table = table
        self._txn = txn
        self.namespace = table.namespace
        self.name = table.name
        self.catalog = table.catalog

    @property
    def metadata(self):
        # delegate, never alias: rollback() restores state by refreshing
        # the underlying RestTable (which REBINDS its metadata object), and
        # an aliased copy here would keep serving the rolled-back snapshot
        # whose files were just deleted
        return self._table.metadata

    def refresh(self) -> "_StagedTable":
        # inside a transaction, "refresh" returns the STAGED view (base +
        # staged snapshots), never the catalog tip — a mid-transaction
        # catalog refresh would discard the chain
        return self

    def commit_snapshot(self, snapshot_json: dict, *,
                        operation: str = "append", rebuild_fn=None,
                        branch: str | None = None) -> dict:
        # staged: conflicts surface at CatalogTransaction.commit(); the
        # rebuilder is unused because nothing is POSTed here. The snapshot
        # is applied to the LOCAL metadata copy so later statements in the
        # same transaction read and chain onto the staged state (reference:
        # test_delete_consolidation_transactional.test — insert + two
        # deletes on one table inside one BEGIN).
        #
        # ``branch`` (r13, VERDICT r12 task 5) stages onto a branch ref:
        # the WAP audit pipeline can now stage SEVERAL DMLs on a branch
        # atomically — only the branch ref advances locally (and at
        # commit time), main's current-snapshot-id and snapshot log stay
        # untouched, and one transaction may mix main- and branch-staged
        # statements on the same table (one change entry, one CAS per
        # touched ref).
        ref_name = branch or "main"
        tm = self.metadata
        existing = tm.refs.get(ref_name)
        if existing is not None and existing.get("type") == "tag":
            raise ValueError(f"ref {ref_name!r} is a tag, not a branch")
        self._txn._stage(self._table, snapshot_json, ref_name)
        snap = Snapshot.from_json(snapshot_json)
        tm.snapshots.append(snap)
        tm.last_sequence_number = max(tm.last_sequence_number,
                                      snap.sequence_number)
        if ref_name == "main":
            tm.current_snapshot_id = snap.snapshot_id
        # preserve any retention fields the ref already carries
        ref = dict(existing or {"type": "branch"})
        ref["snapshot-id"] = snap.snapshot_id
        tm.refs[ref_name] = ref
        return {}

    # convenience parity with RestTable
    def append(self, spark, df) -> "_StagedTable":
        from ..sources.writer import commit_snapshot, write_data_files

        files, _ = write_data_files(spark, df, self.metadata)
        commit_snapshot(self.metadata, operation="append",
                        new_data_files=files,
                        commit_fn=lambda s, rebuild=None: self.commit_snapshot(
                            s.to_json(), rebuild_fn=rebuild))
        return self


class CatalogTransaction:
    """Atomic multi-table data-plane transaction (reference:
    iceberg_transaction.cpp multi-table CommitTransactionRequest,
    :141-145): storage writes happen as each change is staged; the
    metadata becomes visible only when commit() lands, all tables at once
    or none. Staged snapshots on one table chain in staging order, onto
    main and/or branch refs (r13: the WAP audit shape — several DMLs
    staged on a branch commit atomically, with one CAS per touched
    ref)."""

    def __init__(self, catalog: RestCatalog):
        self.catalog = catalog
        self._staged: list[tuple[RestTable, dict, str]] = []
        # per (table-key, ref): the ref's head when the transaction FIRST
        # staged onto it — the CAS base asserted at commit() (None = the
        # ref must not exist yet, so a new branch forks atomically)
        self._bases: dict[tuple, int | None] = {}

    def table(self, namespace: str | tuple, name: str) -> _StagedTable:
        return _StagedTable(self.catalog.load_table(namespace, name), self)

    def _stage(self, table: RestTable, snapshot_json: dict,
               ref_name: str = "main") -> None:
        # multiple snapshots per table chain in staging order (the staged
        # metadata advances between them, _StagedTable.commit_snapshot)
        key = (self.catalog._ns(table.namespace), table.name)
        if (key, ref_name) not in self._bases:
            # called BEFORE the local metadata mutation, so this reads the
            # pre-transaction head of the ref
            tm = table.metadata
            self._bases[(key, ref_name)] = (
                tm.current_snapshot_id if ref_name == "main"
                else (tm.refs.get(ref_name) or {}).get("snapshot-id"))
        self._staged.append((table, snapshot_json, ref_name))

    def commit(self) -> dict:
        if not self._staged:
            return {}
        # group chained snapshots per table, preserving staging order:
        # one change entry per table, its updates adding every staged
        # snapshot then pointing each touched ref at ITS last staged
        # snapshot (r13: a transaction may stage onto main and/or branch
        # refs). The base requirement per ref is the head recorded when
        # the transaction first staged onto it — the catalog state when
        # the transaction began.
        per_table: dict[tuple, list] = {}
        order: list[tuple] = []
        tables: dict[tuple, RestTable] = {}
        for table, snap, ref_name in self._staged:
            key = (self.catalog._ns(table.namespace), table.name)
            if key not in per_table:
                per_table[key] = []
                order.append(key)
                tables[key] = table
            per_table[key].append((snap, ref_name))
        changes = []
        for key in order:
            table, staged = tables[key], per_table[key]
            ns = (table.namespace.split(".")
                  if isinstance(table.namespace, str) else list(table.namespace))
            updates = []
            refs_order: list[str] = []
            last_by_ref: dict[str, int] = {}
            for snap, ref_name in staged:
                updates.append({"action": "add-snapshot", "snapshot": snap})
                if ref_name not in last_by_ref:
                    refs_order.append(ref_name)
                last_by_ref[ref_name] = snap["snapshot-id"]
            for ref_name in refs_order:
                updates.append({"action": "set-snapshot-ref",
                                "ref-name": ref_name, "type": "branch",
                                "snapshot-id": last_by_ref[ref_name]})
            requirements = [{"type": "assert-table-uuid",
                             "uuid": table.metadata.table_uuid}]
            for ref_name in refs_order:
                requirements.append(
                    {"type": "assert-ref-snapshot-id", "ref": ref_name,
                     "snapshot-id": self._bases.get((key, ref_name))})
            changes.append({
                "identifier": {"namespace": ns, "name": table.name},
                "requirements": requirements,
                "updates": updates,
            })
        if self.catalog.config.disable_multi_table_commit:
            # compatibility fallback (ATTACH disable_multi_table_commit,
            # horizon_compatible_writes.test): catalogs without
            # /transactions/commit take one CommitTableRequest per table —
            # per-table atomicity only; a later failure leaves earlier
            # tables committed
            resp = {}
            for change in changes:
                ident = change["identifier"]
                resp = self.catalog.commit_table(
                    tuple(ident["namespace"]), ident["name"],
                    change["requirements"], change["updates"])
        else:
            resp = self.catalog.commit_transaction(changes)
        staged, self._staged = self._staged, []
        self._bases = {}
        for table, _, _ in staged:
            table.refresh()
        return resp

    def rollback(self) -> None:
        """Abandon the transaction: nothing was ever POSTed, so the
        catalog state is untouched; the storage files each staged
        snapshot wrote (data, manifests, manifest list) are deleted so a
        rollback leaves no garbage (reference:
        delete/delete_rollback_cleanup.test — files written by a
        rolled-back DELETE are cleaned up). The staged tables' in-memory
        metadata (mutated by _StagedTable.commit_snapshot) is restored from
        the catalog first, so reusing a table handle after rollback never
        plans scans against deleted manifests or chains a new transaction
        onto a snapshot the catalog never saw."""
        staged, self._staged = self._staged, []
        self._bases = {}
        for table in {id(t): t for t, _, _ in staged}.values():
            try:
                table.refresh()
            except Exception:
                pass  # best-effort: a dropped table has nothing to restore
        if not self.catalog.config.remove_files_on_delete:
            return
        for table, snap, _ in staged:
            _cleanup_staged_snapshot(table.metadata, snap)


def _cleanup_staged_snapshot(tm: TableMetadata, snap: dict) -> None:
    """Best-effort removal of everything one uncommitted snapshot wrote:
    its ADDED data/delete files, the manifests it authored, and its
    manifest list. Carried-forward manifests (added by earlier committed
    snapshots) are left alone."""
    from ..metadata import manifest as mf
    from ..plans.scan_plan import _localize
    from .. import io as fio

    sid = snap.get("snapshot-id")
    ml = snap.get("manifest-list")
    if not ml:
        return

    def _rm(path: str) -> None:
        try:
            fio.get_io(path).remove(path)
        except Exception:
            pass  # best-effort: an already-missing file is fine

    try:
        manifests = mf.read_manifest_list(_localize(tm, ml))
    except Exception:
        _rm(_localize(tm, ml))
        return
    for m in manifests:
        if m.added_snapshot_id != sid:
            continue  # carried forward from a committed snapshot
        mp = _localize(tm, m.manifest_path)
        try:
            for e in mf.read_manifest(mp):
                if e.status == mf.STATUS_ADDED and e.snapshot_id == sid:
                    _rm(_localize(tm, e.data_file.file_path))
        except Exception:
            pass
        _rm(mp)
    _rm(_localize(tm, ml))
