"""AWS Signature Version 4 request signing (pure stdlib).

The reference supports SigV4-authenticated REST catalogs (Glue, S3Tables:
src/catalog/rest/storage/authorization/sigv4.cpp; ATTACH options in
src/iceberg_attach.cpp:104-138). This is the standard public algorithm:
canonical request → string-to-sign → HMAC key derivation chain
(AWS4+secret → date → region → service → aws4_request).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import urllib.parse
from dataclasses import dataclass, field
from typing import Optional

__all__ = ["SigV4Config", "sign_request"]

_ALGO = "AWS4-HMAC-SHA256"


@dataclass
class SigV4Config:
    access_key: str
    secret_key: str
    region: str
    service: str = "execute-api"  # glue for Glue, s3tables for S3Tables
    session_token: Optional[str] = None
    extra_signed_headers: dict = field(default_factory=dict)
    #: S3-family services require the payload hash as a signed header;
    #: plain API endpoints (the AWS doc test vector) omit it
    sign_payload_header: bool = True


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _uri_encode(s: str, *, encode_slash: bool) -> str:
    safe = "-_.~" + ("" if encode_slash else "/")
    return urllib.parse.quote(s, safe=safe)


def _canonical_query(query: str) -> str:
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((_uri_encode(urllib.parse.unquote(k), encode_slash=True),
                      _uri_encode(urllib.parse.unquote(v), encode_slash=True)))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def sign_request(
    cfg: SigV4Config,
    method: str,
    url: str,
    headers: dict[str, str],
    body: bytes | None,
    *,
    now: _dt.datetime | None = None,
) -> dict[str, str]:
    """Return ``headers`` plus ``x-amz-date``, ``x-amz-content-sha256``,
    optional ``x-amz-security-token``, and ``Authorization``."""
    now = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")

    parsed = urllib.parse.urlsplit(url)
    host = parsed.netloc
    path = parsed.path or "/"
    payload_hash = hashlib.sha256(body or b"").hexdigest()

    out = dict(headers)
    out.setdefault("host", host)
    out["x-amz-date"] = amz_date
    if cfg.sign_payload_header:
        out["x-amz-content-sha256"] = payload_hash
    if cfg.session_token:
        out["x-amz-security-token"] = cfg.session_token
    for k, v in cfg.extra_signed_headers.items():
        out.setdefault(k, v)

    lower = {k.lower().strip(): " ".join(str(v).split()) for k, v in out.items()}
    signed_names = sorted(lower)
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)

    canonical = "\n".join([
        method.upper(),
        _uri_encode(urllib.parse.unquote(path), encode_slash=False),
        _canonical_query(parsed.query),
        canonical_headers,
        signed_headers,
        payload_hash,
    ])
    scope = f"{datestamp}/{cfg.region}/{cfg.service}/aws4_request"
    string_to_sign = "\n".join([
        _ALGO, amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])

    key = _hmac(("AWS4" + cfg.secret_key).encode(), datestamp)
    key = _hmac(key, cfg.region)
    key = _hmac(key, cfg.service)
    key = _hmac(key, "aws4_request")
    signature = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()

    out["Authorization"] = (
        f"{_ALGO} Credential={cfg.access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}")
    out.pop("host", None)  # urllib sets Host itself; it was only signed
    return out
