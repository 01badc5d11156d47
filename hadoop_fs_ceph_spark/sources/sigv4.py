"""AWS Signature Version 4 request signing — pure stdlib (hmac/hashlib).

Closes the last scoped-out gap of the HTTP object-store path: round 7's
``rgw_http`` spoke the RGW REST dialect unauthenticated ("auth headers are
the only missing piece" — rgw_http.py r7 docstring). Real Ceph RGW
authenticates the S3 dialect with SigV4, exactly like AWS S3; the
reference connector delegates credential resolution to the Hadoop conf and
the embedded S3AFileSystem (``CephRgwFileSystem.java:106-110,124-126``),
whose wire form is this signature. The algorithm is fully public
(AWS "Signature Version 4 signing process" documentation):

1. CanonicalRequest  = METHOD ‖ canonical URI ‖ canonical query string ‖
                       canonical headers ‖ signed header list ‖
                       hex(SHA256(payload))
2. StringToSign      = "AWS4-HMAC-SHA256" ‖ amzdate ‖
                       date/region/service/aws4_request ‖
                       hex(SHA256(CanonicalRequest))
3. Signing key       = HMAC-chain over ("AWS4"+secret, date, region,
                       service, "aws4_request")
4. Authorization     = AWS4-HMAC-SHA256 Credential=.../scope,
                       SignedHeaders=..., Signature=hex(HMAC(key, STS))

Both DIRECTIONS are implemented so the loopback RGW can enforce auth the
way a real gateway does: :func:`sign_request` produces the headers a
client attaches; :func:`verify_request` recomputes the signature
server-side from the received request + the shared secret and compares in
constant time. ``tests/test_sigv4.py`` pins the published AWS signing-key
test vector, so the implementation is checked against the spec, not
against itself.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse

ALGORITHM = "AWS4-HMAC-SHA256"


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _uri_encode(s: str, encode_slash: bool) -> str:
    """AWS's strict RFC 3986 encoding: unreserved = A-Za-z0-9 - _ . ~ ;
    spaces become %20 (never +); '/' kept only in URI paths."""
    safe = "-_.~" + ("" if encode_slash else "/")
    return urllib.parse.quote(s, safe=safe)


def canonical_query(query: str) -> str:
    """Sorted, strictly-encoded key=value pairs (duplicate keys sorted by
    value, per the spec)."""
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = sorted(
        (_uri_encode(k, True), _uri_encode(v, True)) for k, v in pairs
    )
    return "&".join(f"{k}={v}" for k, v in enc)


def _fresh(amzdate: str, now_amzdate: str, max_skew_seconds: int) -> bool:
    """|now - request timestamp| <= skew, both ISO-basic UTC. Malformed
    timestamps are stale by definition (never raise: the HTTP layer
    answers 403)."""
    import calendar
    import time as _time

    fmt = "%Y%m%dT%H%M%SZ"
    try:
        a = calendar.timegm(_time.strptime(amzdate, fmt))
        b = calendar.timegm(_time.strptime(now_amzdate, fmt))
    except ValueError:
        return False
    return abs(a - b) <= max_skew_seconds


def signing_key(secret_key: str, date: str, region: str, service: str) -> bytes:
    """The HMAC derivation chain (step 3). ``date`` is YYYYMMDD."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def _canonical_request(
    method: str, path: str, query: str, headers: dict[str, str], payload_hash: str
) -> tuple[str, str]:
    """Returns (canonical_request, signed_headers). ``headers`` must
    already contain every header to sign (host, x-amz-date,
    x-amz-content-sha256, ...)."""
    norm = {k.lower().strip(): " ".join(v.split()) for k, v in headers.items()}
    signed = ";".join(sorted(norm))
    canon_headers = "".join(f"{k}:{norm[k]}\n" for k in sorted(norm))
    canon = "\n".join(
        [
            method.upper(),
            _uri_encode(urllib.parse.unquote(path), False) or "/",
            canonical_query(query),
            canon_headers,
            signed,
            payload_hash,
        ]
    )
    return canon, signed


def sign_request(
    method: str,
    url: str,
    *,
    access_key: str,
    secret_key: str,
    amzdate: str,
    payload: bytes = b"",
    region: str = "us-east-1",
    service: str = "s3",
    extra_headers: dict[str, str] | None = None,
) -> dict[str, str]:
    """Produce the header set (Host, x-amz-date, x-amz-content-sha256,
    Authorization) that authenticates ``method url`` under SigV4.
    ``amzdate`` is the ISO-basic timestamp YYYYMMDD'T'HHMMSS'Z' — passed
    in, never generated here, so signing is a pure function."""
    parts = urllib.parse.urlsplit(url)
    payload_hash = _sha256_hex(payload)
    headers = {
        "host": parts.netloc,
        "x-amz-date": amzdate,
        "x-amz-content-sha256": payload_hash,
        **(extra_headers or {}),
    }
    canon, signed = _canonical_request(
        method, parts.path, parts.query, headers, payload_hash
    )
    date = amzdate[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "\n".join([ALGORITHM, amzdate, scope, _sha256_hex(canon.encode())])
    sig = hmac.new(
        signing_key(secret_key, date, region, service), sts.encode(), hashlib.sha256
    ).hexdigest()
    headers["Authorization"] = (
        f"{ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return headers


def verify_request(
    method: str,
    path: str,
    query: str,
    headers: dict[str, str],
    *,
    secret_key: str,
    payload: bytes | None = None,
    access_key: str | None = None,
    now_amzdate: str | None = None,
    max_skew_seconds: int = 900,
) -> bool:
    """Server-side check: recompute the signature from the received
    request with the shared secret and compare constant-time. Returns
    False on any malformed/missing auth material rather than raising —
    the HTTP layer answers 403 either way.

    Enforced beyond the bare signature (real SigV4 gateways require all
    of these; review r9 closed the gap with the docstring's "exactly as
    real RGW enforces" claim):

    * ``host`` and EVERY ``x-amz-*`` header present on the request must
      appear in SignedHeaders — otherwise a captured request could be
      replayed with an added unsigned header (e.g. an unsigned Range)
      and still verify.
    * If ``now_amzdate`` is given (ISO-basic YYYYMMDD'T'HHMMSS'Z', the
      server's clock), ``|now - x-amz-date|`` must be within
      ``max_skew_seconds`` (default 900 s, AWS's ~15-minute window) —
      bounding how long a captured signed request stays replayable.
      ``None`` skips the freshness check (pure-function verification of
      pinned historical vectors).
    * If ``payload`` is given its hash must match the client's signed
      x-amz-content-sha256 claim (a mismatch means the body was swapped
      after signing). If ``access_key`` is given, the Credential
      scope's key ID must equal it — real RGW resolves the secret BY
      access key, so a wrong key ID must refuse even when the secret
      would verify (review r8)."""
    lower = {k.lower(): v for k, v in headers.items()}
    auth = lower.get("authorization", "")
    if not auth.startswith(ALGORITHM):
        return False
    try:
        fields = dict(
            kv.strip().split("=", 1) for kv in auth[len(ALGORITHM) :].split(",")
        )
        credential = fields["Credential"]
        signed_list = fields["SignedHeaders"].split(";")
        claimed_sig = fields["Signature"]
        ak, date, region, service, term = credential.split("/")
        amzdate = lower["x-amz-date"]
        payload_hash = lower["x-amz-content-sha256"]
    except (KeyError, ValueError):
        return False
    if access_key is not None and ak != access_key:
        return False
    if term != "aws4_request" or amzdate[:8] != date:
        return False
    if now_amzdate is not None and not _fresh(amzdate, now_amzdate, max_skew_seconds):
        return False
    # host and every present x-amz-* header must be signed: an unsigned
    # one could be added/altered after signing without breaking the
    # signature (SigV4 requires them in the canonical set)
    required = {"host"} | {k for k in lower if k.startswith("x-amz-")}
    if required - set(signed_list):
        return False
    if payload is not None and _sha256_hex(payload) != payload_hash:
        return False
    to_sign = {k: lower[k] for k in signed_list if k in lower}
    if set(signed_list) - set(to_sign):
        return False  # client claims a header it did not send
    canon, signed = _canonical_request(method, path, query, to_sign, payload_hash)
    if signed != ";".join(sorted(signed_list)):
        return False
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "\n".join([ALGORITHM, amzdate, scope, _sha256_hex(canon.encode())])
    expect = hmac.new(
        signing_key(secret_key, date, region, service), sts.encode(), hashlib.sha256
    ).hexdigest()
    return hmac.compare_digest(expect, claimed_sig)
