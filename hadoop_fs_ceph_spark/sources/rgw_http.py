"""HTTP object-store path, end to end — the reference's actual identity.

The reference connector's whole purpose is to mount a Ceph **RGW** bucket —
an HTTP object store speaking the S3 REST dialect — as a Hadoop FileSystem
(``CephRgwFileSystem.java:98-147``) and serve positioned reads from it
(``CephRgwInputStream.java:103-120``, each pread is a ranged object read).
The sandbox has no Ceph and no hadoop-aws jars (the s3a:// scheme is
unloadable — pinned by ``tests/test_rgw_http.py::test_s3a_waiver_pinned``),
so this module drives the SAME protocol surface over a loopback HTTP
server, all stdlib:

* :class:`LoopbackRgw` — a threading HTTP server implementing the
  S3/RGW REST subset the connector consumes: ``PUT`` object, ``HEAD``
  object (Content-Length), ``GET`` object with **RFC 7233 Range** support
  (``bytes=a-b`` → 206 partial content — the wire form of pread; suffix
  ``bytes=-N`` honored, malformed ranges ignored per §3.1), paginated
  ListObjectsV2 (``IsTruncated``/``NextContinuationToken``, real
  ``ListBucketResult`` XML), the **multipart upload** protocol
  (initiate / UploadPart / complete-in-part-order / abort), and optional
  **SigV4 enforcement** (403 on unsigned/mis-signed requests).
* :class:`RgwHttpDataSource` — a Spark Python DataSource (format
  ``rgw_http``) that performs the connector's three mechanics against that
  endpoint: list the bucket (one listing call = ``listStatus``), plan one
  input partition per *virtual block* (``CephRgwFileSystem.java:112`` —
  the store has no blocks; the connector invents them for parallelism),
  and serve each partition with ranged GETs honoring the Hadoop
  line-split contract (a record crossing a block boundary is read exactly
  once; see ``pydatasource.py`` for the two rules).

100 TB posture: planning is one ListObjectsV2 pass (O(#objects) driver
metadata, paginated in real RGW); every task fetches only its own
``[start, end + one straddling line]`` byte range — ranged GETs mean a
1000-executor cluster reads disjoint slices of the same multi-GB objects
with zero coordination, which is exactly how the reference divides RGW
objects among Hadoop splits. Swap ``endpoint`` for a real RGW URL and the
source is production-shaped: the listing paginates on IsTruncated/
NextContinuationToken, GETs retry transient 5xx with bounded backoff, and
requests are **SigV4-signed** when ``access.key``/``secret.key`` options
are set (sources/sigv4.py — the wire form of the credential resolution
the reference delegates to the Hadoop conf,
``CephRgwFileSystem.java:124-126``; our session-level analog remains
``session.s3a_storage_conf``). The loopback server ENFORCES the signature
when constructed with credentials, so the auth path is driven end to end.
"""

from __future__ import annotations

import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

# A straddling line is fetched in bounded continuation reads of this size —
# the same "buffer, never whole object" discipline as the reference's 4 MiB
# read buffers (CephRgwInputStream.java:120). Small here so tests actually
# exercise multi-fetch continuation.
CONTINUATION_BYTES = 8 * 1024
DEFAULT_BLOCKSIZE = 32 * 1024 * 1024
RETRY_ATTEMPTS = 4
RETRY_BASE_DELAY = 0.1  # seconds; doubles per attempt (0.1, 0.2, 0.4)


def _parse_range(rng: str, size: int):
    """RFC 7233 single-range parser for ``Range: bytes=...``.

    Returns an inclusive ``(lo, hi)`` span, ``"unsatisfiable"`` (→ 416), or
    ``None`` for no/malformed ranges (→ serve 200 full; RFC 7233 §3.1 lets a
    recipient ignore an invalid header — previously garbage or the suffix
    form ``bytes=-N`` raised ValueError in the handler thread and dropped
    the connection)."""
    if not rng.startswith("bytes="):
        return None
    lo_s, dash, hi_s = rng[len("bytes="):].partition("-")
    if dash != "-":
        return None
    try:
        if lo_s == "":  # suffix form bytes=-N: the final N bytes
            nsuf = int(hi_s)
            if nsuf <= 0:
                return "unsatisfiable" if nsuf == 0 else None
            return (max(0, size - nsuf), size - 1) if size else "unsatisfiable"
        lo = int(lo_s)
        hi = min(int(hi_s), size - 1) if hi_s else size - 1
    except ValueError:
        return None
    if lo < 0 or (hi_s and int(hi_s) < lo):
        return None
    if lo >= size:
        return "unsatisfiable"
    return (lo, hi)


# --------------------------------------------------------------------------
# Loopback RGW: the minimal S3 REST subset the connector consumes
# --------------------------------------------------------------------------
class _RgwHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "LoopbackRgw/1.0"

    # object store lives on the server instance: {(bucket, key): bytes}
    def _store(self) -> dict:
        return self.server.objects  # type: ignore[attr-defined]

    def log_message(self, *a):  # quiet: tests assert on responses, not logs
        pass

    def _split(self) -> tuple[str, str, dict]:
        parsed = urllib.parse.urlsplit(self.path)
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        q = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
        return bucket, key, q

    def _uploads(self) -> dict:
        return self.server.uploads  # type: ignore[attr-defined]

    def do_PUT(self):
        bucket, key, q = self._split()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if not self._authorized(payload=body):
            self._deny()
            return
        if "partNumber" in q and "uploadId" in q:
            # multipart UploadPart: buffer under the upload, not the store
            try:
                part_no = int(q["partNumber"])
                if not 1 <= part_no <= 10000:  # S3's documented part range
                    raise ValueError
            except ValueError:
                # malformed partNumber answers 400 — never an uncaught
                # exception severing the connection (same failure class
                # as the malformed-Range fix, review r8)
                self.send_response(400)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            with self.server.lock:  # type: ignore[attr-defined]
                up = self._uploads().get((bucket, key, q["uploadId"]))
                if up is not None:
                    up[part_no] = body
            if up is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("ETag", f'"part-{part_no}-{len(body)}"')
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self._store()[(bucket, key)] = body
        self.send_response(200)
        self.send_header("ETag", f'"{len(body)}"')
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_POST(self):
        bucket, key, q = self._split()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if not self._authorized(payload=body):
            self._deny()
            return
        if "uploads" in q:  # InitiateMultipartUpload
            # seq increment + registration under the server lock: two
            # concurrent initiates (the many-executors story) must never
            # mint the same UploadId (review r8)
            with self.server.lock:  # type: ignore[attr-defined]
                self.server.upload_seq += 1  # type: ignore[attr-defined]
                uid = f"upload-{self.server.upload_seq}"  # type: ignore[attr-defined]
                self._uploads()[(bucket, key, uid)] = {}
            root = ET.Element("InitiateMultipartUploadResult")
            ET.SubElement(root, "Bucket").text = bucket
            ET.SubElement(root, "Key").text = key
            ET.SubElement(root, "UploadId").text = uid
            out = ET.tostring(root, encoding="utf-8", xml_declaration=True)
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
            return
        if "uploadId" in q:  # CompleteMultipartUpload
            with self.server.lock:  # type: ignore[attr-defined]
                up = self._uploads().pop((bucket, key, q["uploadId"]), None)
                if up is not None:
                    # parts concatenate in partNumber order regardless of
                    # upload order; the ETag length is taken from the
                    # assembled bytes INSIDE the lock — re-reading the store
                    # after release would KeyError if a concurrent DELETE
                    # removed the key (review r9)
                    assembled = b"".join(up[p] for p in sorted(up))
                    self._store()[(bucket, key)] = assembled
            if up is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            root = ET.Element("CompleteMultipartUploadResult")
            ET.SubElement(root, "Bucket").text = bucket
            ET.SubElement(root, "Key").text = key
            ET.SubElement(root, "ETag").text = f'"{len(assembled)}"'
            out = ET.tostring(root, encoding="utf-8", xml_declaration=True)
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
            return
        self.send_response(400)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_DELETE(self):
        bucket, key, q = self._split()
        if not self._authorized():
            self._deny()
            return
        if "uploadId" in q:  # AbortMultipartUpload: discard buffered parts
            with self.server.lock:  # type: ignore[attr-defined]
                existed = self._uploads().pop((bucket, key, q["uploadId"]), None)
            self.send_response(204 if existed is not None else 404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        existed = self._store().pop((bucket, key), None)
        self.send_response(204 if existed is not None else 404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_HEAD(self):
        if not self._authorized():
            self._deny()
            return
        bucket, key, _ = self._split()
        body = self._store().get((bucket, key))
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def _authorized(self, payload: bytes = b"") -> bool:
        """SigV4 gate: when the server holds credentials, every request
        must carry a valid signature (recomputed server-side from the
        shared secret — sources/sigv4.py), exactly as real RGW enforces
        the S3 dialect. Credential-less servers accept everything (the
        anonymous test mode)."""
        creds = getattr(self.server, "credentials", None)
        if not creds:
            return True
        from hadoop_fs_ceph_spark.sources.sigv4 import verify_request

        parsed = urllib.parse.urlsplit(self.path)
        return verify_request(
            self.command,
            parsed.path,
            parsed.query,
            dict(self.headers),
            secret_key=creds[1],
            payload=payload,
            access_key=creds[0],  # wrong key ID refuses even with the secret
            # replay window: a captured signed request dies after ~15 min,
            # as real SigV4 gateways enforce (review r9)
            now_amzdate=time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()),
        )

    def _deny(self):
        self.send_response(403)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        with self.server.lock:  # type: ignore[attr-defined]
            inject = getattr(self.server, "fail_next_count", 0) > 0
            if inject:
                # test-only failure injection: transient 503, as a loaded RGW
                self.server.fail_next_count -= 1  # type: ignore[attr-defined]
        if inject:
            self.send_response(503)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if not self._authorized():
            self._deny()
            return
        bucket, key, q = self._split()
        if not key:  # bucket listing (ListObjectsV2 dialect)
            self._list_bucket(bucket, q)
            return
        body = self._store().get((bucket, key))
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        rng = self.headers.get("Range")
        span = _parse_range(rng, len(body)) if rng else None
        if span == "unsatisfiable":
            self.send_response(416)
            self.send_header("Content-Range", f"bytes */{len(body)}")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if isinstance(span, tuple):
            lo, hi = span
            part = body[lo : hi + 1]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{len(body)}")
            self.send_header("Content-Length", str(len(part)))
            self.end_headers()
            self.wfile.write(part)
            return
        # span is None: no Range header, or a malformed one (RFC 7233 §3.1:
        # a recipient MAY ignore an invalid Range and answer 200 full)
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()
        self.wfile.write(body)

    def _list_bucket(self, bucket: str, q: dict):
        """ListObjectsV2 with real pagination: results come back in pages of
        ``max-keys`` (capped by the server's ``page_size``), in key order,
        with ``IsTruncated`` + ``NextContinuationToken`` exactly as S3/RGW
        emit them. The continuation token is start-after semantics (the last
        key of the previous page) — the HTTP analog of the reference's
        readdir-until-eof loop (``native_rgw.c:269-283``)."""
        prefix = q.get("prefix", "")
        after = q.get("continuation-token", "")
        page = getattr(self.server, "page_size", 1000)
        try:
            # clamp at 0: max-keys=0 is valid S3 (empty page, IsTruncated
            # false, no token) — an unclamped negative would slice from the
            # tail, and page=0 with truncated=true would emit a token from
            # an empty page (IndexError severing the connection; review r9)
            page = min(page, max(0, int(q.get("max-keys", page))))
        except ValueError:
            pass
        matches = sorted(
            (k, len(body))
            for (b, k), body in self._store().items()
            if b == bucket and k.startswith(prefix) and k > after
        )
        emitted, truncated = matches[:page], page > 0 and len(matches) > page
        root = ET.Element("ListBucketResult")
        ET.SubElement(root, "Name").text = bucket
        ET.SubElement(root, "Prefix").text = prefix
        ET.SubElement(root, "MaxKeys").text = str(page)
        ET.SubElement(root, "IsTruncated").text = "true" if truncated else "false"
        if truncated:
            ET.SubElement(root, "NextContinuationToken").text = emitted[-1][0]
        for k, size in emitted:
            c = ET.SubElement(root, "Contents")
            ET.SubElement(c, "Key").text = k
            ET.SubElement(c, "Size").text = str(size)
        ET.SubElement(root, "KeyCount").text = str(len(emitted))
        out = ET.tostring(root, encoding="utf-8", xml_declaration=True)
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


class LoopbackRgw:
    """In-process RGW stand-in; context manager. ``endpoint`` is the base
    URL (http://127.0.0.1:<port>) executors hit with ranged GETs.
    ``page_size`` caps each ListObjectsV2 page (default 1000, as S3) —
    tests set it below the object count to force real truncation loops.
    ``credentials=(access_key, secret_key)`` turns on SigV4 enforcement:
    every request must carry a valid signature or is answered 403, as a
    real RGW gateway would."""

    def __init__(
        self, page_size: int = 1000, credentials: tuple[str, str] | None = None
    ):
        self._server = ThreadingHTTPServer(("127.0.0.1", 0), _RgwHandler)
        self._server.objects = {}  # type: ignore[attr-defined]
        self._server.uploads = {}  # type: ignore[attr-defined]
        self._server.upload_seq = 0  # type: ignore[attr-defined]
        self._server.lock = threading.Lock()  # type: ignore[attr-defined]
        self._server.page_size = page_size  # type: ignore[attr-defined]
        self._server.credentials = credentials  # type: ignore[attr-defined]
        self._server.daemon_threads = True
        self.credentials = credentials
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "LoopbackRgw":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def endpoint(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def fail_next(self, n: int) -> None:
        """Make the next ``n`` GETs answer 503 — injects the transient
        server-overload failures the client's bounded retry must absorb."""
        self._server.fail_next_count = n  # type: ignore[attr-defined]

    def put(self, bucket: str, key: str, data: bytes) -> None:
        """Upload through the real HTTP path (not a dict poke), so the
        round-trip exercises PUT framing too — signed when the server
        enforces SigV4."""
        url = f"{self.endpoint}/{bucket}/{urllib.parse.quote(key)}"
        req = urllib.request.Request(
            url,
            data=data,
            method="PUT",
            headers=_signed_headers("PUT", url, data, self.credentials),
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            if resp.status != 200:
                raise IOError(f"PUT {key} -> {resp.status}")


# --------------------------------------------------------------------------
# Client helpers (used by both planner and partition readers)
# --------------------------------------------------------------------------
def _signed_headers(
    method: str,
    url: str,
    payload: bytes,
    creds: tuple[str, str] | None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """SigV4 headers for one request, merged with ``extra`` (e.g. Range,
    which S3 includes in the signed set). Anonymous mode returns just
    ``extra``. The timestamp is stamped here — sources/sigv4.py stays a
    pure function of its inputs. urllib supplies the Host header from the
    URL; the signed 'host' value is identical, so it is dropped from the
    outgoing set."""
    if not creds:
        return dict(extra or {})
    from hadoop_fs_ceph_spark.sources.sigv4 import sign_request

    amzdate = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    headers = sign_request(
        method,
        url,
        access_key=creds[0],
        secret_key=creds[1],
        amzdate=amzdate,
        payload=payload,
        extra_headers=extra,
    )
    headers.pop("host", None)
    return headers


_IDEMPOTENT_METHODS = frozenset({"GET", "HEAD", "PUT", "DELETE"})


def _open_with_retry(req, attempts: int = RETRY_ATTEMPTS):
    """urlopen with bounded exponential backoff. Retries transient failures
    (connection reset/refused, timeout, HTTP 5xx — the failure modes of a
    real RGW under load); 4xx are semantic answers and surface immediately.
    The reference leaves retries to the S3A client; this is our analog.

    Only IDEMPOTENT methods auto-retry (GET/HEAD/PUT/DELETE — S3 PUTs of
    both objects and numbered parts are last-writer-wins, so a repeat is
    safe). Non-idempotent POSTs (InitiateMultipartUpload,
    CompleteMultipartUpload) get ONE attempt: a response lost after
    server-side success would otherwise trigger a duplicate complete that
    answers 404 and turns a successful upload into a client failure
    (review r9) — the caller owns recovery (abort + restart)."""
    delay = RETRY_BASE_DELAY
    if req.get_method() not in _IDEMPOTENT_METHODS:
        attempts = 1
    for attempt in range(attempts):
        try:
            return urllib.request.urlopen(req, timeout=30)
        except urllib.error.HTTPError as e:
            if e.code < 500 or attempt == attempts - 1:
                raise
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            if attempt == attempts - 1:
                raise
        time.sleep(delay)
        delay *= 2


def list_objects(
    endpoint: str,
    bucket: str,
    prefix: str,
    creds: tuple[str, str] | None = None,
) -> list[tuple[str, int]]:
    """ListObjectsV2: sorted (key, size) pairs under the prefix — the
    ``listStatus`` of the object world. Honors truncation: loops on
    ``IsTruncated``/``NextContinuationToken`` until the listing is complete,
    exactly as a real RGW paginates (and as the reference's readdir loops
    until eof, ``native_rgw.c:269-283``). SigV4-signed when ``creds`` is
    given (each page signed separately — the query string differs)."""
    out, token = [], None
    while True:
        url = f"{endpoint}/{bucket}?list-type=2&prefix={urllib.parse.quote(prefix)}"
        if token:
            url += f"&continuation-token={urllib.parse.quote(token)}"
        req = urllib.request.Request(
            url, headers=_signed_headers("GET", url, b"", creds)
        )
        with _open_with_retry(req) as resp:
            root = ET.fromstring(resp.read())
        for c in root.findall("Contents"):
            out.append((c.findtext("Key"), int(c.findtext("Size"))))
        if root.findtext("IsTruncated") != "true":
            break
        token = root.findtext("NextContinuationToken")
        if not token:
            raise IOError("truncated listing without NextContinuationToken")
    return sorted(out)


def get_range(
    endpoint: str,
    bucket: str,
    key: str,
    start: int,
    length: int,
    creds: tuple[str, str] | None = None,
) -> bytes:
    """One ranged GET — the HTTP form of the connector's pread
    (``CephRgwInputStream.java:103-120``). Returns at most ``length``
    bytes (shorter at object end). Transient failures retry with backoff
    via :func:`_open_with_retry`; SigV4-signed when ``creds`` is given
    (the Range header is part of the signed set, as S3 requires)."""
    if length <= 0:
        return b""
    url = f"{endpoint}/{bucket}/{urllib.parse.quote(key)}"
    rng = {"Range": f"bytes={start}-{start + length - 1}"}
    req = urllib.request.Request(
        url, headers=_signed_headers("GET", url, b"", creds, extra=rng)
    )
    try:
        with _open_with_retry(req) as resp:
            if resp.status not in (200, 206):
                raise IOError(f"GET {key} range -> {resp.status}")
            return resp.read()
    except urllib.error.HTTPError as e:
        if e.code == 416:  # start beyond object end
            return b""
        raise


def multipart_put(
    endpoint: str,
    bucket: str,
    key: str,
    data: bytes,
    part_size: int,
    creds: tuple[str, str] | None = None,
) -> int:
    """S3 multipart upload: InitiateMultipartUpload → UploadPart×N →
    CompleteMultipartUpload. Returns the part count.

    This is the wire form of the reference's buffered sequential write
    path: ``CephRgwOutputStream.java:53-63`` flushes bounded chunks at a
    moving cursor, and the S3AFileSystem the connector embeds
    (``CephRgwFileSystem.java:106-110``) turns exactly that pattern into
    multipart uploads for large objects. Each part is signed separately
    (the URLs differ); parts assemble in partNumber order server-side, so
    an uploader may parallelize or retry parts independently — the
    property that makes multi-GB writes from 1000 executors feasible."""
    if part_size <= 0:
        raise ValueError(f"part_size must be positive, got {part_size}")
    base = f"{endpoint}/{bucket}/{urllib.parse.quote(key)}"
    url = base + "?uploads"
    req = urllib.request.Request(
        url, data=b"", method="POST", headers=_signed_headers("POST", url, b"", creds)
    )
    with _open_with_retry(req) as resp:
        uid = ET.fromstring(resp.read()).findtext("UploadId")
    if not uid:
        raise IOError("InitiateMultipartUpload returned no UploadId")
    n = 0
    for i, start in enumerate(range(0, len(data), part_size), start=1):
        chunk = data[start : start + part_size]
        purl = f"{base}?partNumber={i}&uploadId={urllib.parse.quote(uid)}"
        req = urllib.request.Request(
            purl,
            data=chunk,
            method="PUT",
            headers=_signed_headers("PUT", purl, chunk, creds),
        )
        with _open_with_retry(req) as resp:
            if resp.status != 200:
                raise IOError(f"UploadPart {i} -> {resp.status}")
        n = i
    curl = f"{base}?uploadId={urllib.parse.quote(uid)}"
    req = urllib.request.Request(
        curl, data=b"", method="POST", headers=_signed_headers("POST", curl, b"", creds)
    )
    with _open_with_retry(req) as resp:
        if resp.status != 200:
            raise IOError(f"CompleteMultipartUpload -> {resp.status}")
    return n


def abort_multipart(
    endpoint: str,
    bucket: str,
    key: str,
    upload_id: str,
    creds: tuple[str, str] | None = None,
) -> None:
    """AbortMultipartUpload: discard an upload's buffered parts — the
    task-abort path of a distributed writer (a failed executor's partial
    upload must never become visible)."""
    url = f"{endpoint}/{bucket}/{urllib.parse.quote(key)}?uploadId={urllib.parse.quote(upload_id)}"
    req = urllib.request.Request(
        url, method="DELETE", headers=_signed_headers("DELETE", url, b"", creds)
    )
    try:
        with _open_with_retry(req) as resp:
            if resp.status not in (200, 204):
                raise IOError(f"AbortMultipartUpload -> {resp.status}")
    except urllib.error.HTTPError as e:
        # 404 = upload already gone — the success state for an abort whose
        # first attempt landed but whose response was lost (DELETE is in the
        # auto-retry set, so the retry must be idempotent end to end)
        if e.code != 404:
            raise


# --------------------------------------------------------------------------
# The rgw_http DataSource
# --------------------------------------------------------------------------
@dataclass
class _ObjectBlock(InputPartition):
    key: str
    start: int
    end: int  # exclusive
    size: int


class RgwHttpReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        from hadoop_fs_ceph_spark.sources.pydatasource import _parser_for

        self.schema = schema
        self.endpoint = options.get("endpoint")
        self.bucket = options.get("bucket")
        if not self.endpoint or not self.bucket:
            raise ValueError("rgw_http requires .option('endpoint', ...) and .option('bucket', ...)")
        self.prefix = options.get("prefix", "")
        self.blocksize = int(options.get("virtual.blocksize", DEFAULT_BLOCKSIZE))
        self.sep = options.get("sep", ",")
        # SigV4 credentials, same option names as the reference's Hadoop
        # conf delegation (fs.s3a.access.key / fs.s3a.secret.key analogs)
        ak, sk = options.get("access.key"), options.get("secret.key")
        self.creds = (ak, sk) if ak and sk else None
        self._parser_for = _parser_for

    def partitions(self) -> Sequence[InputPartition]:
        if self.blocksize <= 0:
            raise ValueError(f"virtual.blocksize must be positive, got {self.blocksize}")
        parts = []
        for key, size in list_objects(
            self.endpoint, self.bucket, self.prefix, creds=self.creds
        ):
            for start in range(0, size, self.blocksize):
                parts.append(
                    _ObjectBlock(key=key, start=start, end=min(start + self.blocksize, size), size=size)
                )
        return parts

    def read(self, partition: _ObjectBlock) -> Iterator[tuple]:
        """Hadoop line-split contract over ranged GETs: this split yields
        exactly the lines whose starting offset p satisfies
        ``start < p <= end`` (split 0 additionally owns p == 0). The first
        fetch covers the block itself; a line straddling ``end`` is
        completed with bounded continuation fetches.

        The scan tracks an offset ``pos`` into an immutable ``bytes`` buffer
        (``buf.find(b"\\n", pos)``) instead of copying/shifting a bytearray
        per line — O(block) total, so a 32 MiB block of short CSV lines
        costs one pass, not terabytes of memcpy (ADVICE r7, medium)."""
        parsers = [self._parser_for(f.dataType) for f in self.schema.fields]
        n = len(parsers)
        sep = self.sep.encode()
        ep, bk, key = self.endpoint, self.bucket, partition.key
        # +1 byte past end: lets us own a line starting exactly at `end`
        buf = get_range(
            ep, bk, key, partition.start,
            partition.end - partition.start + 1, creds=self.creds,
        )
        pos = 0  # scan offset: buf[pos] is the first unconsumed byte
        abs_base = partition.start  # absolute offset of buf[0]
        fetched_to = partition.start + len(buf)  # next absolute byte to fetch

        if partition.start > 0:
            i = buf.find(b"\n")
            if i < 0:
                return  # block is interior to one line owned by the previous split
            pos = i + 1

        while abs_base + pos <= partition.end:
            j = buf.find(b"\n", pos)
            while j < 0 and fetched_to < partition.size:
                more = get_range(ep, bk, key, fetched_to, CONTINUATION_BYTES, creds=self.creds)
                if not more:
                    break
                fetched_to += len(more)
                # drop the consumed prefix before concatenating so the copy
                # is bounded by the unconsumed straddling tail, not the block
                if pos:
                    abs_base += pos
                    buf = buf[pos:]
                    pos = 0
                search_from = len(buf)
                buf = buf + more
                j = buf.find(b"\n", search_from)
            if j < 0:  # final unterminated line
                if pos >= len(buf):
                    return
                line = buf[pos:]
                consumed = len(buf) - pos
            else:
                line = buf[pos:j]
                consumed = j + 1 - pos
            fields = line.rstrip(b"\r").split(sep)
            if len(fields) != n:
                raise ValueError(
                    f"{key}@{abs_base + pos}: expected {n} fields, got {len(fields)}"
                )
            yield tuple(
                None if not raw else parsers[i](raw.decode())
                for i, raw in enumerate(fields)
            )
            pos += consumed


class RgwHttpDataSource(DataSource):
    """``spark.read.format("rgw_http").schema(ddl)
    .option("endpoint", url).option("bucket", b).option("prefix", p)``.

    Options: ``virtual.blocksize`` (bytes per split), ``sep`` (delimiter).
    Schema-on-read line protocol, same as ``cephfs_like`` — the FS/object
    layer never interprets content (the reference's byte-stream contract).
    """

    @classmethod
    def name(cls) -> str:
        return "rgw_http"

    def reader(self, schema: StructType) -> RgwHttpReader:
        return RgwHttpReader(schema, self.options)


def probe_s3a_loadable(spark) -> bool:
    """True iff org.apache.hadoop.fs.s3a.S3AFileSystem is on the JVM
    classpath (it is NOT in this sandbox — hadoop-aws doesn't ship with
    the pyspark wheel). The waiver test pins this so the day the class
    appears, the real ``s3a://`` round-trip must replace the loopback."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:
        return False
