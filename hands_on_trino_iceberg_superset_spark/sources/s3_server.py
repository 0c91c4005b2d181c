"""In-process S3-compatible object store (MinIO stand-in).

The reference stack stores its Iceberg warehouse in MinIO over the
S3 REST protocol (compose/compose.yaml minio service; Trino's
``iceberg.properties`` points s3a at ``http://minio:9000``). This
module implements the subset of that wire protocol Spark's
filesystem layer needs — path-style PUT/GET/HEAD/DELETE objects,
ranged GET, bucket creation, and ListObjectsV2 with delimiter
grouping — on the stdlib HTTP server, so the s3a read/write path
can EXECUTE in tests instead of remaining a config seam.

Authentication matches the reference deployment: MinIO runs with
static credentials (``iceberg.properties:13-14``) and rejects
unsigned requests, so when the server is constructed with
``access_key``/``secret_key`` it verifies AWS Signature Version 4 on
EVERY request — recomputing the signature from the raw request line,
the signed headers, and the secret, and checking the declared
payload hash against the actual body — answering 403
``SignatureDoesNotMatch`` otherwise. With no credentials it stays an
open dev endpoint. Memory-backed: this is test scaffolding for
protocol execution, not a storage engine. Thread-safe via a single
lock around the object map — correctness over throughput, exactly
what a test double wants.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape


class MiniS3Server:
    """``server.url`` is the endpoint (http://127.0.0.1:<port>).

    ``page_size`` caps ListObjectsV2 pages like real S3/MinIO cap at
    1000 keys — set it low in tests to force clients through the
    IsTruncated/NextContinuationToken loop.

    ``access_key``/``secret_key`` turn on SigV4 verification: every
    request must carry a valid AWS4-HMAC-SHA256 Authorization header
    or the server answers 403 — the behavior a real MinIO with
    static credentials has."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 page_size: int = 1000,
                 access_key: str | None = None,
                 secret_key: str | None = None) -> None:
        store = self
        self._page_size = page_size
        self._access_key = access_key
        self._secret_key = secret_key

        self._lock = threading.Lock()
        #: bucket -> {key -> bytes}
        self._buckets: dict[str, dict[str, bytes]] = {}
        #: (bucket, key, upload_id) -> {part_number -> bytes}
        self._uploads: dict[tuple, dict[int, bytes]] = {}
        self._upload_seq = 0

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a) -> None:  # noqa: D102
                pass

            # -------------------------------------------- helpers

            def _split(self):
                u = urlparse(self.path)
                parts = u.path.lstrip("/").split("/", 1)
                bucket = unquote(parts[0]) if parts[0] else ""
                key = unquote(parts[1]) if len(parts) > 1 else ""
                # keep_blank_values: multipart markers travel as
                # bare '?uploads=' / '?uploadId=...' params
                q = {k: v[0] for k, v in
                     parse_qs(u.query, keep_blank_values=True).items()}
                return bucket, key, q

            def _send(self, code: int, body: bytes = b"",
                      ctype: str = "application/xml",
                      extra: dict | None = None) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _404(self) -> None:
                self._send(404, b"<Error><Code>NoSuchKey</Code></Error>")

            def _auth(self, body: bytes = b"") -> bool:
                """Verify SigV4 when credentials are configured;
                send the 403 and return False on failure."""
                if store._access_key is None:
                    return True
                try:
                    err = store._sigv4_error(self, body)
                except Exception as exc:  # noqa: BLE001 — malformed auth
                    err = f"malformed authorization: {exc}"
                if err is None:
                    return True
                if self.command == "HEAD":
                    # HEAD responses must not carry a body (a body
                    # here would desync HTTP/1.1 keep-alive framing)
                    self.send_response(403)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return False
                self._send(
                    403,
                    ("<Error><Code>SignatureDoesNotMatch</Code>"
                     f"<Message>{escape(err)}</Message>"
                     "</Error>").encode(),
                )
                return False

            # -------------------------------------------- methods

            def do_PUT(self) -> None:  # noqa: N802
                bucket, key, q = self._split()
                n = int(self.headers.get("Content-Length") or 0)
                data = self.rfile.read(n) if n else b""
                if not self._auth(data):
                    return
                if "uploadId" in q and "partNumber" in q:
                    # UploadPart: stage the part under its upload id
                    with store._lock:
                        up = store._uploads.get((bucket, key,
                                                 q["uploadId"]))
                        if up is None:
                            self._404()
                            return
                        up[int(q["partNumber"])] = data
                    self._send(200, extra={"ETag": '"0"'})
                    return
                src = self.headers.get("x-amz-copy-source")
                with store._lock:
                    if not key:  # create bucket
                        store._buckets.setdefault(bucket, {})
                        self._send(200)
                        return
                    b = store._buckets.setdefault(bucket, {})
                    if src:  # server-side copy
                        sb, _, sk = unquote(src).lstrip("/").partition("/")
                        blob = store._buckets.get(sb, {}).get(sk)
                        if blob is None:
                            self._404()
                            return
                        b[key] = blob
                        self._send(
                            200,
                            b"<CopyObjectResult><ETag>\"0\"</ETag>"
                            b"</CopyObjectResult>",
                        )
                        return
                    b[key] = data
                self._send(200, extra={"ETag": '"0"'})

            def do_GET(self) -> None:  # noqa: N802
                bucket, key, q = self._split()
                if not self._auth():
                    return
                with store._lock:
                    b = store._buckets.get(bucket)
                    if b is None:
                        self._404()
                        return
                    if not key:  # ListObjectsV2
                        self._send(200, store._list_xml(bucket, b, q))
                        return
                    blob = b.get(key)
                if blob is None:
                    self._404()
                    return
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    spec = rng[len("bytes="):]
                    lo_s, _, hi_s = spec.partition("-")
                    if lo_s:
                        lo = int(lo_s)
                        hi = min(int(hi_s), len(blob) - 1) if hi_s \
                            else len(blob) - 1
                    else:  # suffix range: last N bytes
                        lo = max(0, len(blob) - int(hi_s))
                        hi = len(blob) - 1
                    part = blob[lo:hi + 1]
                    self._send(
                        206, part, "application/octet-stream",
                        {"Content-Range":
                         f"bytes {lo}-{hi}/{len(blob)}"},
                    )
                    return
                self._send(200, blob, "application/octet-stream")

            def do_HEAD(self) -> None:  # noqa: N802
                bucket, key, _ = self._split()
                if not self._auth():
                    return
                with store._lock:
                    blob = store._buckets.get(bucket, {}).get(key)
                if blob is None:
                    # HEAD must not carry a body
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(blob)))
                self.send_header("Content-Type",
                                 "application/octet-stream")
                self.end_headers()

            def do_POST(self) -> None:  # noqa: N802
                """Multipart upload control plane: ``?uploads``
                initiates, ``?uploadId=`` completes (parts are
                assembled in part-number order; the staged parts are
                invisible to GET/LIST until completion, matching
                S3's all-or-nothing multipart semantics)."""
                bucket, key, q = self._split()
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                if not self._auth(body):
                    return
                if "uploads" in q:
                    with store._lock:
                        store._upload_seq += 1
                        uid = f"up-{store._upload_seq}"
                        store._uploads[(bucket, key, uid)] = {}
                    self._send(200, (
                        "<InitiateMultipartUploadResult>"
                        f"<Bucket>{escape(bucket)}</Bucket>"
                        f"<Key>{escape(key)}</Key>"
                        f"<UploadId>{uid}</UploadId>"
                        "</InitiateMultipartUploadResult>"
                    ).encode())
                    return
                if "uploadId" in q:
                    # assemble EXACTLY the parts the client's
                    # manifest names (real S3 semantics: a re-upload
                    # under a new number or a part omitted from the
                    # Complete body must not be concatenated in)
                    import re as _re

                    wanted = [int(m) for m in _re.findall(
                        rb"<PartNumber>\s*(\d+)\s*</PartNumber>", body
                    )]
                    with store._lock:
                        up = store._uploads.get(
                            (bucket, key, q["uploadId"]))
                        if up is None:
                            self._404()
                            return
                        if not wanted:
                            wanted = sorted(up)
                        if wanted != sorted(set(wanted)):
                            # real S3 requires STRICTLY ascending
                            # part numbers (no duplicates) — silently
                            # concatenating in manifest order would
                            # let a buggy client assemble a scrambled
                            # or double-spliced object this double
                            # accepts
                            self._send(400, (
                                "<Error><Code>InvalidPartOrder"
                                "</Code><Message>part numbers must "
                                "be strictly ascending</Message>"
                                "</Error>"
                            ).encode())
                            return
                        missing = [i for i in wanted if i not in up]
                        if missing:
                            self._send(400, (
                                "<Error><Code>InvalidPart</Code>"
                                f"<Message>missing parts {missing}"
                                "</Message></Error>"
                            ).encode())
                            return
                        store._uploads.pop((bucket, key, q["uploadId"]))
                        blob = b"".join(up[i] for i in wanted)
                        store._buckets.setdefault(bucket, {})[key] = blob
                    self._send(200, (
                        "<CompleteMultipartUploadResult>"
                        f"<Key>{escape(key)}</Key>"
                        "<ETag>\"0\"</ETag>"
                        "</CompleteMultipartUploadResult>"
                    ).encode())
                    return
                self._send(400, b"<Error><Code>InvalidRequest</Code>"
                                b"</Error>")

            def do_DELETE(self) -> None:  # noqa: N802
                bucket, key, q = self._split()
                if not self._auth():
                    return
                if "uploadId" in q:  # AbortMultipartUpload
                    with store._lock:
                        store._uploads.pop(
                            (bucket, key, q["uploadId"]), None)
                    self._send(204)
                    return
                with store._lock:
                    store._buckets.get(bucket, {}).pop(key, None)
                self._send(204)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------ listing

    def _list_xml(self, bucket: str, objects: dict[str, bytes],
                  q: dict) -> bytes:
        prefix = q.get("prefix", "")
        delim = q.get("delimiter", "")
        after = q.get("continuation-token", "")
        limit = min(int(q.get("max-keys", self._page_size)),
                    self._page_size)
        keys = sorted(k for k in objects if k.startswith(prefix))
        # entries in S3 list order: grouped prefixes sort among the
        # contents by their full string; emulate by walking sorted
        # keys and emitting each group at its first member
        entries: list[tuple[str, str]] = []  # (sort_key, kind)
        seen: set[str] = set()
        for k in keys:
            rest = k[len(prefix):]
            if delim and delim in rest:
                p = prefix + rest.split(delim, 1)[0] + delim
                if p not in seen:
                    seen.add(p)
                    entries.append((p, "prefix"))
                continue
            entries.append((k, "key"))
        if after:
            entries = [e for e in entries if e[0] > after]
        page = entries[:limit]
        truncated = len(entries) > limit
        parts = [
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
            "<ListBucketResult>",
            f"<Name>{escape(bucket)}</Name>",
            f"<Prefix>{escape(prefix)}</Prefix>",
            f"<KeyCount>{len(page)}</KeyCount>",
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>",
        ]
        if truncated:
            parts.append(
                "<NextContinuationToken>"
                f"{escape(page[-1][0])}"
                "</NextContinuationToken>"
            )
        for k, kind in page:
            if kind == "key":
                parts.append(
                    "<Contents>"
                    f"<Key>{escape(k)}</Key>"
                    f"<Size>{len(objects[k])}</Size>"
                    "<LastModified>2026-01-01T00:00:00.000Z"
                    "</LastModified>"
                    "</Contents>"
                )
            else:
                parts.append(
                    f"<CommonPrefixes><Prefix>{escape(k)}</Prefix>"
                    "</CommonPrefixes>"
                )
        parts.append("</ListBucketResult>")
        return "".join(parts).encode()

    # --------------------------------------------------------- auth

    def _sigv4_error(self, handler, body: bytes) -> str | None:
        """Recompute the AWS Signature Version 4 for the request and
        compare; None when valid, else a diagnostic message. The
        canonical query is the RAW wire query's key=value pairs
        sorted by key then value — the client canonicalizes the same
        raw bytes, so both sides hash identical strings."""
        auth = handler.headers.get("Authorization", "")
        prefix = "AWS4-HMAC-SHA256 "
        if not auth.startswith(prefix):
            return "missing or non-SigV4 Authorization header"
        fields: dict[str, str] = {}
        for part in auth[len(prefix):].split(","):
            k, _, v = part.strip().partition("=")
            fields[k] = v
        cred = fields.get("Credential", "").split("/")
        if len(cred) != 5 or cred[3] != "s3" or cred[4] != "aws4_request":
            return "malformed Credential scope"
        access_key, date, region = cred[0], cred[1], cred[2]
        if access_key != self._access_key:
            return "unknown access key"
        amz_date = handler.headers.get("x-amz-date", "")
        if not amz_date.startswith(date):
            return "x-amz-date does not match credential scope date"
        payload_hash = handler.headers.get("x-amz-content-sha256", "")
        if not payload_hash:
            return "missing x-amz-content-sha256"
        if payload_hash != "UNSIGNED-PAYLOAD" and \
                payload_hash != hashlib.sha256(body).hexdigest():
            return "payload hash does not match request body"
        signed = fields.get("SignedHeaders", "")
        if not signed:
            return "missing SignedHeaders"
        canon_hdrs = []
        for name in signed.split(";"):
            val = handler.headers.get(name)
            if val is None:
                return f"signed header '{name}' absent from request"
            canon_hdrs.append(f"{name}:{val.strip()}\n")
        raw_path, _, raw_query = handler.path.partition("?")
        pairs = []
        if raw_query:
            for tok in raw_query.split("&"):
                k, _, v = tok.partition("=")
                pairs.append((k, v))
        canon_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))
        canonical_request = "\n".join([
            handler.command, raw_path or "/", canon_query,
            "".join(canon_hdrs), signed, payload_hash,
        ])
        scope = f"{date}/{region}/s3/aws4_request"
        string_to_sign = "\n".join([
            "AWS4-HMAC-SHA256", amz_date, scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ])
        key = f"AWS4{self._secret_key}".encode()
        for step in (date, region, "s3", "aws4_request"):
            key = hmac_mod.new(key, step.encode(),
                               hashlib.sha256).digest()
        want = hmac_mod.new(key, string_to_sign.encode(),
                            hashlib.sha256).hexdigest()
        if not hmac_mod.compare_digest(want,
                                       fields.get("Signature", "")):
            return "signature mismatch"
        return None

    # ------------------------------------------------------ control

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def create_bucket(self, name: str) -> None:
        with self._lock:
            self._buckets.setdefault(name, {})

    def start(self) -> None:
        t = threading.Thread(target=self._httpd.serve_forever,
                             daemon=True)
        t.start()
        self._thread = t

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
