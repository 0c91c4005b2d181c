"""In-process S3-compatible object store (MinIO stand-in).

The reference stack stores its Iceberg warehouse in MinIO over the
S3 REST protocol (compose/compose.yaml minio service; Trino's
``iceberg.properties`` points s3a at ``http://minio:9000``). This
module implements the subset of that wire protocol Spark's
filesystem layer needs — path-style PUT/GET/HEAD/DELETE objects,
ranged GET, bucket creation, and ListObjectsV2 with delimiter
grouping — on the stdlib HTTP server, so the s3a read/write path
can EXECUTE in tests instead of remaining a config seam.

Deliberately unauthenticated (the reference's MinIO runs with
static dev credentials; auth headers are accepted and ignored) and
memory-backed: this is test scaffolding for protocol execution, not
a storage engine. Thread-safe via a single lock around the object
map — correctness over throughput, exactly what a test double wants.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape


class MiniS3Server:
    """``server.url`` is the endpoint (http://127.0.0.1:<port>).

    ``page_size`` caps ListObjectsV2 pages like real S3/MinIO cap at
    1000 keys — set it low in tests to force clients through the
    IsTruncated/NextContinuationToken loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 page_size: int = 1000) -> None:
        store = self
        self._page_size = page_size

        self._lock = threading.Lock()
        #: bucket -> {key -> bytes}
        self._buckets: dict[str, dict[str, bytes]] = {}

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
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
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

            # -------------------------------------------- methods

            def do_PUT(self) -> None:  # noqa: N802
                bucket, key, _ = self._split()
                n = int(self.headers.get("Content-Length") or 0)
                data = self.rfile.read(n) if n else b""
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

            def do_DELETE(self) -> None:  # noqa: N802
                bucket, key, _ = self._split()
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
