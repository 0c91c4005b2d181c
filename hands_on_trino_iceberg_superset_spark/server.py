"""SQL-over-HTTP wire entry: a minimal Trino client-protocol server.

In the reference every query crosses the network — the seeder drives
``http://trino:8080`` through the Trino CLI
(``/root/reference/compose/seed.sh:6-9``) and Superset connects with
SQLAlchemy URI ``trino://trino@trino:8080/iceberg``
(``compose/superset/init_db.py:8-9``). This module closes that
surface for the PySpark engine: :class:`TrinoWireServer` speaks the
documented Trino REST client protocol (the public
``/v1/statement`` + ``nextUri`` polling loop) over the stdlib HTTP
server, executing statements through :meth:`Engine.trino_sql` so
Trino-dialect SQL (three-part identifiers, varchar casts, ...) works
over the wire exactly as it does in-process.

Protocol subset implemented (enough for CLI/driver-style clients):

- ``POST /v1/statement`` with the SQL as the request body starts a
  query; the response carries ``id``, ``columns``, the first data
  page, and a ``nextUri`` while more pages remain.
- ``GET  /v1/statement/<id>/<page>`` fetches subsequent pages.
- ``DELETE /v1/statement/<id>/<page>`` cancels (drops the result).
- errors surface as ``{"error": {...}, "stats": {"state": "FAILED"}}``
  with HTTP 200, per protocol (transport succeeded, query failed).

Results are fully materialized on POST and paged from driver memory:
the wire entry is a control-plane surface (BI tools page through
modest result sets); bulk data movement belongs to the parquet/object
-store path, same division of labor as the reference stack.

Scale note: one Spark driver hosts the server; concurrent statements
share the SparkSession (Spark's scheduler interleaves jobs). The
``ThreadingHTTPServer`` handles each request in its own thread, so a
slow query does not block readiness probes.
"""

from __future__ import annotations

import json
import threading
import uuid
from datetime import date, datetime
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from hands_on_trino_iceberg_superset_spark.engine import Engine

#: rows per protocol page
PAGE_SIZE = 1000

#: Spark simpleString -> Trino type name (the subset the corpus uses)
_TYPE_MAP = {
    "bigint": "bigint",
    "int": "integer",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "string": "varchar",
    "double": "double",
    "float": "real",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp(3)",
    "timestamp_ntz": "timestamp(3)",
    "binary": "varbinary",
}


def _trino_type(simple: str) -> str:
    if simple in _TYPE_MAP:
        return _TYPE_MAP[simple]
    if simple.startswith("decimal"):
        return simple
    if simple.startswith("array<") and simple.endswith(">"):
        return f"array({_trino_type(simple[6:-1])})"
    return simple


def _json_value(v):
    """JSON-encodable cell value, Trino-client shaped."""
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode()
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    return v


class _Query:
    """Materialized result of one statement, paged."""

    def __init__(self, qid: str, columns: list[dict], rows: list[list]):
        self.qid = qid
        self.columns = columns
        self.rows = rows

    def page(self, idx: int) -> tuple[list[list], bool]:
        start = idx * PAGE_SIZE
        chunk = self.rows[start : start + PAGE_SIZE]
        has_more = len(self.rows) > start + PAGE_SIZE
        return chunk, has_more


class TrinoWireServer:
    """Serve :class:`Engine` over the Trino REST client protocol.

    >>> srv = TrinoWireServer(engine, port=0)  # ephemeral port
    >>> srv.start()
    >>> srv.url
    'http://127.0.0.1:54321'
    >>> ... POST f"{srv.url}/v1/statement" ...
    >>> srv.stop()
    """

    def __init__(self, engine: Engine | None = None, host: str = "127.0.0.1",
                 port: int = 8080):
        self.engine = engine or Engine()
        self._queries: dict[str, _Query] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, *args) -> None:
                pass

            def _reply(self, payload: dict, status: int = 200) -> None:
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self) -> None:  # noqa: N802 (http.server API)
                if self.path.rstrip("/") != "/v1/statement":
                    self._reply({"error": "not found"}, 404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                sql_text = self.rfile.read(n).decode()
                self._reply(outer._execute(sql_text))

            def do_GET(self) -> None:  # noqa: N802
                if self.path == "/v1/info":
                    self._reply({"starting": False,
                                 "nodeVersion": {"version": "spark-engine"}})
                    return
                parts = self.path.strip("/").split("/")
                if len(parts) == 4 and parts[:2] == ["v1", "statement"]:
                    self._reply(outer._next_page(parts[2], int(parts[3])))
                    return
                self._reply({"error": "not found"}, 404)

            def do_DELETE(self) -> None:  # noqa: N802
                parts = self.path.strip("/").split("/")
                if len(parts) >= 3 and parts[:2] == ["v1", "statement"]:
                    outer._cancel(parts[2])
                self._reply({})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ http

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    # -------------------------------------------------------- protocol

    def _execute(self, sql_text: str) -> dict:
        qid = uuid.uuid4().hex
        try:
            df = self.engine.trino_sql(sql_text)
            columns = [
                {
                    "name": f.name,
                    "type": _trino_type(f.dataType.simpleString()),
                }
                for f in df.schema.fields
            ]
            rows = [
                [_json_value(v) for v in row] for row in df.collect()
            ]
        except Exception as exc:  # noqa: BLE001 — protocol error shape
            return {
                "id": qid,
                "error": {
                    "message": str(exc),
                    "errorCode": 1,
                    "errorName": "GENERIC_USER_ERROR",
                    "errorType": "USER_ERROR",
                },
                "stats": {"state": "FAILED"},
            }
        q = _Query(qid, columns, rows)
        with self._lock:
            self._queries[qid] = q
        return self._page_payload(q, 0)

    def _next_page(self, qid: str, idx: int) -> dict:
        with self._lock:
            q = self._queries.get(qid)
        if q is None:
            return {
                "id": qid,
                "error": {"message": "unknown or cancelled query",
                          "errorCode": 2,
                          "errorName": "QUERY_NOT_FOUND",
                          "errorType": "USER_ERROR"},
                "stats": {"state": "FAILED"},
            }
        return self._page_payload(q, idx)

    def _cancel(self, qid: str) -> None:
        with self._lock:
            self._queries.pop(qid, None)

    def _page_payload(self, q: _Query, idx: int) -> dict:
        chunk, has_more = q.page(idx)
        payload: dict = {
            "id": q.qid,
            "columns": q.columns,
            "stats": {"state": "RUNNING" if has_more else "FINISHED"},
        }
        if chunk:
            payload["data"] = chunk
        if has_more:
            payload["nextUri"] = (
                f"{self.url}/v1/statement/{q.qid}/{idx + 1}"
            )
        else:
            with self._lock:
                self._queries.pop(q.qid, None)
        return payload
