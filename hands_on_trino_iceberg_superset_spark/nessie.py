"""Nessie-style REST catalog server (API v2 subset).

The reference stack's Iceberg catalog is Nessie over HTTP — Trino
points ``iceberg.catalog.type=nessie`` at
``http://nessie:19120/api/v2`` (``compose/trino/catalog/
iceberg.properties:4-7``) and every branch/merge/commit crosses that
wire. The branch/merge/CAS *semantics* already live in this repo's
lakehouse tier; this module closes the remaining surface: a network
catalog endpoint speaking the public Nessie REST API v2 shapes
(https://projectnessie.org/nessie-latest/api/), stdlib-HTTP-hosted
exactly like :class:`server.TrinoWireServer`.

Nessie's model, faithfully kept: the catalog stores only POINTERS —
each commit maps table keys to an ``ICEBERG_TABLE`` content carrying
a ``metadataLocation``; table data/metadata stay in the warehouse
(our ``lakehouse.iceberg`` files). Branches are names for commit
hashes; every mutation is an optimistic-concurrency commit (CAS on
an expected hash, per-key conflict detection against the commits
that landed in between); merge is three-way from the merge base.

Endpoints implemented (the subset a client needs to branch, commit,
read, and merge):

- ``GET    /api/v2/config``
- ``GET    /api/v2/trees``                       — list references
- ``POST   /api/v2/trees?name=N[&type=BRANCH]``  — create from source
- ``GET    /api/v2/trees/{ref}``                 — resolve (``name`` or ``name@hash``)
- ``DELETE /api/v2/trees/{name}@{hash}``         — CAS delete
- ``GET    /api/v2/trees/{ref}/entries``
- ``GET    /api/v2/trees/{ref}/contents/{key}``  — dotted key elements
- ``GET    /api/v2/trees/{from}/diff/{to}``      — key-level content diff
- ``POST   /api/v2/trees/{branch}@{hash}/history/commit``
- ``POST   /api/v2/trees/{branch}@{hash}/history/merge``

Stated subset limits (vs the full Nessie API v2): content types are
``ICEBERG_TABLE`` and ``NAMESPACE`` (anything else is a 400, never a
silent downgrade); references are BRANCH and TAG — tags are created
at a hash and immutable (a commit or merge targeting a tag is a 400,
matching real Nessie's refusal), reads AT a tag resolve normally;
and conflicts surface as one 409 class with the offending keys
rather than Nessie's detailed conflict taxonomy.

Scale note: a Nessie catalog is control-plane metadata — commits are
key->pointer maps (bytes per table, not per row), so the in-memory
commit DAG + a global lock is the right shape at any data scale; the
100 TB lives behind the metadataLocations, never in the catalog.
"""

from __future__ import annotations

import hashlib
import json
import threading
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

#: Nessie's well-known "no ancestor" sentinel hash
NO_ANCESTOR = "2e1cfa82b035c26cbbbdae632cea070514eb8b773f616aaeaf668e2f0be8f10d"


class NessieError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


@dataclass(frozen=True)
class _Commit:
    hash: str
    #: (first parent, *extra parents) — a merge commit records BOTH
    #: sides, so later merges find the true merge base instead of
    #: re-conflicting on already-merged keys
    parents: tuple
    #: full catalog state at this commit: "a.b.tbl" -> content dict
    contents: dict
    meta: dict = field(default_factory=dict)


def _khash(parents: tuple, contents: dict, meta: dict) -> str:
    return hashlib.sha256(
        json.dumps([list(parents), contents, meta],
                   sort_keys=True).encode()
    ).hexdigest()


def _key_str(key: dict | str) -> str:
    if isinstance(key, str):
        return key
    return ".".join(key["elements"])


def _key_json(key_str: str) -> dict:
    return {"elements": key_str.split(".")}


class _Store:
    """The commit DAG + branch heads, guarded by one lock (catalog
    commits are tiny and rare relative to data-plane work)."""

    def __init__(self, default_branch: str = "main"):
        self.lock = threading.Lock()
        self.default_branch = default_branch
        self.commits: dict[str, _Commit] = {}
        self.branches: dict[str, str] = {default_branch: NO_ANCESTOR}
        #: immutable references: created at a hash, never advanced —
        #: a commit/merge targeting one is rejected, reads resolve
        self.tags: dict[str, str] = {}

    # ------------------------------------------------------ resolve

    def _head_of(self, name: str) -> str:
        if name in self.branches:
            return self.branches[name]
        if name in self.tags:
            return self.tags[name]
        raise NessieError(404, f"reference '{name}' not found")

    def _resolve(self, ref: str) -> tuple[str, str]:
        """``name`` or ``name@hash`` -> (name, commit hash)."""
        name, _, h = unquote(ref).partition("@")
        head = self._head_of(name)
        if h:
            if h != head and h not in self.commits:
                raise NessieError(404, f"hash '{h}' not found")
            # real Nessie rejects an off-branch hash: a detached read
            # of branch A at branch B's hash must not serve B's
            # contents under A's name
            if h not in self._ancestor_hashes(head):
                raise NessieError(
                    400,
                    f"hash '{h}' is not an ancestor of "
                    f"reference '{name}'",
                )
            return name, h
        return name, head

    def _contents_at(self, h: str) -> dict:
        if h == NO_ANCESTOR:
            return {}
        return self.commits[h].contents

    def _ancestor_hashes(self, h: str) -> set:
        """All ancestors of ``h`` (inclusive), breadth-first over
        EVERY parent — merge commits contribute both sides."""
        seen = {NO_ANCESTOR}
        frontier = [h]
        while frontier:
            nxt = []
            for x in frontier:
                if x in seen:
                    continue
                seen.add(x)
                c = self.commits.get(x)
                if c is not None:
                    nxt.extend(c.parents)
            frontier = nxt
        return seen

    def _changed_since(self, head: str, base: str) -> set:
        """Keys whose content DIFFERS between ``head`` and ``base``
        (a semantic diff of the stored catalog maps — robust to any
        DAG shape). Raises if ``base`` is not an ancestor of
        ``head``."""
        if base not in self._ancestor_hashes(head):
            raise NessieError(
                409, f"hash {base} is not an ancestor of {head}"
            )
        hc = self._contents_at(head)
        bc = self._contents_at(base)
        return {
            k for k in set(hc) | set(bc) if hc.get(k) != bc.get(k)
        }

    def _merge_base(self, a: str, b: str) -> str:
        """Nearest common ancestor: first hash in a breadth-first
        walk from ``b`` that is also an ancestor of ``a``."""
        a_anc = self._ancestor_hashes(a)
        frontier, visited = [b], set()
        while frontier:
            nxt = []
            for x in frontier:
                if x in visited:
                    continue
                visited.add(x)
                if x in a_anc:
                    return x
                c = self.commits.get(x)
                if c is not None:
                    nxt.extend(c.parents)
            frontier = nxt
        return NO_ANCESTOR

    # ------------------------------------------------------ mutators

    def create_reference(
        self, name: str, source_name: str, source_hash: str | None,
        ref_type: str = "BRANCH",
    ) -> dict:
        with self.lock:
            if name in self.branches or name in self.tags:
                raise NessieError(
                    409, f"reference '{name}' already exists"
                )
            _, head = self._resolve(
                f"{source_name}@{source_hash}" if source_hash
                else source_name
            )
            if ref_type == "TAG":
                self.tags[name] = head
            else:
                self.branches[name] = head
            return self._ref_json(name)

    def delete_reference(self, name: str, expected: str) -> dict:
        with self.lock:
            if name == self.default_branch:
                raise NessieError(
                    400, "default branch cannot be deleted"
                )
            _, head = self._resolve(name)
            if expected != head:
                raise NessieError(
                    409,
                    f"expected hash {expected} but '{name}' is at "
                    f"{head}",
                )
            ref = self._ref_json(name)
            self.branches.pop(name, None)
            self.tags.pop(name, None)
            return ref

    def _require_branch(self, name: str, action: str) -> None:
        """Tags are immutable: real Nessie refuses a commit/merge
        whose target is a TAG rather than advancing it."""
        if name in self.tags:
            raise NessieError(
                400,
                f"reference '{name}' is a TAG — {action} requires a "
                "BRANCH (tags are immutable)",
            )

    def commit(
        self, branch: str, expected: str, ops: list, meta: dict
    ) -> dict:
        """Optimistic commit: ``expected`` must be the head or an
        ancestor of it whose intervening commits touch none of this
        commit's keys — Nessie's per-key conflict rule, not a bare
        head CAS."""
        with self.lock:
            self._require_branch(branch, "a commit")
            _, head = self._resolve(branch)
            if not expected:
                raise NessieError(400, "expectedHash is required")
            changed_between = self._changed_since(head, expected)
            contents = dict(self._contents_at(head))
            changed = set()
            for op in ops:
                kind, body = self._op(op)
                k = _key_str(body["key"])
                if k in changed_between:
                    raise NessieError(
                        409,
                        f"key '{k}' changed after the expected "
                        f"hash {expected[:16]}",
                    )
                if kind == "Unchanged":
                    continue  # a guard op: conflict-checked above,
                    # never mutates
                if kind == "Put":
                    content = dict(body["content"])
                    ctype = content.get("type", "ICEBERG_TABLE")
                    if ctype not in ("ICEBERG_TABLE", "NAMESPACE"):
                        raise NessieError(
                            400,
                            f"unsupported content type {ctype!r} "
                            "(ICEBERG_TABLE or NAMESPACE)",
                        )
                    if ctype == "ICEBERG_TABLE" and \
                            not content.get("metadataLocation"):
                        raise NessieError(
                            400,
                            f"ICEBERG_TABLE content for '{k}' "
                            "requires metadataLocation",
                        )
                    prev = contents.get(k)
                    if prev is not None and "id" in prev:
                        if content.get("id", prev["id"]) != prev["id"]:
                            raise NessieError(
                                409,
                                f"content id mismatch for '{k}'",
                            )
                        content["id"] = prev["id"]
                    else:
                        content.setdefault("id", str(uuid.uuid4()))
                    contents[k] = content
                elif kind == "Delete":
                    if k not in contents:
                        raise NessieError(
                            409, f"key '{k}' does not exist"
                        )
                    del contents[k]
                else:
                    raise NessieError(
                        400, f"unsupported operation {kind}"
                    )
                changed.add(k)
            if not changed:
                raise NessieError(
                    400, "commit carries no Put/Delete operations"
                )
            new = _Commit(
                hash=_khash((head,), contents, meta),
                parents=(head,),
                contents=contents,
                meta=meta,
            )
            self.commits[new.hash] = new
            self.branches[branch] = new.hash
            return self._ref_json(branch)

    def merge(
        self, branch: str, expected: str, from_name: str,
        from_hash: str | None,
    ) -> dict:
        """Three-way merge ``from`` into ``branch``: keys changed on
        both sides since the merge base conflict unless both sides
        landed on the same content."""
        with self.lock:
            self._require_branch(branch, "a merge")
            _, head = self._resolve(branch)
            if expected and expected != head:
                raise NessieError(
                    409,
                    f"expected hash {expected} but '{branch}' is at "
                    f"{head}",
                )
            _, src = self._resolve(
                f"{from_name}@{from_hash}" if from_hash else from_name
            )
            base = self._merge_base(head, src)
            if src == base:  # nothing to merge
                return self._ref_json(branch)
            src_changed = self._changed_since(src, base)
            tgt_changed = self._changed_since(head, base)
            contents = dict(self._contents_at(head))
            src_contents = self._contents_at(src)
            for k in src_changed:
                new_val = src_contents.get(k)
                if k in tgt_changed:
                    if contents.get(k) == new_val:
                        continue  # both sides converged
                    raise NessieError(
                        409,
                        f"key '{k}' changed on both '{branch}' and "
                        f"'{from_name}' since merge base "
                        f"{base[:16]}",
                    )
                if new_val is None:
                    contents.pop(k, None)
                else:
                    contents[k] = new_val
            meta = {
                "message": f"merge {from_name} into {branch}",
                "mergeBase": base,
            }
            new = _Commit(
                hash=_khash((head, src), contents, meta),
                parents=(head, src),
                contents=contents,
                meta=meta,
            )
            self.commits[new.hash] = new
            self.branches[branch] = new.hash
            return {
                "resultType": "MERGE",
                "sourceRef": from_name,
                "effectiveTargetHash": new.hash,
                "expectedHash": head,
                "commonAncestor": base,
            }

    # ------------------------------------------------------- helpers

    @staticmethod
    def _op(op: dict) -> tuple[str, dict]:
        for kind in ("Put", "Delete", "Unchanged"):
            if kind in op:
                return kind, op[kind]
        t = op.get("type", "").capitalize()
        if t in ("Put", "Delete", "Unchanged"):
            return t, op
        raise NessieError(400, f"unparseable operation: {op}")

    def _ref_json(self, name: str) -> dict:
        return {
            "reference": {
                "type": "TAG" if name in self.tags else "BRANCH",
                "name": name,
                "hash": self._head_of(name),
            }
        }


class NessieCatalogServer:
    """HTTP host for :class:`_Store` — same stdlib shape as
    :class:`server.TrinoWireServer` (threaded, port 0 for tests)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 default_branch: str = "main"):
        self.store = _Store(default_branch)
        store = self.store

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:
                pass

            def _reply(self, payload: dict, status: int = 200) -> None:
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _dispatch(self, method: str) -> None:
                try:
                    self._reply(_route(store, method, self.path,
                                       self._body()))
                except NessieError as e:
                    self._reply(
                        {"status": e.status, "message": e.message},
                        e.status,
                    )
                except Exception as e:  # noqa: BLE001
                    self._reply({"status": 500, "message": str(e)},
                                500)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                if not n:
                    return {}
                return json.loads(self.rfile.read(n) or b"{}")

            def do_GET(self) -> None:  # noqa: N802
                self._dispatch("GET")

            def do_POST(self) -> None:  # noqa: N802
                self._dispatch("POST")

            def do_DELETE(self) -> None:  # noqa: N802
                self._dispatch("DELETE")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}/api/v2"

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


class NessieClient:
    """Thin stdlib client for the v2 surface — what an engine uses
    to resolve table pointers through the catalog (the role Trino's
    ``iceberg.nessie-catalog.uri`` conf plays in the reference).
    Works against :class:`NessieCatalogServer` or any server
    speaking the same subset."""

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    @staticmethod
    def _q(segment: str) -> str:
        """Percent-encode a ref name or table key for the path: a
        branch like ``feature/x`` (the standard git-style ref
        convention) must travel as one path segment, not two."""
        from urllib.parse import quote

        return quote(segment, safe="")

    def _call(self, method: str, path: str, body: dict | None = None):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.base}{path}",
            method=method,
            data=None if body is None else json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            raw = e.read() or b"{}"
            try:
                msg = json.loads(raw).get("message", str(e))
            except ValueError:
                # a proxy / stdlib default handler emitted a
                # non-JSON error page — surface the HTTP status,
                # don't mask it with a JSONDecodeError
                msg = raw.decode(errors="replace")[:200] or str(e)
            raise NessieError(e.code, msg) from None
        except urllib.error.URLError as e:
            raise NessieError(
                503, f"catalog unreachable: {e.reason}"
            ) from None

    # ------------------------------------------------------ reading

    def config(self) -> dict:
        return self._call("GET", "/config")

    def reference(self, ref: str = "main") -> dict:
        return self._call("GET", f"/trees/{self._q(ref)}")["reference"]

    def entries(self, ref: str = "main") -> list[dict]:
        return self._call(
            "GET", f"/trees/{self._q(ref)}/entries"
        )["entries"]

    def content(self, key: str, ref: str = "main") -> dict:
        return self._call(
            "GET", f"/trees/{self._q(ref)}/contents/{self._q(key)}"
        )["content"]

    def metadata_location(self, key: str, ref: str = "main") -> str:
        return self.content(key, ref)["metadataLocation"]

    def diff(self, from_ref: str, to_ref: str) -> list[dict]:
        """Key-level content diff between two refs (added keys have
        ``from=None``, removed have ``to=None``, changed carry
        both)."""
        return self._call(
            "GET",
            f"/trees/{self._q(from_ref)}/diff/{self._q(to_ref)}",
        )["diffs"]

    def load_table(self, spark, key: str, ref: str = "main"):
        """Resolve ``key`` at ``ref`` and open the Iceberg table AT
        the pointed-to metadata file — catalog-consistent reads:
        what the ref's commit published, not whatever is newest on
        disk."""
        from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
            IcebergTable,
        )

        return IcebergTable.from_metadata_file(
            spark, self.metadata_location(key, ref)
        )

    # ----------------------------------------------------- mutating

    def create_branch(self, name: str, source: str = "main",
                      at_hash: str | None = None) -> dict:
        body = {"name": source}
        if at_hash:
            body["hash"] = at_hash
        return self._call(
            "POST", f"/trees?name={self._q(name)}&type=BRANCH", body
        )["reference"]

    def delete_branch(self, name: str, expected_hash: str) -> dict:
        return self._call(
            "DELETE", f"/trees/{self._q(name)}@{expected_hash}"
        )["reference"]

    def create_tag(self, name: str, source: str = "main",
                   at_hash: str | None = None) -> dict:
        """Create an IMMUTABLE reference at ``source`` (optionally a
        specific ancestor hash) — the release-pinning surface: reads
        AT the tag resolve that commit forever; commits targeting it
        are refused by the server."""
        body = {"name": source}
        if at_hash:
            body["hash"] = at_hash
        return self._call(
            "POST", f"/trees?name={self._q(name)}&type=TAG", body
        )["reference"]

    def delete_tag(self, name: str, expected_hash: str) -> dict:
        return self._call(
            "DELETE", f"/trees/{self._q(name)}@{expected_hash}"
        )["reference"]

    def put(self, branch: str, key: str, metadata_location: str,
            message: str = "", expected_hash: str | None = None,
            content_id: str | None = None) -> dict:
        """Publish a table pointer: one optimistic commit. With no
        ``expected_hash`` the current head is used (read-modify-
        write; per-key conflict detection still applies server-side
        to concurrent writers racing between the read and the
        commit)."""
        if expected_hash is None:
            expected_hash = self.reference(branch)["hash"]
        content = {
            "type": "ICEBERG_TABLE",
            "metadataLocation": metadata_location,
        }
        if content_id:
            content["id"] = content_id
        return self._call(
            "POST",
            f"/trees/{self._q(branch)}@{expected_hash}/history/commit",
            {
                "commitMeta": {"message": message or f"put {key}"},
                "operations": [{
                    "Put": {"key": _key_json(key), "content": content}
                }],
            },
        )["reference"]

    def create_namespace(self, branch: str, name: str,
                         expected_hash: str | None = None) -> dict:
        """Publish a NAMESPACE content object at ``name`` (dotted
        elements) — the explicit-namespace surface real Nessie
        exposes; tables under the namespace are plain dotted keys
        either way."""
        if expected_hash is None:
            expected_hash = self.reference(branch)["hash"]
        return self._call(
            "POST",
            f"/trees/{self._q(branch)}@{expected_hash}/history/commit",
            {
                "commitMeta": {"message": f"create namespace {name}"},
                "operations": [{
                    "Put": {
                        "key": _key_json(name),
                        "content": {
                            "type": "NAMESPACE",
                            "elements": name.split("."),
                        },
                    }
                }],
            },
        )["reference"]

    def namespaces(self, ref: str = "main") -> list[str]:
        """Dotted names of NAMESPACE entries at ``ref``."""
        return sorted(
            ".".join(e["key"]["elements"])
            for e in self.entries(ref)
            if e.get("type") == "NAMESPACE"
        )

    def delete_key(self, branch: str, key: str,
                   expected_hash: str | None = None) -> dict:
        if expected_hash is None:
            expected_hash = self.reference(branch)["hash"]
        return self._call(
            "POST",
            f"/trees/{self._q(branch)}@{expected_hash}/history/commit",
            {
                "commitMeta": {"message": f"drop {key}"},
                "operations": [{"Delete": {"key": _key_json(key)}}],
            },
        )["reference"]

    def merge(self, into: str, from_ref: str,
              from_hash: str | None = None) -> dict:
        body: dict = {"fromRefName": from_ref}
        if from_hash:
            body["fromHash"] = from_hash
        return self._call(
            "POST", f"/trees/{self._q(into)}/history/merge", body
        )


def _route(store: _Store, method: str, path: str, body: dict) -> dict:
    u = urlparse(path)
    q = {k: v[0] for k, v in parse_qs(u.query).items()}
    parts = [p for p in u.path.split("/") if p]
    if parts[:2] == ["q", "health"]:
        # Quarkus SmallRye health surface — the exact endpoint the
        # reference's compose healthcheck curls
        # (compose/compose.yaml nessie healthcheck: /q/health)
        return {"status": "UP", "checks": []}
    if parts[:2] != ["api", "v2"]:
        raise NessieError(404, f"unknown path {u.path}")
    rest = parts[2:]
    if rest == ["config"]:
        return {
            "defaultBranch": store.default_branch,
            "minSupportedApiVersion": 2,
            "maxSupportedApiVersion": 2,
            "specVersion": "2.1.0",
        }
    if not rest or rest[0] != "trees":
        raise NessieError(404, f"unknown path {u.path}")
    rest = rest[1:]
    if not rest:
        if method == "GET":
            with store.lock:
                return {"references": [
                    store._ref_json(n)["reference"]
                    for n in sorted({*store.branches, *store.tags})
                ]}
        if method == "POST":
            if not q.get("name"):
                raise NessieError(
                    400, "POST /trees requires a 'name' query param"
                )
            ref_type = q.get("type", "BRANCH").upper()
            if ref_type not in ("BRANCH", "TAG"):
                raise NessieError(
                    400,
                    f"reference type '{ref_type}' not supported "
                    "(BRANCH or TAG)",
                )
            src = body.get("name", store.default_branch)
            return store.create_reference(
                q["name"], src, body.get("hash"), ref_type=ref_type
            )
        raise NessieError(405, f"{method} not supported on /trees")
    ref = rest[0]
    tail = rest[1:]
    if not tail:
        if method == "GET":
            with store.lock:
                name, h = store._resolve(ref)
                rtype = "TAG" if name in store.tags else "BRANCH"
            return {"reference":
                    {"type": rtype, "name": name, "hash": h}}
        if method == "DELETE":
            name, _, expected = unquote(ref).partition("@")
            if not expected:
                raise NessieError(
                    400, "DELETE requires name@expectedHash"
                )
            return store.delete_reference(name, expected)
    if tail == ["entries"] and method == "GET":
        with store.lock:
            _, h = store._resolve(ref)
            contents = store._contents_at(h)
        return {"entries": [
            {"key": _key_json(k),
             "type": v.get("type", "ICEBERG_TABLE")}
            for k, v in sorted(contents.items())
        ]}
    if len(tail) == 2 and tail[0] == "contents" and method == "GET":
        with store.lock:
            name, h = store._resolve(ref)
            rtype = "TAG" if name in store.tags else "BRANCH"
            contents = store._contents_at(h)
        k = unquote(tail[1])
        if k not in contents:
            raise NessieError(404, f"key '{k}' not found")
        return {
            "content": contents[k],
            "effectiveReference":
                {"type": rtype, "name": name, "hash": h},
        }
    if len(tail) == 2 and tail[0] == "diff" and method == "GET":
        # Nessie API v2 GET /trees/{from}/diff/{to}: key-level
        # content diff between any two refs (branch, tag, or
        # name@hash) — what CI uses to review an ETL branch before
        # merge. DiffEntry shape matches Nessie: "from" is the
        # content at the FROM ref (null when added), "to" at the TO
        # ref (null when removed).
        with store.lock:
            f_name, h_from = store._resolve(ref)
            f_type = "TAG" if f_name in store.tags else "BRANCH"
            # NO unquote here: _resolve percent-decodes itself,
            # and double-decoding would mangle a ref whose name
            # legitimately contains an escape after one decode
            t_name, h_to = store._resolve(tail[1])
            t_type = "TAG" if t_name in store.tags else "BRANCH"
            a = store._contents_at(h_from)
            b = store._contents_at(h_to)
        return {
            "diffs": [
                {"key": _key_json(k), "from": a.get(k), "to": b.get(k)}
                for k in sorted({*a, *b})
                if a.get(k) != b.get(k)
            ],
            "effectiveFromReference":
                {"type": f_type, "name": f_name, "hash": h_from},
            "effectiveToReference":
                {"type": t_type, "name": t_name, "hash": h_to},
        }
    if tail == ["history", "commit"] and method == "POST":
        name, _, expected = unquote(ref).partition("@")
        return store.commit(
            name, expected, body.get("operations", []),
            body.get("commitMeta", {}),
        )
    if tail == ["history", "merge"] and method == "POST":
        name, _, expected = unquote(ref).partition("@")
        return store.merge(
            name, expected, body["fromRefName"],
            body.get("fromHash"),
        )
    raise NessieError(404, f"unknown path {u.path}")
