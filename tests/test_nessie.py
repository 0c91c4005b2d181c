"""Nessie REST catalog server (API v2 subset): reference CRUD,
per-key optimistic commits, three-way merge, and the end-to-end
Iceberg pointer flow the reference stack runs over
``http://nessie:19120/api/v2``."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from hands_on_trino_iceberg_superset_spark.nessie import (
    NO_ANCESTOR,
    NessieCatalogServer,
)


@pytest.fixture()
def srv():
    s = NessieCatalogServer()
    s.start()
    yield s
    s.stop()


def _call(srv, method, path, body=None):
    req = urllib.request.Request(
        f"{srv.url}{path}",
        method=method,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _put(key, location, content_id=None):
    content = {"type": "ICEBERG_TABLE", "metadataLocation": location}
    if content_id:
        content["id"] = content_id
    return {"Put": {"key": {"elements": key.split(".")},
                    "content": content}}


def _commit(srv, branch, expected, ops, msg="c"):
    return _call(
        srv, "POST", f"/trees/{branch}@{expected}/history/commit",
        {"commitMeta": {"message": msg}, "operations": ops},
    )


def test_config_and_empty_tree(srv):
    st, cfg = _call(srv, "GET", "/config")
    assert st == 200 and cfg["defaultBranch"] == "main"
    st, refs = _call(srv, "GET", "/trees")
    assert st == 200
    assert refs["references"] == [
        {"type": "BRANCH", "name": "main", "hash": NO_ANCESTOR}
    ]
    st, main = _call(srv, "GET", "/trees/main")
    assert st == 200 and main["reference"]["hash"] == NO_ANCESTOR


def test_commit_entries_contents_roundtrip(srv):
    st, ref = _commit(srv, "main", NO_ANCESTOR,
                      [_put("demo.orders", "/w/orders/v1.metadata.json")])
    assert st == 200
    h1 = ref["reference"]["hash"]
    assert h1 != NO_ANCESTOR
    st, ents = _call(srv, "GET", "/trees/main/entries")
    assert [e["key"]["elements"] for e in ents["entries"]] == [
        ["demo", "orders"]
    ]
    st, got = _call(srv, "GET", "/trees/main/contents/demo.orders")
    assert st == 200
    assert got["content"]["metadataLocation"].endswith("v1.metadata.json")
    assert got["content"]["id"]  # server assigned a content id
    # reading at the detached old hash still works after more commits
    _commit(srv, "main", h1,
            [_put("demo.events", "/w/events/v1.metadata.json")])
    st, old = _call(srv, "GET", f"/trees/main@{h1}/entries")
    assert len(old["entries"]) == 1


def test_per_key_conflict_rule(srv):
    """A stale expectedHash only conflicts when the intervening
    commits touched the SAME key — Nessie's optimistic rule, not a
    bare head CAS."""
    st, r1 = _commit(srv, "main", NO_ANCESTOR,
                     [_put("a.t1", "/w/t1/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    st, r2 = _commit(srv, "main", h1,
                     [_put("a.t2", "/w/t2/v1.metadata.json")])
    assert st == 200
    # stale expected (h1), different key -> allowed
    st, r3 = _commit(srv, "main", h1,
                     [_put("a.t3", "/w/t3/v1.metadata.json")])
    assert st == 200
    # stale expected (h1), key t2 changed in between -> 409
    st, err = _commit(srv, "main", h1,
                      [_put("a.t2", "/w/t2/v9.metadata.json")])
    assert st == 409 and "a.t2" in err["message"]
    # unknown expected hash -> 409
    st, err = _commit(srv, "main", "f" * 64,
                      [_put("a.t4", "/w/t4/v1.metadata.json")])
    assert st == 409


def test_content_id_is_sticky(srv):
    st, r1 = _commit(srv, "main", NO_ANCESTOR,
                     [_put("a.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    _, got = _call(srv, "GET", "/trees/main/contents/a.t")
    cid = got["content"]["id"]
    # same id (or no id) re-put is fine; a different id is a 409
    st, r2 = _commit(srv, "main", h1,
                     [_put("a.t", "/w/t/v2.metadata.json", cid)])
    assert st == 200
    st, err = _commit(srv, "main", r2["reference"]["hash"],
                      [_put("a.t", "/w/t/v3.metadata.json", "other")])
    assert st == 409 and "id mismatch" in err["message"]


def test_branch_create_merge_and_conflict(srv):
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    st, b = _call(srv, "POST", "/trees?name=etl&type=BRANCH",
                  {"name": "main", "hash": h1})
    assert st == 200 and b["reference"]["hash"] == h1
    # diverge: branch updates d.t, main adds an unrelated key
    _, rb = _commit(srv, "etl", h1,
                    [_put("d.t", "/w/t/v2.metadata.json")])
    _, rm = _commit(srv, "main", h1,
                    [_put("d.u", "/w/u/v1.metadata.json")])
    st, mg = _call(srv, "POST", "/trees/main/history/merge",
                   {"fromRefName": "etl"})
    assert st == 200 and mg["resultType"] == "MERGE"
    _, got = _call(srv, "GET", "/trees/main/contents/d.t")
    assert got["content"]["metadataLocation"].endswith("v2.metadata.json")
    _, got = _call(srv, "GET", "/trees/main/contents/d.u")
    assert st == 200
    # now BOTH sides change d.t -> merge conflicts with 409
    _, mh = _call(srv, "GET", "/trees/main")
    _, bh = _call(srv, "GET", "/trees/etl")
    _commit(srv, "etl", bh["reference"]["hash"],
            [_put("d.t", "/w/t/v3.metadata.json")])
    _commit(srv, "main", mh["reference"]["hash"],
            [_put("d.t", "/w/t/v4.metadata.json")])
    st, err = _call(srv, "POST", "/trees/main/history/merge",
                    {"fromRefName": "etl"})
    assert st == 409 and "d.t" in err["message"]


def test_detached_read_rejects_off_branch_hash(srv):
    """'name@hash' must only serve hashes in that branch's ancestry:
    reading branch A at branch B's hash would silently serve B's
    contents under A's name (real Nessie answers 400)."""
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    # fork BEFORE main advances, then advance each side separately
    _call(srv, "POST", "/trees?name=side", {"name": "main", "hash": h1})
    _, rs = _commit(srv, "side", h1,
                    [_put("d.t", "/w/t/side.metadata.json")])
    side_head = rs["reference"]["hash"]
    # main at side's head: off-ancestry -> 400, not side's contents
    st, err = _call(srv, "GET", f"/trees/main@{side_head}/contents/d.t")
    assert st == 400 and "ancestor" in err["message"]
    # while main at its own commit stays readable
    st, got = _call(srv, "GET", f"/trees/main@{h1}/contents/d.t")
    assert st == 200
    assert got["content"]["metadataLocation"].endswith("v1.metadata.json")


def test_tag_lifecycle_pinned_and_immutable(srv):
    """TAG references, wire level: create at a hash, reads AT the
    tag resolve the pinned state forever, commits/merges targeting
    the tag are 400 (never a silent advance), CAS delete works,
    unknown types still 400."""
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    # create at the explicit hash
    st, tag = _call(srv, "POST", "/trees?name=rel&type=TAG",
                    {"name": "main", "hash": h1})
    assert st == 200 and tag["reference"]["type"] == "TAG"
    assert tag["reference"]["hash"] == h1
    # main advances; the tag stays pinned
    _, r2 = _commit(srv, "main", h1,
                    [_put("d.t", "/w/t/v2.metadata.json")])
    assert r2["reference"]["hash"] != h1
    st, got = _call(srv, "GET", "/trees/rel/contents/d.t")
    assert st == 200
    assert got["content"]["metadataLocation"].endswith(
        "v1.metadata.json")
    assert got["effectiveReference"]["type"] == "TAG"
    st, main_got = _call(srv, "GET", "/trees/main/contents/d.t")
    assert main_got["content"]["metadataLocation"].endswith(
        "v2.metadata.json")
    # a commit targeting the tag is refused, state unchanged
    st, err = _commit(srv, "rel", h1,
                      [_put("d.t", "/w/t/v3.metadata.json")])
    assert st == 400 and "TAG" in err["message"]
    st, still = _call(srv, "GET", "/trees/rel")
    assert still["reference"]["hash"] == h1
    # ...and so is a merge into the tag
    st, err = _call(srv, "POST", "/trees/rel/history/merge",
                    {"fromRefName": "main"})
    assert st == 400 and "TAG" in err["message"]
    # listing shows both reference types
    st, refs = _call(srv, "GET", "/trees")
    types = {r["name"]: r["type"] for r in refs["references"]}
    assert types == {"main": "BRANCH", "rel": "TAG"}
    # name collision across the two namespaces is a 409
    st, _ = _call(srv, "POST", "/trees?name=rel", {"name": "main"})
    assert st == 409
    # CAS delete
    st, _ = _call(srv, "DELETE", "/trees/rel@deadbeef")
    assert st == 409
    st, _ = _call(srv, "DELETE", f"/trees/rel@{h1}")
    assert st == 200
    st, _ = _call(srv, "GET", "/trees/rel")
    assert st == 404
    # unsupported reference types still refuse loudly
    st, err = _call(srv, "POST", "/trees?name=x&type=DETACHED",
                    {"name": "main"})
    assert st == 400 and "DETACHED" in err["message"]


def test_client_tag_surface(srv, spark, tmp_path):
    """NessieClient.create_tag/delete_tag round-trip, including a
    pinned load_table read at the tag."""
    import pyspark.sql.functions as F
    import pytest

    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieClient,
        NessieError,
    )

    cli = NessieClient(srv.url)
    t = IcebergTable.create(
        spark, str(tmp_path / "t"),
        spark.range(1, 11).select(F.col("id")),
    )
    v1 = t.metadata_location
    cli.put("main", "d.t", v1, "v1")
    tag = cli.create_tag("rel-1", source="main")
    assert tag["type"] == "TAG"
    t.append(spark.range(11, 21).select(F.col("id")))
    cli.put("main", "d.t", t.metadata_location, "v2")
    assert cli.load_table(spark, "d.t", ref="rel-1").read().count() == 10
    assert cli.load_table(spark, "d.t", ref="main").read().count() == 20
    with pytest.raises(NessieError) as e:
        cli.put("rel-1", "d.t", v1, "must not land")
    assert e.value.status == 400
    cli.delete_tag("rel-1", tag["hash"])
    with pytest.raises(NessieError):
        cli.reference("rel-1")


def test_branch_delete_cas(srv):
    _, b = _call(srv, "POST", "/trees?name=tmp", {"name": "main"})
    st, err = _call(srv, "DELETE", "/trees/tmp@" + "0" * 64)
    assert st == 409
    st, _ = _call(srv, "DELETE",
                  f"/trees/tmp@{b['reference']['hash']}")
    assert st == 200
    st, err = _call(srv, "GET", "/trees/tmp")
    assert st == 404
    st, err = _call(srv, "DELETE", f"/trees/main@{NO_ANCESTOR}")
    assert st == 400  # default branch is protected


def test_iceberg_pointer_flow_over_http(srv, spark, tmp_path):
    """The reference stack's end-to-end loop: a real Iceberg table in
    the warehouse, the catalog holding only metadataLocation
    pointers; a branch sees new data via its OWN pointer while main
    keeps serving the old snapshot, then the merge publishes it."""
    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )

    path = os.path.join(str(tmp_path), "orders")
    t = IcebergTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ),
    )
    loc_v1 = t.metadata_location
    assert os.path.isfile(loc_v1)
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("demo.orders", loc_v1)], "register")
    h1 = r1["reference"]["hash"]
    _call(srv, "POST", "/trees?name=etl", {"name": "main", "hash": h1})

    # data lands on the branch: append + new pointer on etl only
    t.append(spark.createDataFrame(
        [(i, float(i)) for i in range(10, 25)], "id long, v double"
    ))
    t2 = IcebergTable.load(spark, path)
    assert t2.metadata_location != loc_v1
    _, bh = _call(srv, "GET", "/trees/etl")
    _commit(srv, "etl", bh["reference"]["hash"],
            [_put("demo.orders", t2.metadata_location)], "append")

    def count_via(ref):
        _, got = _call(srv, "GET",
                       f"/trees/{ref}/contents/demo.orders")
        return IcebergTable.from_metadata_file(
            spark, got["content"]["metadataLocation"]
        ).read().count()

    assert count_via("main") == 10   # main still serves v1
    assert count_via("etl") == 25    # branch sees the append
    st, mg = _call(srv, "POST", "/trees/main/history/merge",
                   {"fromRefName": "etl"})
    assert st == 200
    assert count_via("main") == 25   # published atomically


def test_remerge_living_branch(srv):
    """A branch that keeps receiving commits can be merged again and
    again: the merge commit records both parents, so the next merge
    base advances past the previous merge instead of re-conflicting
    on already-published keys."""
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    _call(srv, "POST", "/trees?name=etl", {"name": "main", "hash": h1})
    for v in (2, 3, 4):  # daily publish loop: commit on etl, merge
        _, bh = _call(srv, "GET", "/trees/etl")
        _commit(srv, "etl", bh["reference"]["hash"],
                [_put("d.t", f"/w/t/v{v}.metadata.json")])
        st, mg = _call(srv, "POST", "/trees/main/history/merge",
                       {"fromRefName": "etl"})
        assert st == 200, (v, mg)
        _, got = _call(srv, "GET", "/trees/main/contents/d.t")
        assert got["content"]["metadataLocation"].endswith(
            f"v{v}.metadata.json"
        )


def test_unchanged_op_guards_without_mutating(srv):
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("a.t1", "/w/t1/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    _, r2 = _commit(srv, "main", h1,
                    [_put("a.t1", "/w/t1/v2.metadata.json")])
    # guard on an untouched key passes alongside a Put
    ops = [
        {"Unchanged": {"key": {"elements": ["a", "t2"]}}},
        _put("a.t3", "/w/t3/v1.metadata.json"),
    ]
    st, _ = _call(
        srv, "POST",
        f"/trees/main@{r2['reference']['hash']}/history/commit",
        {"commitMeta": {"message": "c"}, "operations": ops},
    )
    assert st == 200
    # guard on a key that moved since the expected hash -> 409
    ops = [
        {"Unchanged": {"key": {"elements": ["a", "t1"]}}},
        _put("a.t4", "/w/t4/v1.metadata.json"),
    ]
    st, err = _call(
        srv, "POST", f"/trees/main@{h1}/history/commit",
        {"commitMeta": {"message": "c"}, "operations": ops},
    )
    assert st == 409 and "a.t1" in err["message"]


def test_malformed_requests_are_4xx_not_5xx(srv):
    st, err = _call(srv, "POST", "/trees", {})
    assert st == 400
    st, err = _call(srv, "DELETE", "/trees")
    assert st == 405
    st, err = _call(
        srv, "POST", f"/trees/main@{NO_ANCESTOR}/history/commit",
        {"commitMeta": {"message": "c"}, "operations": []},
    )
    assert st == 400  # no-op commit


def test_metadata_location_resolves_foreign_naming(spark, tmp_path):
    """metadata_location must point at the REAL file even when the
    table uses a foreign metadata naming scheme (N.metadata.json or
    0000N-uuid.metadata.json), so catalog pointers never dangle."""
    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )

    path = os.path.join(str(tmp_path), "t")
    IcebergTable.create(
        spark, path,
        spark.createDataFrame([(1,)], "id long"),
    )
    mdir = os.path.join(path, "metadata")
    [own] = [f for f in os.listdir(mdir) if f.endswith(".metadata.json")]
    foreign = own.lstrip("v").zfill(5).replace(
        ".metadata.json", ""
    ) + "-abc.metadata.json"
    os.rename(os.path.join(mdir, own), os.path.join(mdir, foreign))
    t = IcebergTable.load(spark, path)
    assert os.path.isfile(t.metadata_location)
    assert t.metadata_location.endswith(foreign)
    # and a handle opened AT a metadata file echoes that exact file
    t2 = IcebergTable.from_metadata_file(spark, t.metadata_location)
    assert t2.metadata_location == t.metadata_location
    assert t2.read().count() == 1


def test_client_full_lifecycle(srv, spark, tmp_path):
    """NessieClient drives the whole catalog loop the reference's
    Trino conf delegates to its Nessie service: register a table
    pointer, branch, publish an append on the branch, read each
    ref's consistent snapshot through client.load_table, merge, and
    observe conflict semantics surfacing as NessieError."""
    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieClient,
        NessieError,
    )

    c = NessieClient(srv.url)
    assert c.config()["defaultBranch"] == "main"

    path = os.path.join(str(tmp_path), "t")
    t = IcebergTable.create(
        spark, path,
        spark.createDataFrame([(i,) for i in range(5)], "id long"),
    )
    loc_v1 = t.metadata_location
    c.put("main", "demo.t", loc_v1, "register")
    assert [e["key"]["elements"] for e in c.entries()] == [["demo", "t"]]

    c.create_branch("etl")
    t.append(spark.createDataFrame([(9,), (10,)], "id long"))
    t2 = IcebergTable.load(spark, path)
    c.put("etl", "demo.t", t2.metadata_location, "append")

    assert c.load_table(spark, "demo.t", "main").read().count() == 5
    assert c.load_table(spark, "demo.t", "etl").read().count() == 7
    assert c.merge("main", "etl")["resultType"] == "MERGE"
    assert c.load_table(spark, "demo.t", "main").read().count() == 7

    # a re-put of the SAME pointer is a semantic no-op: a later
    # stale-hash commit on the key does NOT conflict with it
    old = c.reference("main")["hash"]
    c.put("main", "demo.t", t2.metadata_location, "same-pointer")
    # ... but a REAL intervening change (pointer moved) conflicts
    c.put("main", "demo.t", loc_v1, "moved")
    with pytest.raises(NessieError) as ei:
        c.put("main", "demo.t", t2.metadata_location,
              expected_hash=old)
    assert ei.value.status == 409

    # delete the key, then the branch (CAS via current head)
    c.delete_key("main", "demo.t")
    assert c.entries() == []
    c.delete_branch("etl", c.reference("etl")["hash"])
    with pytest.raises(NessieError):
        c.reference("etl")


def test_client_encodes_git_style_branch_names(srv):
    """A branch named with the git-style 'team/feature' convention
    must round-trip through the client: path segments are
    percent-encoded so the slash never splits the route."""
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieClient,
    )

    c = NessieClient(srv.url)
    c.create_branch("team/feature")
    assert c.reference("team/feature")["type"] == "BRANCH"
    c.put("team/feature", "demo.t", "/w/t/v1.metadata.json")
    assert c.metadata_location("demo.t", "team/feature").endswith(
        "v1.metadata.json"
    )
    assert c.merge("main", "team/feature")["resultType"] == "MERGE"
    c.delete_branch("team/feature",
                    c.reference("team/feature")["hash"])


def test_client_wraps_non_json_errors(srv):
    """Errors from a non-Nessie endpoint (proxy page, wrong path)
    surface as NessieError, never a JSONDecodeError or raw
    URLError."""
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieClient,
        NessieError,
    )

    # unreachable server -> 503-style NessieError
    dead = NessieClient("http://127.0.0.1:9")
    with pytest.raises(NessieError) as ei:
        dead.config()
    assert ei.value.status == 503


def test_quarkus_health_endpoint(srv):
    # the reference's compose healthcheck curls /q/health at the
    # server root (compose/compose.yaml nessie service)
    base = srv.url.rsplit("/api/v2", 1)[0]
    with urllib.request.urlopen(f"{base}/q/health") as r:
        assert r.status == 200
        assert json.loads(r.read())["status"] == "UP"


def test_namespace_content_roundtrip(srv):
    """NAMESPACE content objects (the explicit-namespace surface):
    created via the client, visible in entries with their type,
    coexisting with a table under the namespace; junk content types
    and tables without a metadataLocation are 400s."""
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieClient,
        NessieError,
    )

    c = NessieClient(srv.url)
    c.create_namespace("main", "demo")
    c.put("main", "demo.t", "/w/t/v1.metadata.json")
    assert c.namespaces() == ["demo"]
    got = c.content("demo")
    assert got["type"] == "NAMESPACE" and got["elements"] == ["demo"]
    kinds = {".".join(e["key"]["elements"]): e["type"]
             for e in c.entries()}
    assert kinds == {"demo": "NAMESPACE", "demo.t": "ICEBERG_TABLE"}

    # junk content type -> 400, not silently stored
    st, err = _commit(srv, "main", c.reference("main")["hash"], [{
        "Put": {"key": {"elements": ["x"]},
                "content": {"type": "DELTA_LAKE_TABLE"}}
    }])
    assert st == 400 and "DELTA_LAKE_TABLE" in err["message"]
    # table content without a metadataLocation -> 400
    st, err = _commit(srv, "main", c.reference("main")["hash"], [{
        "Put": {"key": {"elements": ["y"]},
                "content": {"type": "ICEBERG_TABLE"}}
    }])
    assert st == 400 and "metadataLocation" in err["message"]


def test_detached_read_allows_merged_ancestors(srv):
    """Ancestry is merge-aware: after merging a side branch into
    main, the side branch's commits ARE main's ancestors and detached
    reads at them must serve (the off-branch guard rejects only
    genuinely foreign hashes)."""
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.t", "/w/t/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    _call(srv, "POST", "/trees?name=side", {"name": "main", "hash": h1})
    _, rs = _commit(srv, "side", h1,
                    [_put("d.u", "/w/u/v1.metadata.json")])
    side_head = rs["reference"]["hash"]
    st, _ = _call(srv, "POST", "/trees/main/history/merge",
                  {"fromRefName": "side"})
    assert st == 200
    # the pre-merge side commit is now in main's ancestry
    st, got = _call(srv, "GET",
                    f"/trees/main@{side_head}/contents/d.u")
    assert st == 200
    assert got["content"]["metadataLocation"].endswith("v1.metadata.json")


def test_diff_between_refs(srv):
    """GET /trees/{from}/diff/{to}: added keys carry from=None,
    removed to=None, changed both; identical refs diff empty; tags
    and name@hash refs resolve; unknown refs 404."""
    _, r1 = _commit(srv, "main", NO_ANCESTOR,
                    [_put("d.a", "/w/a/v1.metadata.json")])
    h1 = r1["reference"]["hash"]
    st, _ = _call(srv, "POST", "/trees?name=etl",
                  {"name": "main", "hash": h1})
    assert st == 200
    # on etl: change a, add b; on main: nothing
    _, r2 = _commit(srv, "etl", h1,
                    [_put("d.a", "/w/a/v2.metadata.json"),
                     _put("d.b", "/w/b/v1.metadata.json")])
    st, d = _call(srv, "GET", "/trees/main/diff/etl")
    assert st == 200
    by_key = {".".join(e["key"]["elements"]): e for e in d["diffs"]}
    assert set(by_key) == {"d.a", "d.b"}
    assert by_key["d.a"]["from"]["metadataLocation"].endswith("v1.metadata.json")
    assert by_key["d.a"]["to"]["metadataLocation"].endswith("v2.metadata.json")
    assert by_key["d.b"]["from"] is None
    assert by_key["d.b"]["to"]["metadataLocation"].endswith("v1.metadata.json")
    assert d["effectiveFromReference"]["name"] == "main"
    assert d["effectiveToReference"]["name"] == "etl"
    # reverse direction: b is REMOVED
    st, rev = _call(srv, "GET", "/trees/etl/diff/main")
    rb = {".".join(e["key"]["elements"]): e for e in rev["diffs"]}
    assert rb["d.b"]["to"] is None
    # identical refs -> empty
    st, same = _call(srv, "GET", "/trees/main/diff/main")
    assert st == 200 and same["diffs"] == []
    # at-hash ref on the from side pins the pre-change state
    st, pinned = _call(srv, "GET", f"/trees/etl@{h1}/diff/etl")
    assert st == 200 and len(pinned["diffs"]) == 2
    st, _ = _call(srv, "GET", "/trees/ghost/diff/main")
    assert st == 404
