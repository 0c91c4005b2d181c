"""Object-store (S9) contract tests: the S3A profile seam and
explicit-scheme URI I/O (the FileSystem dispatch that serves
``s3a://`` in a real deployment; ``file://`` here, since the
container has no hadoop-aws jar or S3 stand-in)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.sources.object_store import (
    LITE_IMPL,
    apply_object_store_profile,
    read_object_store_profile,
    s3a_profile,
)


def test_s3a_profile_reaches_hadoop_conf(spark):
    profile = s3a_profile(
        endpoint="http://minio:9000",      # iceberg.properties:11
        access_key="minioadmin",
        secret_key="minioadmin",
        path_style=True,                   # iceberg.properties:12
    )
    apply_object_store_profile(spark, profile)
    got = read_object_store_profile(spark)
    assert got["fs.s3a.endpoint"] == "http://minio:9000"
    assert got["fs.s3a.path.style.access"] == "true"
    assert got["fs.s3a.connection.ssl.enabled"] == "false"


def test_explicit_scheme_uri_roundtrip(spark, tmp_path):
    """Write + read through fully-qualified file:// URIs — the
    non-default-filesystem code path (URI scheme -> FileSystem
    resolution) that an s3a:// warehouse exercises."""
    uri = f"file://{tmp_path}/warehouse/t1"
    df = spark.range(1, 101).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    df.write.mode("overwrite").partitionBy("g").parquet(uri)
    back = spark.read.parquet(uri)
    assert back.count() == 100
    assert back.where("g = 3").count() == df.where("id % 7 = 3").count()
    # seed + query flow against the explicit-scheme warehouse
    agg = back.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    assert sum(r.n for r in agg.collect()) == 100


def test_engine_seed_against_uri_warehouse(spark, tmp_path):
    """The seeder's tables land under an explicitly-schemed external
    location and query back golden counts (reference S2's
    WITH (location='s3://...') shape, file:// stand-in)."""
    from hands_on_trino_iceberg_superset_spark.seed import seed_frames

    uri = f"file://{tmp_path}/wh"
    frames = seed_frames(spark)
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(f"{uri}/{name}")
    counts = {
        name: spark.read.parquet(f"{uri}/{name}").count()
        for name in frames
    }
    assert counts == {
        "events": 200, "users": 50, "orders": 150,
        "products": 20, "transactions": 300,
    }


def _srv():
    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    # signature verification ON: every e2e test below only passes if
    # the client signs each request with valid SigV4 (the behavior a
    # real credentialed MinIO has; iceberg.properties:13-14)
    s = MiniS3Server(access_key="admin", secret_key="admin12345")
    s.start()
    s.create_bucket("warehouse")
    return s


def test_s3a_parquet_roundtrip_over_rest(spark):
    """The s3a:// scheme EXECUTING end to end: Spark's parquet
    writer (commit-protocol mkdirs/renames included) and partitioned
    reader run against the S3 REST protocol served in-process —
    closing the 'config seam only' gap."""
    srv = _srv()
    try:
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345", impl=LITE_IMPL),
        )
        uri = "s3a://warehouse/t1"
        df = spark.range(1, 101).select(
            F.col("id"), (F.col("id") % 7).alias("g")
        )
        df.write.mode("overwrite").partitionBy("g").parquet(uri)
        back = spark.read.parquet(uri)
        assert back.count() == 100
        assert back.where("g = 3").count() == 14
        assert {r.g for r in back.select("g").distinct().collect()} \
            == set(range(7))
        # overwrite exercises recursive delete + rewrite
        df.where("id <= 10").write.mode("overwrite").parquet(uri)
        assert spark.read.parquet(uri).count() == 10
    finally:
        srv.stop()


def test_s3a_inventory_query_end_to_end(spark):
    """A real inventory query (TPC-H Q1) computed FROM s3a:// —
    lineitem uploaded through the filesystem, the query pointed at
    the bucket, results equal to the local-parquet run."""
    from hands_on_trino_iceberg_superset_spark.queries import load_all
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    srv = _srv()
    try:
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345", impl=LITE_IMPL),
        )
        sf = "/root/testdata/sf0.001"
        load_table(spark, sf, "lineitem").write.mode(
            "overwrite"
        ).parquet("s3a://warehouse/sf/lineitem.parquet")
        inv = load_all()
        got = sorted(
            inv["q1_pricing_summary"].spark(
                spark, "s3a://warehouse/sf"
            ).collect()
        )
        want = sorted(
            inv["q1_pricing_summary"].spark(spark, sf).collect()
        )
        assert got == want and len(got) > 0
    finally:
        srv.stop()


def test_s3a_rejects_bad_credentials(spark):
    """Signature verification has teeth: a wrong secret key (and an
    unsigned raw request) both answer 403, so the green e2e tests
    above prove real signing, not a server that waves auth through."""
    import urllib.error
    import urllib.request

    import pytest

    srv = _srv()
    try:
        # unsigned raw request -> 403 SignatureDoesNotMatch
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(f"{srv.url}/warehouse/?list-type=2")
        assert exc_info.value.code == 403
        assert b"SignatureDoesNotMatch" in exc_info.value.read()

        # signed with the WRONG secret -> every filesystem op fails
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "wrong-secret",
                        impl=LITE_IMPL),
        )
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create("s3a://warehouse/"), hconf
        )
        p = jvm.org.apache.hadoop.fs.Path("s3a://warehouse/x")
        with pytest.raises(Exception) as fs_exc:
            fs.getFileStatus(p)
        assert "403" in str(fs_exc.value)

        # and with the RIGHT secret the same op works (writes, then
        # stats, through the same FileSystem entry points)
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345",
                        impl=LITE_IMPL),
        )
        fs2 = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create("s3a://warehouse/"), hconf
        )
        out = fs2.create(p)
        out.write(bytearray(b"ok"))
        out.close()
        assert fs2.getFileStatus(p).getLen() == 2
    finally:
        srv.stop()


def test_s3a_survives_truncated_listings(spark):
    """Real S3/MinIO cap ListObjectsV2 pages at 1000 keys; with the
    server page size forced to 7, a 25-file directory exercises the
    IsTruncated/NextContinuationToken loop through listStatus,
    rename, and recursive delete — a truncated listing read as
    complete would lose files silently."""
    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    srv = MiniS3Server(page_size=7, access_key="admin",
                       secret_key="admin12345")
    srv.start()
    srv.create_bucket("warehouse")
    try:
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345", impl=LITE_IMPL),
        )
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create("s3a://warehouse/"), hconf
        )

        def path(p):
            return jvm.org.apache.hadoop.fs.Path(p)

        for i in range(25):
            out = fs.create(path(f"s3a://warehouse/d1/f{i:03d}"))
            out.write(bytearray(b"x" * (i + 1)))
            out.close()
        assert len(fs.listStatus(path("s3a://warehouse/d1"))) == 25
        # empty directory deletes non-recursively despite its marker
        fs.mkdirs(path("s3a://warehouse/empty"))
        assert fs.delete(path("s3a://warehouse/empty"), False)
        # prefix rename moves every page
        assert fs.rename(path("s3a://warehouse/d1"),
                         path("s3a://warehouse/d2"))
        assert not fs.exists(path("s3a://warehouse/d1"))
        names = sorted(
            st.getPath().getName()
            for st in fs.listStatus(path("s3a://warehouse/d2"))
        )
        assert names == [f"f{i:03d}" for i in range(25)]
        # recursive delete clears every page
        assert fs.delete(path("s3a://warehouse/d2"), True)
        assert not fs.exists(path("s3a://warehouse/d2"))
    finally:
        srv.stop()


def test_s3a_multipart_upload_for_large_objects(spark):
    """Writes past one part size stream through the multipart
    protocol (initiate / UploadPart / complete) — signed like every
    other request, memory bounded by ONE part, staged parts
    invisible until complete. A 1 KiB part size forces a parquet
    write through many parts; the file must read back identically."""
    srv = _srv()
    try:
        profile = s3a_profile(srv.url, "admin", "admin12345",
                              impl=LITE_IMPL)
        profile["spark.hadoop.fs.s3a.lite.part.size"] = "1024"
        apply_object_store_profile(spark, profile)
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create("s3a://warehouse/"), hconf
        )
        p = jvm.org.apache.hadoop.fs.Path("s3a://warehouse/bigblob")
        payload = bytes((i * 7 + i // 251) % 256
                        for i in range(10_000))  # ~10 parts
        out = fs.create(p)
        # two writes straddling part boundaries + a single-byte tail
        out.write(bytearray(payload[:3000]))
        out.write(bytearray(payload[3000:9999]))
        out.write(payload[9999])
        out.close()
        assert fs.getFileStatus(p).getLen() == len(payload)
        st = fs.open(p)
        got = bytearray()
        while True:
            b = st.read()
            if b == -1:
                break
            got.append(b)
        st.close()
        assert bytes(got) == payload
        # a full parquet table through the multipart path
        uri = "s3a://warehouse/mp"
        df = spark.range(1, 3001).selectExpr(
            "id", "repeat('y', 64) as pad"
        )
        df.write.mode("overwrite").parquet(uri)
        back = spark.read.parquet(uri)
        assert back.count() == 3000
        assert back.selectExpr("sum(id) as s").collect()[0].s == \
            sum(range(1, 3001))
        # small objects still go as one simple PUT (no upload id
        # left behind either way)
        assert not srv._uploads
    finally:
        srv.stop()

def test_iceberg_table_reads_from_s3a_metadata_location(spark):
    """An Iceberg table whose metadataLocation lives on s3a:// is
    readable end to end: metadata JSON and Avro manifests fetch
    through the signing filesystem, absolute-local file_path entries
    re-root onto the bucket, partition pruning still applies, and —
    with the local tree deleted first — every byte provably crossed
    the wire."""
    import os
    import shutil
    import tempfile

    import pytest

    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )
    from hands_on_trino_iceberg_superset_spark.sources.object_store import (
        mirror_to_object_store,
    )

    srv = _srv()
    try:
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345", impl=LITE_IMPL),
        )
        tmp = tempfile.mkdtemp(prefix="ice_s3a_")
        local = os.path.join(tmp, "t")
        df = spark.range(1, 101).selectExpr(
            "id", "case when id % 3 = 0 then 'a' else 'b' end as g"
        )
        t = IcebergTable.create(spark, local, df, partition_by="g")
        meta_name = os.path.basename(t.metadata_location)
        n = mirror_to_object_store(spark, local, "s3a://warehouse/ice_t")
        assert n >= 4  # metadata.json + manifest list + manifest + data
        shutil.rmtree(tmp)

        adopted = IcebergTable.from_metadata_file(
            spark, f"s3a://warehouse/ice_t/metadata/{meta_name}"
        )
        assert adopted.path == "s3a://warehouse/ice_t"
        # pruned planning over the wire: the 'a' partition only
        plan = adopted.plan_scan(filter={"g": "a"})
        assert 0 < len(plan.files) < plan.total_files
        got = adopted.read(filter={"g": "a"})
        assert got.count() == 33
        full = adopted.read()
        assert full.count() == 100
        assert full.selectExpr("sum(id) as s").collect()[0].s == 5050
        # fail-closed: a path that exists on NEITHER store raises
        # rather than silently reading something else
        with pytest.raises(FileNotFoundError):
            adopted._resolve("/nowhere/data/ghost.parquet")
    finally:
        srv.stop()

def test_multipart_complete_rejects_out_of_order_manifest():
    """Real S3 answers InvalidPartOrder when the Complete manifest's
    part numbers are not ascending; the double must refuse too, or a
    buggy client could assemble a scrambled object silently."""
    import urllib.error
    import urllib.request

    import pytest

    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    srv = MiniS3Server()  # unauthenticated: raw-wire protocol test
    srv.start()
    srv.create_bucket("b")
    try:
        def call(method, path, data=None):
            req = urllib.request.Request(
                f"{srv.url}{path}", method=method, data=data)
            with urllib.request.urlopen(req) as r:
                return r.read()

        out = call("POST", "/b/obj?uploads")
        uid = out.split(b"<UploadId>")[1].split(b"</UploadId>")[0]
        uid = uid.decode()
        call("PUT", f"/b/obj?uploadId={uid}&partNumber=1", b"AAA")
        call("PUT", f"/b/obj?uploadId={uid}&partNumber=2", b"BBB")
        manifest = (
            "<CompleteMultipartUpload>"
            "<Part><PartNumber>2</PartNumber></Part>"
            "<Part><PartNumber>1</PartNumber></Part>"
            "</CompleteMultipartUpload>"
        ).encode()
        with pytest.raises(urllib.error.HTTPError) as e:
            call("POST", f"/b/obj?uploadId={uid}", manifest)
        assert e.value.code == 400
        assert b"InvalidPartOrder" in e.value.read()
        # duplicates are rejected too (strictly ascending, like S3)
        dup = (
            "<CompleteMultipartUpload>"
            "<Part><PartNumber>1</PartNumber></Part>"
            "<Part><PartNumber>1</PartNumber></Part>"
            "<Part><PartNumber>2</PartNumber></Part>"
            "</CompleteMultipartUpload>"
        ).encode()
        with pytest.raises(urllib.error.HTTPError) as e:
            call("POST", f"/b/obj?uploadId={uid}", dup)
        assert e.value.code == 400
        assert b"InvalidPartOrder" in e.value.read()
        # ascending manifest still assembles correctly
        good = (
            "<CompleteMultipartUpload>"
            "<Part><PartNumber>1</PartNumber></Part>"
            "<Part><PartNumber>2</PartNumber></Part>"
            "</CompleteMultipartUpload>"
        ).encode()
        call("POST", f"/b/obj?uploadId={uid}", good)
        assert call("GET", "/b/obj") == b"AAABBB"
    finally:
        srv.stop()

def test_s3a_signed_keys_with_spaces_and_plus(spark):
    """Keys and listing prefixes containing spaces, '+', and other
    query-hostile characters must survive SIGNED mode: the client's
    SigV4 UriEncode makes the raw wire bytes the canonical form, so
    a spec-canonicalizing verifier accepts them (the URLEncoder '+'
    form used to sign cleanly against the in-repo server but 403 on
    real MinIO)."""
    srv = _srv()
    try:
        apply_object_store_profile(
            spark,
            s3a_profile(srv.url, "admin", "admin12345", impl=LITE_IMPL),
        )
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create("s3a://warehouse/"), hconf
        )

        def path(p):
            return jvm.org.apache.hadoop.fs.Path(p)

        names = ["a b/c+d.txt", "a b/e f*.txt", "a b/g~h.txt"]
        for i, name in enumerate(names):
            out = fs.create(path(f"s3a://warehouse/{name}"))
            out.write(bytearray(b"v" * (i + 1)))
            out.close()
        # listing under the space-bearing prefix signs and pages
        got = sorted(
            st.getPath().getName()
            for st in fs.listStatus(path("s3a://warehouse/a b"))
        )
        assert got == sorted(n.split("/")[1] for n in names)
        # ranged read + status on the '+' key
        st = fs.getFileStatus(path("s3a://warehouse/a b/c+d.txt"))
        assert st.getLen() == 1
        ins = fs.open(path("s3a://warehouse/a b/e f*.txt"))
        assert ins.read() == ord("v")
        ins.close()
        # rename across space-bearing prefixes (server-side copy
        # signs x-amz-copy-source too), then recursive delete
        assert fs.rename(path("s3a://warehouse/a b"),
                         path("s3a://warehouse/x y"))
        assert fs.getFileStatus(
            path("s3a://warehouse/x y/c+d.txt")).getLen() == 1
        assert fs.delete(path("s3a://warehouse/x y"), True)
    finally:
        srv.stop()
