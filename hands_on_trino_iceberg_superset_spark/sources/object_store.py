"""Object-store filesystem profile (reference S9).

The reference wires Trino to MinIO over S3A
(``/root/reference/compose/trino/catalog/iceberg.properties:10-15``:
endpoint, path-style access, credentials; bucket created at
``compose.yaml:89``). Spark reaches the same storage through the
Hadoop S3A connector; this module owns that configuration seam.

The container ships no ``hadoop-aws`` jar, so the AWS-SDK
``S3AFileSystem`` cannot load — but the ``s3a://`` scheme EXECUTES
anyway: ``jvm/src/lakeshine/S3aLiteFileSystem.java`` (compiled into
the repo's plugin jar) implements the Hadoop FileSystem contract
over the raw S3 REST protocol (PUT/GET/HEAD/DELETE, server-side
copy, ListObjectsV2, SigV4 request signing), and
``sources/s3_server.py`` provides the in-process MinIO stand-in
with signature VERIFICATION. ``tests/test_object_store.py`` runs
parquet write -> commit-protocol rename -> partitioned read and a
full inventory query end-to-end under ``s3a://`` URIs with
verification on (unsigned or mis-keyed requests 403); the same
profile pointed at a real MinIO endpoint (default ``impl=None``,
i.e. the stock S3AFileSystem) is the production configuration the
reference stack uses (``iceberg.properties:10-15``); the lite impl
stays an explicit ``impl=LITE_IMPL`` opt-in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: the repo's compiled REST-protocol s3a filesystem (see
#: jvm/src/lakeshine/S3aLiteFileSystem.java) — opt-in via
#: ``s3a_profile(..., impl=LITE_IMPL)``
LITE_IMPL = "lakeshine.S3aLiteFileSystem"

#: hadoop-side keys, mirroring iceberg.properties:10-15
_S3A_KEYS = (
    "fs.s3a.impl",
    "fs.s3a.endpoint",
    "fs.s3a.access.key",
    "fs.s3a.secret.key",
    "fs.s3a.path.style.access",
    "fs.s3a.connection.ssl.enabled",
)


def s3a_profile(
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool = False,
    impl: str | None = None,
) -> dict[str, str]:
    """Spark conf dict for an S3-compatible object store (MinIO
    shape). Pass to ``get_spark(extra_conf=...)`` at startup, or
    apply to a live session with :func:`apply_object_store_profile`.

    ``impl=None`` (default) keeps whatever ``fs.s3a.impl`` the
    deployment provides — the stock S3AFileSystem when hadoop-aws is
    on the classpath. Pass ``LITE_IMPL`` to opt into the repo's
    compiled REST filesystem (no hadoop-aws jar needed); it signs
    every request with SigV4 from the same ``fs.s3a.access.key`` /
    ``fs.s3a.secret.key`` the stock filesystem reads, so it works
    against a credentialed MinIO — requests go unsigned only when
    both keys are empty."""
    out = {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
    }
    if impl is not None:
        out["spark.hadoop.fs.s3a.impl"] = impl
        # FileSystem instances cache per (scheme, authority); tests
        # swap endpoints between sessions, so disable the cache for
        # the lite impl (a real deployment keeps it)
        out["spark.hadoop.fs.s3a.impl.disable.cache"] = "true"
    return out


def apply_object_store_profile(
    spark: SparkSession, profile: dict[str, str]
) -> None:
    """Apply a profile to a LIVE session: ``spark.hadoop.*`` confs
    only take effect at startup through the builder, but the
    underlying Hadoop configuration object — which the S3A filesystem
    actually reads — is mutable at runtime."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for key, value in profile.items():
        if not key.startswith("spark.hadoop."):
            raise ValueError(f"not a hadoop passthrough conf: {key}")
        hconf.set(key[len("spark.hadoop."):], value)


def read_object_store_profile(spark: SparkSession) -> dict[str, str]:
    """Current S3A settings as seen by Hadoop (None values omitted)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    out = {}
    for key in _S3A_KEYS:
        val = hconf.get(key)
        if val is not None:
            out[key] = val
    return out


def mirror_to_object_store(
    spark: SparkSession, local_dir: str, dest_uri: str
) -> int:
    """Upload a local directory tree to an object-store URI THROUGH
    the configured Hadoop filesystem (for ``s3a://`` the signing
    client — every byte crosses the wire as signed PUTs / multipart
    uploads). Returns the number of files copied.

    This is the publish half of the lakehouse loop: Iceberg commits
    are written locally (atomic rename), then the immutable table
    tree ships to the warehouse bucket and the catalog pointer is
    what makes it live — readers resolve metadataLocation and never
    see a partial upload."""
    import os

    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    dst_fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        jvm.java.net.URI.create(dest_uri), conf
    )
    n = 0
    for root, _dirs, names in os.walk(local_dir):
        for name in sorted(names):
            full = os.path.join(root, name)
            rel = os.path.relpath(full, local_dir)
            dst = jvm.org.apache.hadoop.fs.Path(
                f"{dest_uri.rstrip('/')}/{rel}"
            )
            dst_fs.copyFromLocalFile(
                False, True, jvm.org.apache.hadoop.fs.Path(full), dst
            )
            n += 1
    return n


def ensure_lite_fs(spark: SparkSession) -> None:
    """Make ``LITE_IMPL`` loadable in THIS session, whatever conf it
    was started with (the driver's correctness harness uses a
    vanilla session — loaders must self-configure). Idempotent: if
    the class already resolves (session started with the plugin jar
    on ``spark.jars``), this is a no-op; otherwise the repo's jar is
    added to the driver's MutableURLClassLoader, which Spark
    installs as the context classloader and Hadoop's Configuration
    consults for ``fs.*.impl`` lookups. Local-mode scope: on a real
    cluster, ship the jar via ``spark.jars`` at startup instead (the
    executor side of a distributed scan needs it on every node)."""
    import os

    jvm = spark.sparkContext._jvm
    loader = jvm.Thread.currentThread().getContextClassLoader()
    try:
        jvm.java.lang.Class.forName(LITE_IMPL, False, loader)
        return
    except Exception:  # noqa: BLE001 — not loadable yet
        pass
    jar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jvm", "session-alias-catalog.jar",
    )
    loader.addURL(jvm.java.io.File(jar).toURI().toURL())
    jvm.java.lang.Class.forName(LITE_IMPL, True, loader)
