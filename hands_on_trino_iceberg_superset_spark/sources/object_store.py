"""Object-store filesystem profile (reference S9).

The reference wires Trino to MinIO over S3A
(``/root/reference/compose/trino/catalog/iceberg.properties:10-15``:
endpoint, path-style access, credentials; bucket created at
``compose.yaml:89``). Spark reaches the same storage through the
Hadoop S3A connector; this module owns that configuration seam.

The container for this repo ships no ``hadoop-aws`` jar and no S3
stand-in, so the S3A path cannot execute here; what IS testable —
and tested in ``tests/test_object_store.py`` — is the contract
around it: the profile lands in the live session's Hadoop
configuration (the exact mechanism S3A reads), and reads/writes
through explicitly-schemed ``file://`` URIs exercise the same
``FileSystem.get(uri)`` dispatch that routes ``s3a://`` to
``S3AFileSystem`` in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: hadoop-side keys, mirroring iceberg.properties:10-15
_S3A_KEYS = (
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
) -> dict[str, str]:
    """Spark conf dict for an S3-compatible object store (MinIO
    shape). Pass to ``get_spark(extra_conf=...)`` at startup, or
    apply to a live session with :func:`apply_object_store_profile`.
    """
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
    }


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
