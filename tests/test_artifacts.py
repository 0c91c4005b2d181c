"""Per-corpus artifact cache: content-token keys + atomic publish
(queries/artifacts.py) — regression tests for the r3 ADVICE findings
(stale reuse after in-place corpus regeneration; builder/reader race
through a marker-file gate)."""

import os

import pytest

from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
    artifact_path,
    corpus_token,
    ensure_artifact,
)


def _fake_table(dirpath, name, content=b"x" * 64):
    p = os.path.join(dirpath, f"{name}.parquet")
    with open(p, "wb") as f:
        f.write(content)
    return p


def test_token_changes_when_corpus_regenerated(tmp_path):
    sf = str(tmp_path)
    p = _fake_table(sf, "documents")
    t1 = corpus_token(sf, "documents")
    assert t1 == corpus_token(sf, "documents")  # stable when unchanged
    # same path, same size, different mtime — the in-place
    # regeneration case the r3 ADVICE flagged
    os.utime(p, ns=(os.stat(p).st_mtime_ns + 7, os.stat(p).st_mtime_ns + 7))
    t2 = corpus_token(sf, "documents")
    assert t2 != t1
    # different content length also changes it
    _fake_table(sf, "documents", b"y" * 128)
    assert corpus_token(sf, "documents") not in (t1, t2)


def test_token_covers_directory_tables(tmp_path):
    sf = str(tmp_path)
    d = tmp_path / "documents.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a" * 10)
    t1 = corpus_token(sf, "documents")
    (d / "part-1.parquet").write_bytes(b"b" * 10)
    assert corpus_token(sf, "documents") != t1


def test_artifact_path_distinct_per_kind(tmp_path):
    sf = str(tmp_path)
    _fake_table(sf, "embeddings")
    a = artifact_path(sf, "ivf_index", "embeddings")
    b = artifact_path(sf, "pq_index", "embeddings")
    assert a != b
    assert os.path.dirname(a) == os.path.dirname(b)


def test_ensure_artifact_builds_once(tmp_path):
    target = str(tmp_path / "artifact")
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "data"), "w") as f:
            f.write("built")

    assert ensure_artifact(target, build) == target
    assert open(os.path.join(target, "data")).read() == "built"
    ensure_artifact(target, build)
    assert len(calls) == 1  # second call reuses, never rebuilds
    # the build temp dir was renamed away, not left behind
    assert os.listdir(str(tmp_path)) == ["artifact"]


def test_ensure_artifact_failed_build_publishes_nothing(tmp_path):
    target = str(tmp_path / "artifact")

    def bad_build(tmp):
        os.makedirs(tmp)  # partial output, then dies
        raise RuntimeError("interrupted")

    with pytest.raises(RuntimeError, match="interrupted"):
        ensure_artifact(target, bad_build)
    assert not os.path.exists(target)  # no half-built adoption
    assert os.listdir(str(tmp_path)) == []  # temp dir cleaned up

    def empty_build(tmp):
        pass  # never writes anything

    with pytest.raises(RuntimeError, match="produced nothing"):
        ensure_artifact(target, empty_build)


def test_ensure_artifact_lost_race_uses_winner(tmp_path):
    target = str(tmp_path / "artifact")

    def racing_build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "data"), "w") as f:
            f.write("loser")
        # a concurrent session publishes first
        os.makedirs(target)
        with open(os.path.join(target, "data"), "w") as f:
            f.write("winner")

    assert ensure_artifact(target, racing_build) == target
    assert open(os.path.join(target, "data")).read() == "winner"
    assert sorted(os.listdir(str(tmp_path))) == ["artifact"]


def test_artifact_path_keyed_by_params(tmp_path):
    """r4 ADVICE: builder hyperparameters are part of the cache key —
    changing a threshold must NOT silently reuse an artifact built
    with the old parameters."""
    sf = str(tmp_path)
    _fake_table(sf, "documents")
    a = artifact_path(sf, "neardup_pairs", "documents",
                      params="threshold=0.4,n=2")
    b = artifact_path(sf, "neardup_pairs", "documents",
                      params="threshold=0.5,n=2")
    c = artifact_path(sf, "neardup_pairs", "documents",
                      params="threshold=0.4,n=2")
    assert a != b
    assert a == c


def test_artifact_root_is_private_and_owned(tmp_path):
    """r4 ADVICE: artifacts live in a per-uid 0700 root (not at
    predictable names in the shared temp dir), and a root owned by
    another uid is refused, never adopted."""
    import stat

    sf = str(tmp_path)
    _fake_table(sf, "documents")
    p = artifact_path(sf, "ivf_index", "documents")
    root = os.path.dirname(p)
    assert str(os.getuid()) in os.path.basename(root)
    st = os.stat(root)
    assert stat.S_IMODE(st.st_mode) == 0o700
    assert st.st_uid == os.getuid()


def test_artifact_root_rejects_symlink_squat(tmp_path, monkeypatch):
    """A symlink pre-planted at the cache-root name must be refused
    outright (lstat, not stat — a link into a victim-owned writable
    dir would pass a follow-symlink uid check)."""
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    victim_dir = tmp_path / "elsewhere"
    victim_dir.mkdir()
    root_name = f"spark_graft_artifacts_{os.getuid()}"
    (tmp_path / root_name).symlink_to(victim_dir)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    _fake_table(sf, "documents")
    with pytest.raises(RuntimeError, match="symlink"):
        artifact_path(sf, "ivf_index", "documents")
