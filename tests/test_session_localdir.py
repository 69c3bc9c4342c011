"""Contract tests for session._default_local_dir (r16).

The sandbox's virtio disk write throughput is burst-throttled (measured
in OPTIMIZATION_r16.md: 3-4 MB/s on the first ~100 MB after idle,
recovering to ~250 MB/s), so local-mode shuffle scratch defaults to
tmpfs. These tests pin the resolution order: explicit env override >
tmpfs-when-local > Spark default; non-local masters are never touched.
"""

from __future__ import annotations

import os

import pytest

from dataflow_example_spark.session import _default_local_dir


@pytest.fixture()
def _no_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/scratch/x")
    assert _default_local_dir("local[32]") == "/scratch/x"
    # non-local masters too: an explicit operator choice is honored
    assert _default_local_dir("yarn") == "/scratch/x"


def test_empty_env_disables_tmpfs_default(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "")
    assert _default_local_dir("local[32]") is None


def test_non_local_master_untouched(_no_env):
    assert _default_local_dir("yarn") is None
    assert _default_local_dir("spark://host:7077") is None
    assert _default_local_dir("k8s://https://host") is None


@pytest.mark.skipif(
    not os.path.isdir("/dev/shm"), reason="no tmpfs on this platform"
)
def test_local_master_gets_tmpfs_when_roomy(_no_env):
    got = _default_local_dir("local[4]")
    st = os.statvfs("/dev/shm")
    if st.f_bavail * st.f_frsize >= 8 * 1024**3:
        assert got == "/dev/shm/spark-local"
        assert os.path.isdir(got)
    else:  # RAM-starved box: falls back to Spark's default
        assert got is None
