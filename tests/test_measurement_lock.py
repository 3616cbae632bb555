"""Measurement-marker coordination between bench.py and the scaling runner.

Both tools produce host-sensitive numbers; the advisory marker file keeps
one from launching 32-way load over the other's control-bracketed run (a
poisoned bracket invalidates the artifact — BASELINE.md §3b). No Spark.
"""

import importlib.util
import os
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rs():
    spec = importlib.util.spec_from_file_location(
        "run_scaling_under_test", os.path.join(REPO, "scripts", "run_scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def marker(rs, tmp_path, monkeypatch):
    path = str(tmp_path / "marker")
    monkeypatch.setattr(rs, "MEASUREMENT_MARKER", path)
    return path


def test_lock_holds_and_releases(rs, marker):
    with rs.measurement_lock():
        assert os.path.exists(marker)
    assert not os.path.exists(marker)


def test_lock_releases_on_error(rs, marker):
    with pytest.raises(RuntimeError):
        with rs.measurement_lock():
            raise RuntimeError("measurement blew up")
    assert not os.path.exists(marker)


def test_stale_marker_ignored(rs, marker):
    open(marker, "w").write("stale")
    old = time.time() - 3000
    os.utime(marker, (old, old))
    t0 = time.time()
    rs.wait_for_quiet(max_wait_secs=5, stale_after_secs=2400)
    assert time.time() - t0 < 1  # did not wait on a crash leftover


def test_fresh_marker_waited_on_until_removed(rs, marker):
    open(marker, "w").write("busy")
    t0 = time.time()
    rs.wait_for_quiet(max_wait_secs=2, stale_after_secs=2400)
    # bounded wait expired without the marker clearing
    assert time.time() - t0 >= 2
    assert os.path.exists(marker)
