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


def _cand(eff, before, after):
    return {
        "scaling_efficiency": eff,
        "host_control": {
            "before": {"mem": {"eff": before}},
            "after": {"mem": {"eff": after}},
        },
    }


def test_gate_raw_pass_with_valid_bracket(rs):
    g = rs.gate(_cand(0.85, 0.7, 0.65))
    assert g["pass"] and g["bracket_valid"] and g["ceiling"] == 0.65


def test_gate_normalized_pass(rs):
    # 0.573 raw over a 0.665 ceiling -> 0.862 normalized (the r2
    # fallback artifact's numbers)
    g = rs.gate(_cand(0.573, 0.665, 0.696))
    assert g["pass"] and g["control_normalized_eff"] >= 0.8


def test_gate_collapsed_bracket_cannot_certify_high_raw(rs):
    # raw 0.861 but the before-control collapsed (BENCH_SCALING_2to8
    # scenario): uncertifiable in BOTH directions
    g = rs.gate(_cand(0.861, 0.029, 0.883))
    assert not g["pass"] and not g["bracket_valid"]
    assert any("bracket invalid" in r for r in g["fail_reasons"])


def test_gate_super_linear_rejected(rs):
    g = rs.gate(_cand(1.73, 0.7, 0.7))
    assert not g["pass"] and not g["bracket_valid"]


def test_gate_unbracketed_artifact_rejected(rs):
    g = rs.gate({"scaling_efficiency": 0.9})
    assert not g["pass"] and not g["bracket_valid"]
    assert any("no control bracket" in r for r in g["fail_reasons"])


def test_gate_valid_bracket_low_eff_fails_but_is_trackable(rs):
    # the hunter's best-so-far tracking keys on bracket_valid & !pass
    g = rs.gate(_cand(0.5, 0.9, 0.9))
    assert not g["pass"] and g["bracket_valid"]


def test_gate_legacy_bracket_shape(rs):
    # round-2 artifacts predate the cpu/mem control split: the bracket
    # sides carry a top-level eff (which WAS the mem control). The gate
    # must read it as the mem ceiling so archived candidates promote.
    cand = {
        "scaling_efficiency": 0.573,
        "host_control": {
            "before": {"wall8": 0.61, "wall32": 0.92, "eff": 0.665},
            "after": {"wall8": 0.6, "wall32": 0.86, "eff": 0.696},
        },
    }
    g = rs.gate(cand)
    assert g["ceiling"] == 0.665
    assert g["pass"] and g["control_normalized_eff"] == 0.862


def test_manual_promote_syncs_top_level_pass(tmp_path):
    # a legacy candidate carries pass:false computed under the raw-only
    # criterion; after gate-based promotion the artifact must not
    # contradict itself (top-level pass == gate pass)
    import json
    import subprocess
    import sys

    cand = {
        "scaling_efficiency": 0.573,
        "pass": False,
        "scaling": {"efficiency": 0.573, "pass": False},
        "host_control": {
            "before": {"eff": 0.665},
            "after": {"eff": 0.696},
        },
    }
    src = tmp_path / "cand.json"
    out = tmp_path / "out.json"
    log = tmp_path / "log.jsonl"
    src.write_text(json.dumps(cand))
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "hunt_scaling_window.py"),
         "--promote", str(src), "--out", str(out), "--log", str(log)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    promoted = json.loads(out.read_text())
    assert promoted["pass"] is True
    assert promoted["gate"]["pass"] is True
    # the raw sub-criterion stays honestly false; only the top-level
    # verdict follows the gate
    assert promoted["scaling"]["pass"] is False
    # audit line written
    assert any(
        json.loads(line)["kind"] == "manual_promote_attempt"
        for line in log.read_text().splitlines()
    )
