"""The two-run floor-confirmation state machine (VERDICT r5 wrong #4):
deep new bests park in pending_floors_sec and commit only on a second
quiet deep read — at the SLOWER of the two; loaded runs do not destroy
pendings; contrary quiet evidence does."""

import importlib.util
import json
import os

import pytest


@pytest.fixture()
def benchmod(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = tmp_path / "floors.json"
    p.write_text(json.dumps({"config": {}, "floors_sec": {"leg": 20.0}}))
    monkeypatch.setattr(mod, "_FLOORS_PATH", str(p))
    return mod, p


def _state(p):
    d = json.loads(p.read_text())
    return d["floors_sec"], d.get("pending_floors_sec", {})


def test_small_ratchet_commits_immediately(benchmod):
    mod, p = benchmod
    mod._update_floors({"leg": 18.0})  # 0.9x — normal ratchet
    fl, pend = _state(p)
    assert fl["leg"] == 18.0 and pend == {}


def test_deep_jump_parks_then_confirms_at_slower_read(benchmod):
    mod, p = benchmod
    mod._update_floors({"leg": 12.0})  # 0.6x — parked
    fl, pend = _state(p)
    assert fl["leg"] == 20.0 and pend == {"leg": 12.0}
    mod._update_floors({"leg": 13.0})  # second quiet deep read
    fl, pend = _state(p)
    assert fl["leg"] == 13.0 and pend == {}  # SLOWER of the two commits


def test_pending_survives_loaded_runs(benchmod):
    mod, p = benchmod
    mod._update_floors({"leg": 12.0})
    mod._update_floors({})  # fully loaded run: no updates, no quiet reads
    mod._update_floors({}, quiet_best={})  # same, explicit
    fl, pend = _state(p)
    assert fl["leg"] == 20.0 and pend == {"leg": 12.0}
    mod._update_floors({"leg": 12.5})  # eventual confirmation still lands
    fl, pend = _state(p)
    assert fl["leg"] == 12.5 and pend == {}


def test_contrary_quiet_evidence_discards_pending(benchmod):
    mod, p = benchmod
    mod._update_floors({"leg": 12.0})
    # a quiet read far off the pending regime (> pending x tolerance)
    mod._update_floors({}, quiet_best={"leg": 19.5})
    fl, pend = _state(p)
    assert fl["leg"] == 20.0 and pend == {}


def test_new_leg_first_record_commits(benchmod):
    mod, p = benchmod
    mod._update_floors({"newleg": 7.0})
    fl, pend = _state(p)
    assert fl["newleg"] == 7.0 and pend == {}
