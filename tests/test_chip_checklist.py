"""tools/chip_checklist.py glue logic, offline.

The orchestrator runs once per chip return on scarce hardware time; these
tests pin its parsing/ratchet/verdict logic with canned subprocess results
so it cannot crash at the moment it matters."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def cc(monkeypatch, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    spec = importlib.util.spec_from_file_location(
        "chip_checklist", os.path.join(REPO, "tools", "chip_checklist.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Point the record book at a scratch copy so ratchets never touch the
    # committed artifact.
    book = {"sc16-exact": {"best": 28.79e9, "config": {
        "input": "sc16", "pipeline": "fused", "kernel_precision": "exact",
        "antennas": 16, "fft": 1024, "symbols": 101, "mesh": None,
        "sharded_entry": "split", "fuse_estimate": False,
        "cp_where": "host", "cp": 72}},
        "f32-exact": {"best": 25.36e9, "config": {
            "input": "f32", "pipeline": "fused", "kernel_precision": "exact",
            "antennas": 16, "fft": 1024, "symbols": 101, "mesh": None,
            "sharded_entry": "split", "fuse_estimate": False,
            "cp_where": "host", "cp": 72}}}
    mf = tmp_path / "BENCH_MODES.json"
    mf.write_text(json.dumps(book))
    monkeypatch.setattr(mod, "MODES_FILE", str(mf))
    return mod


class _R:
    def __init__(self, stdout="", rc=0):
        self.stdout, self.stderr, self.returncode = stdout, "", rc


def test_last_json_takes_final_line(cc):
    out = 'note: warming\n{"value": 1}\ntrailer\n{"value": 2, "mode": "m"}\n'
    assert cc._last_json(out) == {"value": 2, "mode": "m"}
    with pytest.raises(RuntimeError, match="no JSON line"):
        cc._last_json("nothing here\n")


def test_step_sanity_ratio_and_rc(cc, monkeypatch):
    rec = json.dumps({"value": 29.0e9, "mode": "sc16-exact"})
    monkeypatch.setattr(cc, "_run", lambda cmd, timeout=3600: (_R(rec), 1.0))
    out = {}
    assert cc.step_sanity(out) == 0
    assert out["sanity"]["ratio_vs_best"] == pytest.approx(29.0 / 28.79,
                                                           abs=1e-3)
    # A >20% drop is a nonzero rc (the chip came back wrong).
    rec = json.dumps({"value": 20.0e9, "mode": "sc16-exact"})
    monkeypatch.setattr(cc, "_run", lambda cmd, timeout=3600: (_R(rec), 1.0))
    assert cc.step_sanity({}) == 1


def test_step_ab_verdicts(cc, monkeypatch, capsys):
    for ratio, want in [(1.05, "FLIP"), (1.0, "keep split"),
                        (0.9, "split clearly better")]:
        rec = json.dumps({"whole_vs_split": ratio,
                          "split": {}, "whole": {}})
        monkeypatch.setattr(cc, "_run",
                            lambda cmd, timeout=3600: (_R(rec), 1.0))
        out = {}
        assert cc._step_ab(out, 16) == 0
        assert want in capsys.readouterr().out
        assert out["ab16"]["whole_vs_split"] == ratio
    # Failed probe: nonzero rc, stderr captured, no crash.
    monkeypatch.setattr(cc, "_run",
                        lambda cmd, timeout=3600: (_R("", rc=2), 1.0))
    out = {}
    assert cc._step_ab(out, 64) == 1
    assert out["ab64"]["rc"] == 2


def test_step_modes_skips_default_and_flags_regression(cc, monkeypatch):
    calls = []

    def fake_run(cmd, timeout=3600):
        calls.append(cmd)
        # f32-exact replay comes back regressed >20%.
        return _R(json.dumps({"value": 19.0e9, "mode": "f32-exact"})), 1.0

    monkeypatch.setattr(cc, "_run", fake_run)
    out = {}
    assert cc.step_modes(out) == 1
    # Only the non-default mode is replayed (sanity already did sc16-exact).
    assert len(calls) == 1 and "--input" in calls[0]
    assert out["modes"]["f32-exact"]["ratio_vs_best"] == pytest.approx(
        19.0 / 25.36, abs=1e-3)


def test_main_rejects_unknown_steps(cc, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["chip_checklist", "--steps", "nope"])
    with pytest.raises(SystemExit, match="unknown steps"):
        cc.main()


def test_main_persists_partial_results_per_step(cc, monkeypatch, tmp_path):
    """A step that crashes mid-run must leave earlier steps' results on
    disk (chip may wedge at any point)."""
    outf = tmp_path / "res.json"
    monkeypatch.setattr(sys, "argv",
                        ["chip_checklist", "--steps", "sanity,gate",
                         "--out", str(outf)])
    rec = json.dumps({"value": 29.0e9, "mode": "sc16-exact"})
    monkeypatch.setattr(cc, "_run", lambda cmd, timeout=3600: (_R(rec), 1.0))

    def boom(out):
        raise RuntimeError("wedged")

    monkeypatch.setattr(cc, "step_gate", boom)
    monkeypatch.setattr(cc, "STEPS",
                        [("sanity", cc.step_sanity), ("gate", boom)])
    import bench
    monkeypatch.setattr(bench, "wait_for_device", lambda: True)
    assert cc.main() == 1
    saved = json.loads(outf.read_text())
    assert saved["sanity"]["value"] == 29.0e9
    assert saved["gate"] == {"error": "wedged"}
