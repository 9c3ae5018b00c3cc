"""bench.py hang guard: the parent forwards the child's JSON line and
fails loud (bounded) when the TPU tunnel never answers."""

import json
import os
import subprocess
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_forwards_child_json(monkeypatch, capsys):
    payload = {"metric": "yolov5s_640_images_per_sec", "value": 4000.0,
               "unit": "img/s", "vs_baseline": 1.48}

    def fake_run(cmd, timeout, capture_output, text):
        assert "--inner" in cmd
        return types.SimpleNamespace(
            returncode=0,
            stdout="some log line\n" + json.dumps(payload) + "\n",
            stderr="",
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.guarded_main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == payload


def test_tunnel_down_emits_error_json(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, timeout, capture_output, text):
        calls.append(cmd)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "INNER_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0)
    rc = bench.guarded_main()
    assert rc == 2
    assert len(calls) == 2
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] is None and "error" in rec


def test_child_failure_then_success(monkeypatch, capsys):
    payload = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0}
    state = {"n": 0}

    def fake_run(cmd, timeout, capture_output, text):
        state["n"] += 1
        if state["n"] == 1:
            return types.SimpleNamespace(returncode=1, stdout="", stderr="boom")
        return types.SimpleNamespace(
            returncode=0, stdout=json.dumps(payload), stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "INNER_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0)
    assert bench.guarded_main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == payload
