"""Elastic supervisor tests (reference: SIGTERM-requeue recovery flow;
here a per-host relaunch-with-resume wrapper, training/supervisor.py)."""

import sys

from unidisc_tpu.training.supervisor import Supervisor, SupervisorPolicy


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def make_sup(codes_runtimes, **policy):
    clock = FakeClock()
    sup = Supervisor(["true"], SupervisorPolicy(**policy),
                     sleep_fn=clock.sleep, clock=clock)
    seq = iter(codes_runtimes)

    def run_child():
        code, runtime = next(seq)
        clock.t += runtime
        return code, runtime
    return sup, run_child


def test_clean_exit_no_restart():
    sup, child = make_sup([(0, 100.0)])
    assert sup.run(child) == 0
    assert [e["event"] for e in sup.events] == ["launch", "clean_exit"]


def test_restarts_until_success():
    sup, child = make_sup([(1, 200.0), (137, 300.0), (0, 50.0)],
                          max_restarts=5)
    assert sup.run(child) == 0
    events = [e["event"] for e in sup.events]
    assert events.count("restart") == 2 and events[-1] == "clean_exit"


def test_crash_loop_exhausts_budget_fast():
    """Short-lived failures count double: a crash loop stops early."""
    sup, child = make_sup([(1, 1.0)] * 20, max_restarts=6,
                          min_healthy_s=60.0, backoff_s=1.0)
    code = sup.run(child)
    assert code == 1
    launches = sum(e["event"] == "launch" for e in sup.events)
    assert launches <= 4  # 6-budget / 2-per-crash = 3 restarts max
    assert sup.events[-1]["event"] == "budget_exhausted"


def test_window_slides():
    """Old restarts age out of the window — long-running jobs with rare
    failures never exhaust the budget."""
    runs = [(1, 4000.0)] * 8 + [(0, 10.0)]  # each failure after 4000s
    sup, child = make_sup(runs, max_restarts=2, window_s=3600.0,
                          min_healthy_s=60.0)
    assert sup.run(child) == 0


def test_backoff_grows_and_resets():
    sup, child = make_sup(
        [(1, 1.0), (1, 1.0), (1, 500.0), (1, 1.0), (0, 10.0)],
        max_restarts=20, backoff_s=5.0, backoff_max_s=40.0,
        min_healthy_s=60.0)
    assert sup.run(child) == 0
    backoffs = [e["backoff_s"] for e in sup.events
                if e["event"] == "restart"]
    assert backoffs[0] == 5.0 and backoffs[1] == 10.0
    # healthy 500s run resets the backoff
    assert backoffs[2] == 5.0


def test_stop_request_ends_supervision():
    sup, _ = make_sup([], max_restarts=5)

    def child():
        sup.request_stop()
        return 143, 10.0
    assert sup.run(child) == 143
    assert sup.events[-1]["event"] == "stopped"


def test_cli_subprocess_roundtrip(tmp_path):
    """Real subprocess path: a script that fails once then succeeds."""
    marker = tmp_path / "ran"
    script = tmp_path / "flaky.py"
    script.write_text(
        "import pathlib, sys\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if m.exists(): sys.exit(0)\n"
        "m.touch(); sys.exit(1)\n")
    sup = Supervisor([sys.executable, str(script)],
                     SupervisorPolicy(backoff_s=0.01, min_healthy_s=0.0),
                     log_path=str(tmp_path / "log.jsonl"))
    assert sup.run() == 0
    assert (tmp_path / "log.jsonl").exists()


def test_sigterm_forwards_to_child(tmp_path):
    """request_stop sends SIGTERM to the live child so it can
    signal-checkpoint (review fix: the stop flag alone left the child
    running forever)."""
    import subprocess
    import threading
    import time

    script = tmp_path / "sleeper.py"
    script.write_text(
        "import signal, sys, time\n"
        "signal.signal(signal.SIGTERM, lambda *a: sys.exit(143))\n"
        "time.sleep(60)\n")
    sup = Supervisor([sys.executable, str(script)],
                     SupervisorPolicy(backoff_s=0.01))

    done = {}

    def run():
        done["code"] = sup.run()

    t = threading.Thread(target=run)
    t.start()
    # wait until the child exists, then request stop
    for _ in range(100):
        if sup._child is not None:
            break
        time.sleep(0.05)
    assert sup._child is not None
    sup.request_stop()
    t.join(timeout=10)
    assert not t.is_alive()
    # 143 = handler ran; -15 = SIGTERM landed before the handler installed.
    # Either way the signal reached the child — the forwarding contract.
    assert done["code"] in (143, -15)
    assert sup.events[-1]["event"] == "stopped"
