"""The bench.py TPU-tunnel guard: waits for the pidfile'd campaign stage,
then reclaims the tunnel by stopping that exact PID (never a pattern)."""

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def test_wait_returns_immediately_without_pidfile(tmp_path, monkeypatch):
    import bench
    t0 = time.time()
    monkeypatch.setattr(bench, "wait_for_tpu_tunnel", bench.wait_for_tpu_tunnel)
    # no pidfile at the well-known path is the common case on a dev box
    bench.wait_for_tpu_tunnel(timeout_s=0.1)
    assert time.time() - t0 < 5.0


def test_wait_outlasts_short_stage_and_kills_long_stage(tmp_path, monkeypatch):
    import bench

    pidfile = tmp_path / ".tpu_stage.pid"
    # patch the well-known path by running the loop body against a fake stage
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    pidfile.write_text(str(proc.pid))

    real_open = open

    def fake_open(path, *a, **k):
        if str(path).endswith(".tpu_stage.pid"):
            return real_open(pidfile, *a, **k)
        return real_open(path, *a, **k)

    import builtins
    monkeypatch.setattr(builtins, "open", fake_open)
    monkeypatch.setattr(time, "sleep", lambda s: None)  # fast-forward waits
    t0 = time.time()
    bench.wait_for_tpu_tunnel(timeout_s=0.0)  # immediate last-resort path
    # stage must be gone (SIGTERM then SIGKILL)
    deadline = time.time() + 10
    while proc.poll() is None and time.time() < deadline:
        pass
    assert proc.poll() is not None
    assert time.time() - t0 < 30
