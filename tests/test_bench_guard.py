"""The bench.py TPU-tunnel guard: waits for the pidfile'd campaign stage,
then reclaims the tunnel by stopping that exact PID (never a pattern).

Every test points wait_for_tpu_tunnel at a tmp_path pidfile so the suite can
never touch a live campaign stage recorded at the real well-known path."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def test_wait_returns_immediately_without_pidfile(tmp_path):
    import bench

    t0 = time.time()
    bench.wait_for_tpu_tunnel(timeout_s=0.1,
                              pidfile=str(tmp_path / ".tpu_stage.pid"))
    assert time.time() - t0 < 5.0


def test_wait_outlasts_short_stage_and_kills_long_stage(tmp_path):
    import bench

    pidfile = tmp_path / ".tpu_stage.pid"
    # the stage sleeps far longer than any deadline below, so "survived"
    # vs "reclaimed" is unambiguous even on a heavily loaded host
    proc = subprocess.Popen([sys.executable, "-c",
                             "import time; time.sleep(600)"])
    pidfile.write_text(str(proc.pid))

    # real (small) poll/grace deadlines instead of monkeypatching time.sleep:
    # the guard SIGTERMs at timeout, polls the grace window, then SIGKILLs
    bench.wait_for_tpu_tunnel(timeout_s=0.0, pidfile=str(pidfile),
                              poll_s=0.05, grace_s=2.0, release_s=0.0)
    try:
        proc.wait(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise AssertionError("stage survived SIGTERM+SIGKILL reclaim")
    assert not pidfile.exists()  # reclaimed record removed


def test_stale_pid_of_foreign_process_is_never_killed(tmp_path):
    """PID reuse: a pidfile pointing at a non-python process must be treated
    as stale — removed, nothing signalled."""
    import bench

    pidfile = tmp_path / ".tpu_stage.pid"
    proc = subprocess.Popen(["sleep", "600"])  # alive but NOT a python stage
    pidfile.write_text(str(proc.pid))
    bench.wait_for_tpu_tunnel(timeout_s=0.0, pidfile=str(pidfile),
                              poll_s=0.05, grace_s=0.5, release_s=0.0)
    assert proc.poll() is None  # untouched
    assert not pidfile.exists()  # stale record cleaned up
    proc.kill()
    proc.wait()


def test_dead_pid_is_cleaned_up_without_error(tmp_path):
    import bench

    pidfile = tmp_path / ".tpu_stage.pid"
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()  # guaranteed dead; PID almost certainly not yet reused
    pidfile.write_text(str(proc.pid))
    bench.wait_for_tpu_tunnel(timeout_s=0.0, pidfile=str(pidfile),
                              poll_s=0.05, grace_s=0.5, release_s=0.0)
    assert not pidfile.exists()
