import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
#
# The environment injects a TPU PJRT plugin into every python interpreter via
# PYTHONPATH sitecustomize and defaults JAX_PLATFORMS to the (single,
# tunneled) TPU. That makes test startup dial the device relay (~1 min of
# zero-CPU waiting) and would serialize tests against any other process using
# the chip. Re-exec once with a clean environment so tests are pure-CPU.
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("GENIE_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["GENIE_TPU_TEST_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    argv = [sys.executable, "-m", "pytest"] + sys.argv[1:]
    os.execve(sys.executable, argv, env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
