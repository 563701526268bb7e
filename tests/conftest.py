import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
#
# Force CPU before any jax import: the environment defaults JAX_PLATFORMS to
# a single tunneled TPU; claiming it from tests would serialize against any
# other process using the chip (minutes of zero-CPU waiting).
# The environment also injects a TPU PJRT plugin into every interpreter via
# PYTHONPATH sitecustomize; once registered it intercepts XLA compilation
# (remote compile through a tunnel) even on the CPU backend, making each jit
# in the tests take minutes of zero-CPU waiting. It cannot be unregistered,
# so re-exec once with a clean environment. pytest capture is disabled in
# pytest.ini (-s) so the child's output reaches the terminal fd.
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
