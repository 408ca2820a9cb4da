"""pytest plugin: re-exec the test run with a scrubbed environment.

The session environment registers a TPU-tunnel PJRT plugin (axon) from a
``sitecustomize.py`` at interpreter start.  Its remote-compile hook makes
XLA:CPU compiles both pathologically slow and numerically degraded, so tests
must run in a clean interpreter.  Loaded via ``pytest.ini`` ``addopts = -p
gpar_tpu_testenv`` so this hook impl is registered *before*
``pytest_load_initial_conftests`` fires (a conftest-defined impl would
register too late — that's the hook that loads conftests).

Global capture must be suspended before execve: pytest's fd-level capture is
already active, and the child would otherwise inherit the capture temp files
as stdout/stderr and all output would vanish.
"""

import os
import sys

_SCRUB = (
    "PALLAS_AXON_POOL_IPS",
    "PALLAS_AXON_REMOTE_COMPILE",
    "PALLAS_AXON_TPU_GEN",
    "AXON_LOOPBACK_RELAY",
    "AXON_POOL_SVC_OVERRIDE",
)


def pytest_load_initial_conftests(early_config, parser, args):
    if not os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get("_GPAR_TPU_TEST_REEXEC"):
        return
    capman = early_config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    env = dict(os.environ)
    for v in _SCRUB:
        env.pop(v, None)
    env["_GPAR_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
