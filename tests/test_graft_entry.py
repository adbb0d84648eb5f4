"""Driver-contract tests for __graft_entry__.py.

The driver calls ``dryrun_multichip(8)`` in a fresh process where the TPU
plugin may have preset the platform and pinned visibility to 1 device
(round-1 failure mode: MULTICHIP_r01.json rc=1).  Reproduce that scenario
exactly: a clean subprocess with NO helpful env vars — dryrun_multichip
itself must force the virtual 8-device CPU platform.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # Strip every override the test harness itself sets so the subprocess
    # sees what the driver's environment would provide.
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "SCD_PLATFORM",
                "SCD_TEST_PLATFORM"):
        env.pop(var, None)
    return env


def test_dryrun_multichip_8_in_clean_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_dryrun_multichip_with_driver_xla_flags():
    env = _clean_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
