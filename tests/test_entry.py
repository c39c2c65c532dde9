"""Driver-contract tests for __graft_entry__.

The round-1 driver run failed (MULTICHIP_r01.json rc=1) because
``dryrun_multichip`` relied on the caller to pick a platform; under the
axon TPU plugin it crashed before any sharding ran.  These tests invoke
the entry function in a FRESH subprocess with no conftest env help, so
a regression shows up here instead of in the driver.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_subprocess_no_env_help():
    # exactly the driver call: import the module, call the function
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_scrubbed_env(),
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(8): ok" in r.stdout, r.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_jax_import():
    # worst case: the caller already imported jax (platform still
    # undecided or even initialized) before invoking the entry point
    code = (
        "import jax\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_scrubbed_env(),
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(8): ok" in r.stdout, r.stdout
