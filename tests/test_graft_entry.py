"""Driver-contract tests for __graft_entry__.

The round-1 delivery failure (VERDICT.md "What's missing" #1) was that
`dryrun_multichip(8)` raised in the driver's environment: a fresh process
with the default platform (one real device) and no conftest env. These tests
reproduce that environment exactly — a fresh interpreter with JAX_PLATFORMS /
XLA_FLAGS scrubbed — so the in-pytest virtual-8-device CPU config cannot mask
a regression.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The driver's default environment: no jax platform overrides."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # keep it off any remote accelerator: tests must not race TPU benches on
    # this 1-core box, and the driver contract only requires that the entry
    # bootstraps the multi-device path itself, whatever the local platform is.
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_dryrun_multichip_bootstraps_virtual_devices_like_the_driver():
    # mirrors the driver: python -c "from __graft_entry__ import
    # dryrun_multichip; dryrun_multichip(8)" in a fresh process whose default
    # jax platform exposes ONE device (here: unconfigured CPU = 1 device).
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; "
        f"sys.path.insert(0, {REPO!r}); "
        "from __graft_entry__ import dryrun_multichip; "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "dryrun_multichip(8); "
        "print('DRYRUN_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "DRYRUN_OK" in proc.stdout


def test_entry_compiles_in_fresh_process():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; "
        f"sys.path.insert(0, {REPO!r}); "
        "from __graft_entry__ import entry; "
        "fn, args = entry(); "
        "out = jax.jit(fn)(*args); "
        "print('ENTRY_OK', out.shape)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "ENTRY_OK" in proc.stdout
