"""Driver-contract tests for __graft_entry__ (VERDICT round-1 item 10).

The driver invokes ``dryrun_multichip(8)`` in a FRESH process whose jax
exposes a single device (one tunneled TPU chip).  Round 1 failed exactly
there: the function asserted on device_count instead of self-provisioning a
virtual mesh.  These tests reproduce the driver's invocation in a clean
subprocess — no conftest XLA_FLAGS, no pre-forced CPU mesh — so this class
of env-contract regression cannot recur.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.collective

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver sees it: no virtual-device XLA_FLAGS, no PYTHONPATH."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("OMNIMAMBA_DRYRUN_CHILD", None)
    # Strip the conftest-injected host-device-count flag so the parent
    # process sees exactly one device, like the driver env does.
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    # Keep the subprocess off the TPU tunnel: a plain `import jax` here uses
    # CPU (1 device), which still exercises the shortfall -> self-provision
    # path exactly as on the driver's 1-TPU-device env.
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


def test_dryrun_multichip_self_provisions_from_one_device():
    # Exactly the driver's call shape: import the module, call the function.
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_dryrun_cli_entry():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "dryrun", "4"],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_dryrun_parent_never_imports_jax(tmp_path):
    """VERDICT r3 item 1b: the parent hung >30 min initializing the axon
    backend just to count devices. The parent process must now decide from
    the environment alone — poison `import jax` in the parent and verify the
    dryrun still completes (the child is a fresh process and unaffected)."""
    poison = tmp_path / "jax"
    poison.mkdir()
    (poison / "__init__.py").write_text(
        "raise ImportError('dryrun parent must not import jax')\n"
    )
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n" % (str(tmp_path), REPO)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


def test_dryrun_watchdog_fires():
    """A wedged child must produce a clean RuntimeError at the deadline, not
    30 minutes of silence."""
    env = _driver_env()
    env["OMNIMAMBA_DRYRUN_TIMEOUT_S"] = "2"
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__\n"
        "try:\n"
        "    __graft_entry__.dryrun_multichip(2)\n"
        "except RuntimeError as e:\n"
        "    assert 'watchdog' in str(e), e\n"
        "    print('WATCHDOG-OK')\n"
        "else:\n"
        "    raise SystemExit('expected the watchdog to fire')\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "WATCHDOG-OK" in proc.stdout, proc.stdout
