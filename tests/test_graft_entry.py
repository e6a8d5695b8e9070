"""Driver-contract test for __graft_entry__.dryrun_multichip.

MULTICHIP_r01 failed because the driver imports the module in a FRESH process
with a scrubbed env and calls dryrun_multichip(8) bare — no XLA_FLAGS, no
platform override. This test reproduces that exact calling convention via a
subprocess so a regression can't hide behind conftest.py's env setup.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH"):
        env.pop(k, None)
    return env


def test_dryrun_multichip_bare_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO,
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "OK" in proc.stdout, proc.stdout
    assert "mesh={'div': 4, 'data': 2}" in proc.stdout, proc.stdout


def test_main_block_routes_to_dryrun():
    """`python __graft_entry__.py` must run the same dryrun_multichip(8) the
    subprocess test above just executed (the expensive part is identical, so
    re-running it under __main__ would double the slowest test for zero new
    coverage — this pins the routing instead)."""
    import ast

    with open(os.path.join(REPO, "__graft_entry__.py")) as f:
        tree = ast.parse(f.read())
    mains = [n for n in tree.body if isinstance(n, ast.If)
             and isinstance(n.test, ast.Compare)
             and getattr(n.test.left, "id", None) == "__name__"]
    assert mains, "no `if __name__ == '__main__'` block"
    calls = [c for n in mains for c in ast.walk(n) if isinstance(c, ast.Call)
             and getattr(c.func, "id", None) == "dryrun_multichip"]
    assert calls and calls[0].args[0].value == 8
