"""Multi-host (jax.distributed over DCN) dry run: the production encoder on
a 2-process x 4-device CPU mesh must produce archives byte-identical to the
single-process run (SURVEY §2.8 / §7.7 — the reference has no distributed
backend; this validates ours end-to-end without multi-host hardware)."""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multihost():
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "__graft_entry__.py"),
         "dryrun_multihost"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multihost OK" in r.stdout
