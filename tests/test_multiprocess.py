"""Real multi-PROCESS execution (SURVEY.md §5.8 multi-host entry):
multiproc_halo.py spawns 2 jax.distributed processes x 4 CPU devices,
each subset-loading its shards of a streamed fused-halo plan and training
over the shared 8-way mesh with cross-process Gloo collectives; the
driver asserts loss/param parity with the single-process virtual-mesh
run. Slow (~2-4 min: two extra interpreters + compiles on 2 CPUs)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_multiprocess_halo_parity():
    env = dict(os.environ)
    # the driver/workers force their own platform + device counts; drop
    # the conftest's virtual-mesh flags so they don't leak in
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(REPO / "multiproc_halo.py")],
        capture_output=True, text=True, timeout=840, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert '"multiprocess_parity": "ok"' in out.stdout, out.stdout[-2000:]
