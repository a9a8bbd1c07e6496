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


@pytest.mark.slow
def test_multiprocess_big_mode_tiny_plan(tmp_path):
    """Big mode (--plan DIR): the subset-load worker pattern used at
    config-5 scale, exercised on a tiny streamed plan. Checks the
    cross-worker loss-equality invariant (the replicated psum'd loss
    must agree bit-for-bit across processes)."""
    import numpy as np

    from sldm_gnn_tpu.parallel.streamed import StreamedHaloPlanner

    rng = np.random.default_rng(0)
    n, deg = 4096, 4
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-12, 13, n * deg), 0, n - 1)
    planner = StreamedHaloPlanner(n, 8, tmp_path / "plan", tile=32,
                                  banded_k=2)
    for s in range(0, len(src), 5000):
        planner.consume(src[s:s + 5000], dst[s:s + 5000])
    planner.finalize()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(REPO / "multiproc_halo.py"), "--plan",
         str(tmp_path / "plan"), "2", "2"],
        capture_output=True, text=True, timeout=840, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert '"multiprocess_big": "ok"' in out.stdout, out.stdout[-2000:]


@pytest.mark.slow
def test_multiprocess_midscale_parity():
    """The mid-scale rung (round-4 verdict Weak #4): ~2M edges through the
    SAME 2-process x 4-device worker path, exact loss/param parity with
    the single-process 8-virtual-device run — bridges the toy-scale
    parity proof and the 200M/500M big-mode runs (whose only invariant is
    cross-worker loss equality)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(MPH_N="131072", MPH_DEG="16", MPH_REACH="48",
               MPH_TILE="64")
    out = subprocess.run(
        [sys.executable, str(REPO / "multiproc_halo.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert '"multiprocess_parity": "ok"' in out.stdout, out.stdout[-2000:]
