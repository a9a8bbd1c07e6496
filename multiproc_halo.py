"""Multi-PROCESS fused-halo training: 2 jax.distributed processes x 4 CPU
devices each, every worker loading ONLY its shard subset of a streamed
config-5-style plan (parallel/streamed.py load_streamed_halo_fused_plan
``shards=...``) and running the fused (overlap) halo train step over the
8-way ('dp','ep') mesh — the actual multi-host code path (per-worker
subset load + cross-process Gloo collectives), not a single-process
virtual mesh. SURVEY.md §5.8 (jax.distributed multi-host entry).

Driver mode (no args): builds a synthetic banded graph + streamed plan,
runs the single-process 8-virtual-device reference (same seeds), spawns
the 2 workers, and asserts loss/param parity. Exit 0 = parity held.

    python multiproc_halo.py            # driver (takes ~2-4 min on 2 CPUs)
    python multiproc_halo.py --worker PID NPROC COORD WORKDIR   # internal

Run by tests/test_multiprocess.py under --runslow.

Big mode (`--plan DIR [NPROC]`): the same 2-process worker pattern over
an EXISTING streamed plan (e.g. the 200M-edge config-5 build) — each
worker subset-loads its half of the shards, generates its node features
per shard from a fixed seed, and runs fused-overlap train steps over the
cross-process mesh. No single-process reference at this scale (the whole
point is that no one process holds the graph); the driver instead
asserts every worker computed the SAME finite losses — the global
psum'd loss is replicated, so cross-worker equality checks the
cross-process collectives end to end.

    python multiproc_halo.py --plan /root/stream_plan_200m 2
"""

import json
import os
import sys
from pathlib import Path

EP = 8
NPROC = 2
STEPS = 3
# driver-mode scale knobs (env): the default is the fast ~2-4 min parity
# run; MPH_N=131072 MPH_DEG=16 is the mid-scale rung (~2M edges) that
# bridges toy-scale parity and the 200M/500M big-mode runs whose only
# invariant is cross-worker loss equality (round-4 verdict Weak #4)
N = int(os.environ.get("MPH_N", 4096))
DEG = int(os.environ.get("MPH_DEG", 4))
REACH = int(os.environ.get("MPH_REACH", 12))
TILE = int(os.environ.get("MPH_TILE", 32))
_H = int(os.environ.get("MPH_HIDDEN", 16))
HIDDEN = (_H, _H)
NCLS = 3
D = int(os.environ.get("MPH_D", 12))
SEED = 0


def _build_inputs(workdir: Path):
    """Graph + streamed plan + node arrays, written to ``workdir``."""
    import numpy as np

    from sldm_gnn_tpu.parallel.streamed import StreamedHaloPlanner

    rng = np.random.default_rng(SEED)
    deg = DEG
    dst = np.repeat(np.arange(N, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-REACH, REACH + 1, N * deg), 0, N - 1)
    planner = StreamedHaloPlanner(N, EP, workdir / "plan", tile=TILE,
                                  banded_k=2)
    for s in range(0, len(src), 5000):
        planner.consume(src[s:s + 5000], dst[s:s + 5000])
    planner.finalize()
    x = rng.standard_normal((N, D)).astype(np.float32)
    y = rng.integers(0, NCLS, N).astype(np.int32)
    np.savez(workdir / "data.npz", x=x, y=y)


def _model_and_plan(plan):
    from sldm_gnn_tpu.parallel.halo_model import HaloDims, HaloSageClassifier

    model = HaloSageClassifier(
        hidden_dims=HIDDEN, num_classes=NCLS, dims=HaloDims.of(plan),
        negative_slope=0.1, use_pallas=False, fused_ln=True, overlap=True)
    return model


def _run_steps(fns, x_stack, y_stack, m_stack, put_repl=None):
    import jax
    import numpy as np

    rng = jax.random.PRNGKey(SEED)
    rng, init_rng = jax.random.split(rng)
    if put_repl is not None:
        init_rng = put_repl(init_rng)
    state = fns.init(init_rng, x_stack)
    losses = []
    for _ in range(STEPS):
        rng, step_rng = jax.random.split(rng)
        if put_repl is not None:
            step_rng = put_repl(step_rng)
        state, m = fns.train_step(state, x_stack, y_stack, m_stack, step_rng)
        losses.append(float(m["loss"]))
    params = [np.asarray(l) for l in
              jax.tree.leaves(jax.device_get(state.params))]
    return losses, params


def _reference(workdir: Path):
    """Single-process 8-virtual-device run (the established baseline)."""
    import numpy as np
    import jax

    from sldm_gnn_tpu.parallel.halo_model import (
        build_halo_step_fns, shard_node_array)
    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.parallel.streamed import load_streamed_halo_fused_plan
    from sldm_gnn_tpu.train.loop import make_optimizer

    plan = load_streamed_halo_fused_plan(workdir / "plan")
    model = _model_and_plan(plan)
    mesh = make_mesh(dp=1, ep=EP, devices=jax.devices()[:EP])
    fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan,
                              loss_type="softmax_ce")
    data = np.load(workdir / "data.npz")
    x_stack = jax.device_put(
        shard_node_array(data["x"], EP, plan.n_local), fns.node_sharding)
    y_stack = jax.device_put(
        shard_node_array(data["y"], EP, plan.n_local), fns.node_sharding)
    m_stack = jax.device_put(
        shard_node_array(np.ones(N, np.float32), EP, plan.n_local),
        fns.node_sharding)
    return _run_steps(fns, x_stack, y_stack, m_stack)


def worker(pid: int, nproc: int, coord: str, workdir: Path):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={EP // nproc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sldm_gnn_tpu.parallel.halo_fused import HaloFusedPlan
    from sldm_gnn_tpu.parallel.halo_model import (
        build_halo_step_fns, shard_node_array)
    from sldm_gnn_tpu.parallel.streamed import load_streamed_halo_fused_plan
    from sldm_gnn_tpu.train.loop import make_optimizer

    devs = jax.devices()
    assert len(devs) == EP, f"expected {EP} global devices, got {len(devs)}"
    mesh = Mesh(np.array(devs).reshape(1, EP), ("dp", "ep"))
    flat = list(np.array(devs).reshape(-1))
    local_shards = [i for i, d in enumerate(flat) if d.process_index == pid]
    assert len(local_shards) == EP // nproc
    ep_sharding = NamedSharding(mesh, P("ep"))  # matches fns.node_sharding

    def global_sharded(a):
        """[len(local_shards), ...] local-stacked -> global [EP, ...]
        Array holding only this worker's shards."""
        a = np.asarray(a)
        gshape = (EP,) + a.shape[1:]
        sds = [jax.device_put(a[pos][None], flat[i])
               for pos, i in enumerate(local_shards)]
        return jax.make_array_from_single_device_arrays(
            gshape, ep_sharding, sds)

    def replicated(a):
        a = np.asarray(a)
        sds = [jax.device_put(a, flat[i]) for i in local_shards]
        return jax.make_array_from_single_device_arrays(
            a.shape, NamedSharding(mesh, P()), sds)

    # THE point: this worker loads ONLY its own shards' layouts (pass A
    # still scans all shards one at a time for the global program floors)
    plan_local = load_streamed_halo_fused_plan(workdir / "plan",
                                               shards=local_shards)
    plan = HaloFusedPlan(
        send_idx=global_sharded(plan_local.send_idx[local_shards]),
        int_fwd=jax.tree.map(global_sharded, plan_local.int_fwd),
        int_rev=jax.tree.map(global_sharded, plan_local.int_rev),
        bnd=jax.tree.map(global_sharded, plan_local.bnd),
        n_local=plan_local.n_local,
        n_pad_local=plan_local.n_pad_local,
    )
    model = _model_and_plan(plan)
    fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan,
                              loss_type="softmax_ce")
    data = np.load(workdir / "data.npz")
    xs = shard_node_array(data["x"], EP, plan.n_local)
    ys = shard_node_array(data["y"], EP, plan.n_local)
    ms = shard_node_array(np.ones(N, np.float32), EP, plan.n_local)
    x_stack = global_sharded(xs[local_shards])
    y_stack = global_sharded(ys[local_shards])
    m_stack = global_sharded(ms[local_shards])

    losses, params = _run_steps(fns, x_stack, y_stack, m_stack,
                                put_repl=replicated)
    out = {"pid": pid, "losses": losses}
    print(json.dumps(out), flush=True)
    if pid == 0:
        np.savez(workdir / "worker0_params.npz",
                 **{f"p{i}": p for i, p in enumerate(params)},
                 losses=np.asarray(losses))
    jax.distributed.shutdown()


def worker_big(pid: int, nproc: int, coord: str, plan_dir: Path,
               steps: int):
    """Subset-load worker over an existing (large) streamed plan."""
    import gc
    import json as _json
    import resource

    man = _json.loads((plan_dir / "manifest.json").read_text())
    ep = man["ep"]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ep // nproc}")
    # bound the XLA fallback's A-upcast transients (see spmm_banded_xla)
    os.environ.setdefault("SLDM_XLA_AGG_CHUNK", "256")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sldm_gnn_tpu.parallel.halo_fused import HaloFusedPlan
    from sldm_gnn_tpu.parallel.halo_model import build_halo_step_fns
    from sldm_gnn_tpu.parallel.streamed import load_streamed_halo_fused_plan
    from sldm_gnn_tpu.train.loop import make_optimizer

    devs = jax.devices()
    assert len(devs) == ep, f"expected {ep} global devices, got {len(devs)}"
    mesh = Mesh(np.array(devs).reshape(1, ep), ("dp", "ep"))
    flat = list(np.array(devs).reshape(-1))
    local_shards = [i for i, d in enumerate(flat) if d.process_index == pid]
    ep_sharding = NamedSharding(mesh, P("ep"))

    def global_sharded(a):
        a = np.asarray(a)
        gshape = (ep,) + a.shape[1:]
        sds = [jax.device_put(a[pos][None], flat[i])
               for pos, i in enumerate(local_shards)]
        return jax.make_array_from_single_device_arrays(
            gshape, ep_sharding, sds)

    def replicated(a):
        a = np.asarray(a)
        sds = [jax.device_put(a, flat[i]) for i in local_shards]
        return jax.make_array_from_single_device_arrays(
            a.shape, NamedSharding(mesh, P()), sds)

    t0 = __import__("time").perf_counter
    t_load0 = t0()
    # Load ONE shard at a time and device_put it before touching the
    # next: the all-at-once path holds every local shard's layouts twice
    # (numpy stacks + the jax copies) at its peak, which at 500M-edge
    # scale is the difference between 4 workers fitting this host or not.
    # Requires the materialized fused cache (fused_manifest.json) so each
    # single-shard load skips pass A; without it fall back to one call.
    per_shard = []
    treedef = None
    statics = None
    if (plan_dir / "fused_manifest.json").exists():
        for pos, i in enumerate(local_shards):
            sp = load_streamed_halo_fused_plan(plan_dir, shards=[i])
            statics = (sp.n_local, sp.n_pad_local)
            tree = (sp.send_idx[[i]], sp.int_fwd, sp.int_rev, sp.bnd)
            leaves, treedef = jax.tree.flatten(tree)
            del sp, tree
            put = []
            for li in range(len(leaves)):
                put.append(jax.device_put(np.asarray(leaves[li]),
                                          flat[local_shards[pos]]))
                leaves[li] = None
            del leaves
            gc.collect()
            per_shard.append(put)
        combined = []
        for li in range(len(per_shard[0])):
            sds = [ps[li] for ps in per_shard]
            gshape = (ep,) + sds[0].shape[1:]
            combined.append(jax.make_array_from_single_device_arrays(
                gshape, ep_sharding, sds))
        del per_shard
        send_g, fwd_g, rev_g, bnd_g = jax.tree.unflatten(treedef, combined)
        n_local = statics[0]
        plan = HaloFusedPlan(send_idx=send_g, int_fwd=fwd_g, int_rev=rev_g,
                             bnd=bnd_g, n_local=statics[0],
                             n_pad_local=statics[1])
    else:
        plan_local = load_streamed_halo_fused_plan(plan_dir,
                                                   shards=local_shards)
        n_local = plan_local.n_local
        plan = HaloFusedPlan(
            send_idx=global_sharded(plan_local.send_idx[local_shards]),
            int_fwd=jax.tree.map(global_sharded, plan_local.int_fwd),
            int_rev=jax.tree.map(global_sharded, plan_local.int_rev),
            bnd=jax.tree.map(global_sharded, plan_local.bnd),
            n_local=plan_local.n_local,
            n_pad_local=plan_local.n_pad_local,
        )
        del plan_local  # free this worker's numpy stacks; jax copies remain
    gc.collect()
    t_load = t0() - t_load0

    def _phase(tag):
        print(json.dumps({"pid": pid, "phase": tag, "rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)}),
            flush=True)

    _phase("loaded")
    model = _model_and_plan(plan)
    fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan,
                              loss_type="softmax_ce")
    # per-SHARD deterministic data: no process ever holds a global array
    xs = np.stack([np.random.default_rng(1000 + i)
                   .standard_normal((n_local, D)).astype(np.float32)
                   for i in local_shards])
    ys = np.stack([np.random.default_rng(2000 + i)
                   .integers(0, NCLS, n_local).astype(np.int32)
                   for i in local_shards])
    ms = np.ones((len(local_shards), n_local), np.float32)
    x_stack = global_sharded(xs)
    y_stack = global_sharded(ys)
    m_stack = global_sharded(ms)
    del xs, ys, ms
    gc.collect()
    _phase("data_ready")

    # Compile-spike serialization: XLA CPU compile of the init/step
    # programs transiently costs tens of GB per process at config-5
    # shapes (measured ~30 GB at 500M, while the compiled step's runtime
    # temp is only ~10 MB/device) — N simultaneous compiles OOM the host
    # even though the steady state fits. Sleeping is NOT an option: the
    # first worker to EXECUTE waits at Gloo context creation, which
    # times out at 30 s. So each worker AOT-compiles (lower().compile(),
    # purely local, no collectives) when it receives a token from its
    # predecessor through the coordination-service KV store, then all
    # workers execute together after a barrier.
    serial_aot = bool(int(os.environ.get("MPH_SERIAL_AOT", "0")))

    t_step0 = t0()
    losses, _ = _run_steps_n(fns, x_stack, y_stack, m_stack, steps,
                             put_repl=replicated, on_step=_phase,
                             serial_aot=(pid, nproc) if serial_aot else None)
    t_steps = t0() - t_step0
    print(json.dumps({
        "pid": pid, "losses": losses,
        "shards": local_shards,
        "load_s": round(t_load, 1),
        "steps_s": round(t_steps, 1),
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
    }), flush=True)
    jax.distributed.shutdown()


def _serial_compile(tag, pid, nproc, compile_fn, on_step):
    """Compile when the predecessor's token arrives (KV store), pass the
    token on, then BARRIER so every worker dispatches the collective-
    bearing execution within Gloo's 30 s context-creation window."""
    from jax._src import distributed

    client = distributed.global_state.client
    timeout_ms = 3_600_000
    if pid > 0:
        client.blocking_key_value_get(f"aot/{tag}/{pid - 1}", timeout_ms)
    if on_step is not None:
        on_step(f"compile_{tag}")
    compiled = compile_fn()
    client.key_value_set(f"aot/{tag}/{pid}", "done")
    if on_step is not None:
        on_step(f"compiled_{tag}")
    client.wait_at_barrier(f"aot_{tag}_barrier", timeout_ms)
    return compiled


def _run_steps_n(fns, x_stack, y_stack, m_stack, steps, put_repl=None,
                 on_step=None, serial_aot=None):
    import jax
    import numpy as np

    rng = jax.random.PRNGKey(SEED)
    rng, init_rng = jax.random.split(rng)
    if put_repl is not None:
        init_rng = put_repl(init_rng)
    if serial_aot is not None:
        pid, nproc = serial_aot
        init_c = _serial_compile(
            "init", pid, nproc,
            lambda: jax.jit(fns.init).lower(init_rng, x_stack).compile(),
            on_step)
        state = init_c(init_rng, x_stack)
    else:
        state = fns.init(init_rng, x_stack)
    if on_step is not None:
        on_step("init")
    losses = []
    step_c = None
    for k in range(steps):
        rng, step_rng = jax.random.split(rng)
        if put_repl is not None:
            step_rng = put_repl(step_rng)
        if k == 0 and serial_aot is not None:
            pid, nproc = serial_aot
            # lower the ARG-passing impl: the convenience wrapper closes
            # over multi-process arrays, which an outer jit cannot capture
            step_c = _serial_compile(
                "step", pid, nproc,
                lambda: fns.train_impl.lower(
                    state, x_stack, y_stack, m_stack, step_rng,
                    *fns.step_extras).compile(),
                on_step)
        if step_c is not None:
            state, m = step_c(state, x_stack, y_stack, m_stack, step_rng,
                              *fns.step_extras)
        else:
            state, m = fns.train_step(state, x_stack, y_stack, m_stack,
                                      step_rng)
        losses.append(float(m["loss"]))
        if on_step is not None:
            on_step(f"step{k}")
    return losses, None


def driver_big(plan_dir: Path, nproc: int, steps: int):
    import socket
    import subprocess

    import numpy as np

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker-big", str(p), str(nproc),
         coord, str(plan_dir), str(steps)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for p in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=int(os.environ.get('MPH_TIMEOUT_S', 5400)))
        outs.append(out.decode())
    reports = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"worker {pid} FAILED rc={p.returncode}\n{out[-6000:]}")
            sys.exit(1)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        reports.append(json.loads(line))
    base = reports[0]["losses"]
    assert np.isfinite(base).all(), base
    for r in reports[1:]:  # replicated psum'd loss: must agree exactly
        assert r["losses"] == base, (base, r["losses"])
    print(json.dumps({
        "multiprocess_big": "ok", "plan": str(plan_dir),
        "processes": nproc, "steps": steps,
        "losses": [round(l, 6) for l in base],
        "workers": [{k: r[k] for k in
                     ("pid", "shards", "load_s", "steps_s", "peak_rss_mb")}
                    for r in reports],
    }))


def driver():
    import socket
    import subprocess
    import tempfile

    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={EP}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        workdir = Path(td)
        _build_inputs(workdir)
        ref_losses, ref_params = _reference(workdir)
        print(f"reference losses (1 process, {EP} devices): "
              f"{[round(l, 6) for l in ref_losses]}", flush=True)

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        coord = f"127.0.0.1:{port}"
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # workers set their own device count
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(p), str(NPROC),
             coord, str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for p in range(NPROC)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode())
        for pid, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                print(f"worker {pid} FAILED rc={p.returncode}\n{out[-4000:]}")
                sys.exit(1)

        w = np.load(workdir / "worker0_params.npz")
        np.testing.assert_allclose(w["losses"], ref_losses, rtol=1e-5,
                                   atol=1e-7)
        for i, rp in enumerate(ref_params):
            np.testing.assert_allclose(w[f"p{i}"], rp, rtol=5e-5, atol=5e-6)
        print(json.dumps({
            "multiprocess_parity": "ok",
            "processes": NPROC, "devices_per_process": EP // NPROC,
            "ep": EP, "steps": STEPS,
            "losses": [round(l, 6) for l in ref_losses],
        }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
               Path(sys.argv[5]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker-big":
        worker_big(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                   Path(sys.argv[5]), int(sys.argv[6]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--plan":
        driver_big(Path(sys.argv[2]),
                   int(sys.argv[3]) if len(sys.argv) > 3 else 2,
                   int(sys.argv[4]) if len(sys.argv) > 4 else 2)
    else:
        driver()
