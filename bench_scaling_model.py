"""Projected multi-chip edges/s scaling efficiency (the >=80% north star).

No multi-chip hardware is reachable from this environment (BASELINE.md),
so the deliverable is a MODEL with measured inputs, each named:

  t_step(f_b)   — measured: per-shard fused-overlap step time vs boundary
                  fraction, from `BHF_SWEEP=... python bench_halo_fused.py`
                  on one real v5e chip (pass the JSONL via --sweep).
  halo bytes    — measured: per-shard, per-peer halo row counts of REAL
                  streamed plans (200M / 500M edge builds) read from the
                  plan directory (--plan, repeatable).
  link model    — v5e ICI: 4 links x 45 GB/s usable/direction (~180 GB/s
                  aggregate per chip; we charge the all_to_all at the
                  per-link bottleneck of its largest pairwise transfer),
                  ~1 us/hop latency. DCN: 25 GB/s per chip egress,
                  ~50 us latency (multi-host). Override with --ici-gbps /
                  --dcn-gbps.
  overlap       — the scheduled-HLO evidence (bench_overlap_hlo.py) that
                  the fused-overlap layer's interior kernel runs between
                  all-to-all-start and -done; exposed collective time is
                  max(0, t_coll - t_interior_window) + epilogue, where
                  the interior window is the kernel share of the step
                  (measured: the non-boundary arms).

Efficiency(ep) = rate_per_chip(ep) / rate_per_chip(1)
              = t_step_1chip(E/ep) / (t_step_shard(E/ep, f_b) + exposed)

with t_step scaling linearly in shard edges at fixed D (the kernel is
HBM-streaming-bound at >90% of roofline, BASELINE.md) — the linearity is
itself checked against the measured 3.2M-edge ep1 vs 1.6M-edge shard0
arms.

`--hlo-check` additionally compiles the real fused-overlap shard_map
train step over an 8-device virtual CPU mesh and sums the all-to-all
operand bytes in the optimized HLO, cross-checking the model's collective
byte accounting against what XLA actually emits.

Output: one JSON line with the efficiency table at ep=2/4/8/16 over
ICI and DCN, overlap on/off, for each plan's REAL boundary statistics.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def plan_boundary_stats(plan_dir: Path) -> dict:
    """Measured halo statistics of a streamed plan: per-shard boundary
    edge counts (fused_bnd files) and per-peer halo row counts (the
    shard intermediates' need_q lists)."""
    man = json.loads((plan_dir / "manifest.json").read_text())
    ep = man["ep"]
    bedges, hrows = [], []
    for p in range(ep):
        fb = plan_dir / f"fused_bnd_p{p}.npz"
        zs = np.load(plan_dir / f"shard_p{p}.npz")
        if fb.exists():
            z = np.load(fb)
            bedges.append(int((np.asarray(z["bw"]) > 0).sum()))
            del z
        else:  # no fused cache: the shard intermediates carry the count
            bedges.append(int(len(zs["bdst"])))
        rows = 0
        for q in range(ep):
            key = f"need_{q}"
            if key in zs.files:
                rows += len(zs[key])
        hrows.append(rows)
        del zs
    e_shard = man["num_edges"] / ep
    return {
        "plan": str(plan_dir), "ep": ep, "num_edges": man["num_edges"],
        "h_max": man["h_max"],
        "boundary_edges_per_shard": bedges,
        "halo_rows_per_shard": hrows,
        "boundary_frac": max(bedges) / e_shard,
        "halo_rows_max": max(hrows),
    }


def load_sweep(path: Path) -> list[dict]:
    rows = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            if "boundary_frac" in r:
                rows.append(r)
    return rows


def fit_step_time(sweep_rows, kind):
    """Linear fit step_ms(boundary_frac) for the 'ov' or 'nonov' arms,
    normalized per shard edge (the arms run a fixed-size shard)."""
    xs, ys, es = [], [], []
    for r in sweep_rows:
        if (" ov" if kind == "ov" else "nonov") in r["arm"]:
            xs.append(r["boundary_frac"])
            ys.append(r["step_ms"])
            es.append(r["edges_per_s"] * r["step_ms"] / 1e3 / 2)  # per-layer shard edges
    if not xs:
        raise SystemExit(f"sweep has no '{kind}' rows")
    a, b = np.polyfit(xs, ys, 1)
    return float(a), float(b), float(np.mean(es))


def hlo_all_to_all_bytes(ep: int = 8) -> dict:
    """Compile the fused-overlap halo train step over a virtual CPU mesh
    and sum all-to-all operand bytes from the optimized HLO."""
    import os
    import re

    os.environ.setdefault("XLA_FLAGS",
                          f"--xla_force_host_platform_device_count={ep}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sldm_gnn_tpu.parallel.halo_fused import plan_halo_fused
    from sldm_gnn_tpu.parallel.halo_model import (
        HaloDims, HaloSageClassifier, build_halo_step_fns, shard_node_array)
    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.train.loop import make_optimizer

    n, deg, d = 16384, 8, 32
    rng = np.random.default_rng(0)
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-64, 65, n * deg), 0, n - 1)
    plan = plan_halo_fused(src, dst, n, ep, banded_k=2)
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    model = HaloSageClassifier(hidden_dims=(d, d), num_classes=3,
                               dims=HaloDims.of(plan), use_pallas=False,
                               fused_ln=True, overlap=True)
    fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan,
                              loss_type="softmax_ce")
    x = jax.device_put(shard_node_array(
        rng.standard_normal((n, d)).astype(np.float32), ep, plan.n_local),
        fns.node_sharding)
    y = jax.device_put(shard_node_array(
        rng.integers(0, 3, n).astype(np.int32), ep, plan.n_local),
        fns.node_sharding)
    m = jax.device_put(shard_node_array(
        np.ones(n, np.float32), ep, plan.n_local), fns.node_sharding)
    state = fns.init(jax.random.PRNGKey(0), x)
    lowered = jax.jit(fns.train_step.__wrapped__ if hasattr(
        fns.train_step, "__wrapped__") else fns.train_step).lower(
        state, x, y, m, jax.random.PRNGKey(1))
    hlo = lowered.compile().as_text()
    total = 0
    count = 0
    for m_ in re.finditer(r"all-to-all[^\n=]*=\s*(\([^)]*\)|\S+)\s", hlo):
        shapes = re.findall(r"(f32|bf16|s32|u32|f16)\[([\d,]*)\]",
                            m_.group(1))
        for dt, dims in shapes:
            sz = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            total += sz * (2 if dt in ("bf16", "f16") else 4)
            count += 1
    # per-chip halo volume the MODEL predicts for this plan: rows sent to
    # every peer, both directions of the layer stack are separate ops
    hm = plan.send_idx.shape[2]
    model_bytes = ep * hm * d * 2  # one exchange, bf16, per chip
    return {"ep": ep, "hlo_all_to_all_ops": count,
            "hlo_all_to_all_bytes_per_chip": total // ep,
            "model_one_exchange_bytes": model_bytes,
            "halo_rows_max": hm}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", type=Path, default=None,
                    help="JSONL from BHF_SWEEP bench_halo_fused run")
    ap.add_argument("--plan", type=Path, action="append", default=[])
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="usable GB/s per ICI link direction (v5e)")
    ap.add_argument("--dcn-gbps", type=float, default=25.0,
                    help="usable GB/s per chip across DCN")
    ap.add_argument("--ici-lat-us", type=float, default=2.0)
    ap.add_argument("--dcn-lat-us", type=float, default=50.0)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hlo-check", action="store_true")
    args = ap.parse_args()

    out = {"model": "edges/s scaling efficiency projection (v5e)",
           "assumptions": {
               "ici_gbps_per_link_dir": args.ici_gbps,
               "dcn_gbps_per_chip": args.dcn_gbps,
               "ici_latency_us": args.ici_lat_us,
               "dcn_latency_us": args.dcn_lat_us,
               "t_step linear in shard edges (HBM-bound kernel, 92.9% "
               "roofline)": True,
           }}

    if args.hlo_check:
        out["hlo_check"] = hlo_all_to_all_bytes()

    plans = [plan_boundary_stats(p) for p in args.plan]
    out["plans"] = plans

    if args.sweep:
        rows = load_sweep(args.sweep)
        a_ov, b_ov, e_shard = fit_step_time(rows, "ov")
        a_nv, b_nv, _ = fit_step_time(rows, "nonov")
        out["sweep_fit"] = {
            "shard_edges": e_shard,
            "ov_ms": {"intercept": round(b_ov, 3),
                      "per_frac": round(a_ov, 3)},
            "nonov_ms": {"intercept": round(b_nv, 3),
                         "per_frac": round(a_nv, 3)},
        }

        def project(plan_stats):
            ep_build = plan_stats["ep"]
            fb = plan_stats["boundary_frac"]
            rows_halo = plan_stats["halo_rows_max"]
            table = {}
            for ep in (2, 4, 8, 16):
                # Cut THIS graph ep ways. For range-partitioned locality
                # orders a shard's boundary is its (<=2) borders: the
                # ABSOLUTE boundary edges / halo rows per shard stay
                # ~constant with cut count, so the boundary FRACTION
                # scales with ep while halo bytes per shard do not.
                e_shard_t = plan_stats["num_edges"] / ep
                fb_t = fb * ep / ep_build
                bytes_t = rows_halo * args.dim * 2  # bf16 rows per chip
                # per-shard compute from the sweep fit, rescaled to shard
                # size (the kernel is HBM-streaming-bound -> linear in E).
                # The sweep's scattered rewiring puts every boundary dst
                # in its own row group (m_b ~= steps) — the worst case
                # for the overlap epilogue; real Hilbert/RCM plans
                # cluster boundary dsts at the shard borders (m_b=2-3,
                # fused_manifest m_b_max), where the measured overlap
                # restructure cost is ~1% (BASELINE.md round 4). Report
                # both regimes.
                t_nv = (b_nv + a_nv * fb_t) * (e_shard_t / e_shard)
                t_ov_scat = (b_ov + a_ov * fb_t) * (e_shard_t / e_shard)
                t_ov_clus = 1.01 * t_nv
                t_1 = b_nv * (plan_stats["num_edges"] / e_shard)  # 1 chip
                for net, bw, lat in (("ici", args.ici_gbps * 4,
                                      args.ici_lat_us),
                                     ("dcn", args.dcn_gbps,
                                      args.dcn_lat_us)):
                    # one exchange per layer fwd + transpose in bwd
                    n_coll = 2 * args.layers
                    t_coll = n_coll * (bytes_t / (bw * 1e9) * 1e3
                                       + lat / 1e3)
                    # overlap hides the collective behind the interior
                    # kernel window (scheduled-HLO evidence: all-to-all
                    # start -> interior Mosaic kernel -> done); the
                    # hideable window is the interior-kernel share of
                    # the step (~80%, bench_halo_diag stage shares)
                    row = {}
                    for tag, t_ov in (("clustered", t_ov_clus),
                                      ("scattered", t_ov_scat)):
                        hide = 0.8 * t_ov
                        t_shard_ov = t_ov + max(0.0, t_coll - hide)
                        t_shard_nv = t_nv + t_coll
                        best = min(t_shard_ov, t_shard_nv)
                        row[tag] = {
                            "overlap_eff": round(t_1 / ep / t_shard_ov, 4),
                            "nonoverlap_eff": round(
                                t_1 / ep / t_shard_nv, 4),
                            "best_eff": round(t_1 / ep / best, 4),
                        }
                    row["t_coll_ms"] = round(t_coll, 4)
                    table[f"ep{ep}_{net}"] = row
            return table

        for p in plans:
            p["projection"] = project(p)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
