"""End-to-end CLI integration: build -> train -> test -> stream -> compare
on a synthetic dataset tree (the reference's full workflow, SURVEY.md §3)."""

import json
import os
import threading
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from sldm_gnn_tpu.data.synthetic import make_dataset_tree


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_dataset_tree(root / "data", n_packs=10, frames_num=8, max_vehicles=4,
                      n_map_segments=15, seed=7)
    return root


@pytest.fixture(scope="module")
def built(workspace):
    from sldm_gnn_tpu.cli.build import main as build_main

    r = CliRunner().invoke(
        build_main, [str(workspace / "data"), "-l", "2", "-f", "8", "-r", "30.0"]
    )
    assert r.exit_code == 0, r.output
    return workspace / "data"


@pytest.fixture(scope="module")
def trained(built, workspace):
    from sldm_gnn_tpu.cli.train import main as train_main

    outdir = workspace / "out"
    r = CliRunner().invoke(
        train_main,
        [str(built), str(outdir), "-l", "2", "--include-map", "--epochs", "2", "-y"],
    )
    assert r.exit_code == 0, r.output
    snaps = list(outdir.glob("config*/GRUSAGE_MAP__best_state.pkl"))
    assert snaps, f"no snapshot produced; output:\n{r.output}"
    return snaps[0]


def test_build_outputs(built):
    assert (built / ".map" / "vmap.npz").is_file()
    for split in ("train", "eval", "test"):
        gdir = built / split / ".graphs"
        assert (gdir / "metadata.json").is_file()
        assert list(gdir.glob("pack_*.npz"))


@pytest.mark.slow
def test_train_and_eval_cli(trained, built, workspace):
    from sldm_gnn_tpu.cli.test import main as test_main

    evaldir = workspace / "eval_out"
    r = CliRunner().invoke(
        test_main,
        [str(built / "test"), str(evaldir), "-w", str(trained), "-e", "--match-tol", "10"],
    )
    assert r.exit_code == 0, r.output
    assert (evaldir / "test_pack_metrics.csv").is_file()
    assert (evaldir / "test_event_metrics.csv").is_file()
    df = pd.read_csv(evaldir / "test_pack_metrics.csv")
    assert 0.0 <= df["accuracy"].iloc[0] <= 1.0


def test_test_cli_with_calibration(trained, built, workspace):
    from sldm_gnn_tpu.cli.test import main as test_main

    r = CliRunner().invoke(
        test_main,
        [str(built / "test"), str(workspace / "calib_out"), "-w", str(trained),
         "--calibrate-priors"],
    )
    assert r.exit_code == 0, r.output


def test_streaming_server(trained, built, workspace, tmp_path):
    """Feed JSON frames through a FIFO; expect scores + '.' for empty frames."""
    from sldm_gnn_tpu.serve.stream import StreamingServer

    fifo = tmp_path / "frames.fifo"
    os.mkfifo(fifo)
    out_csv = tmp_path / "scores.csv"
    pack_size = 4

    vinfo = pd.read_parquet(built / "test" / "vinfo.parquet")
    vids = vinfo["VehicleId"].tolist()[:3]
    vrows = vinfo.set_index("VehicleId")

    def frame(t, vids_in_frame):
        return [
            {
                "VehicleId": v,
                "X": 10.0 + 2.0 * t + i,
                "Y": 5.0 + i,
                "Speed": 10.0,
                "Angle": 0.0,
                "Width": float(vrows.loc[v, "Width"]),
                "Length": float(vrows.loc[v, "Length"]),
                "StationType": int(vrows.loc[v, "StationType"]),
            }
            for i, v in enumerate(vids_in_frame)
        ]

    server = StreamingServer(fifo, trained, out_csv, pack_size=pack_size, m_radius=25.0)
    st = threading.Thread(target=server.run)
    st.start()

    n_frames = 7
    with open(fifo, "w") as w:
        for t in range(n_frames):
            vset = [] if t == 5 else vids  # one empty frame mid-stream
            w.write(json.dumps(frame(t, vset)) + "\n")
            w.flush()
    # closing the writer terminates the producer; consumer drains + exits
    st.join(timeout=120)
    assert not st.is_alive()

    lines = out_csv.read_text().strip().split("\n")
    assert lines[0] == "Score"
    scored = lines[1:]
    # windows = n_frames - pack_size + 1 if all consumed before shutdown;
    # at least one window must have been scored
    assert len(scored) >= 1
    for ln in scored:
        assert ln == "." or 0.0 <= float(ln.split(",")[0]) <= 1.0


def test_compare_cli(tmp_path, workspace, built):
    from sldm_gnn_tpu.cli.compare import main as compare_main

    # synthetic predictions aligned with the test split's labels
    labels = pd.read_parquet(built / "test" / "labels.parquet")
    n = len(labels)
    pred_csv = tmp_path / "pred.csv"
    rng = np.random.default_rng(0)
    with open(pred_csv, "w") as f:
        f.write("Score\n")
        for i in range(n):
            if i == 2:
                f.write(".\n")  # empty sample
            else:
                f.write(f"{rng.random():.6f}\n")

    r = CliRunner().invoke(
        compare_main,
        ["--gt-parquet", str(built / "test" / "labels.parquet"),
         "--pred-csv", str(pred_csv), "--active-label", "2",
         "--outdir", str(tmp_path / "cmp"), "-e", "--on-empty", "zero"],
    )
    assert r.exit_code == 0, r.output
    assert (tmp_path / "cmp" / "test_pack_metrics.csv").is_file()


def test_test_cli_with_cut(trained, built, workspace):
    """Eval-time frame truncation (--cut) matches training-time CutFrames."""
    from sldm_gnn_tpu.cli.test import main as test_main

    r = CliRunner().invoke(
        test_main,
        [str(built / "test"), str(workspace / "cut_out"), "-w", str(trained), "--cut", "5"],
    )
    # snapshot was trained on full frames; --cut changes the model's input
    # length, which the GRU handles (scan over fewer steps)
    assert r.exit_code == 0, r.output
    assert (workspace / "cut_out" / "test_pack_metrics.csv").is_file()


def test_streaming_server_consumer_error_propagates(trained, tmp_path):
    """A broken frame schema must terminate the server and raise from run()."""
    from sldm_gnn_tpu.serve.stream import StreamingServer

    fifo = tmp_path / "bad.fifo"
    os.mkfifo(fifo)
    server = StreamingServer(fifo, trained, tmp_path / "o.csv", pack_size=2)
    err = {}

    def run():
        try:
            server.run()
        except Exception as e:
            err["e"] = e

    st = threading.Thread(target=run)
    st.start()
    with open(fifo, "w") as w:
        for t in range(3):  # frames missing Width/Length/StationType
            w.write(json.dumps([{"VehicleId": "v", "X": 1.0, "Y": 1.0,
                                 "Speed": 1.0, "Angle": 0.0}]) + "\n")
            w.flush()
        time.sleep(1.0)  # keep the writer open while the consumer fails
    st.join(timeout=120)
    assert not st.is_alive()
    assert "e" in err, "run() must re-raise the consumer error"


@pytest.mark.slow
def test_train_cli_with_checkpoints_resume(built, workspace):
    """--checkpoints writes per-epoch orbax state; retrying the same config
    dir (crash recovery) restores from the latest step."""
    from sldm_gnn_tpu.cli.train import GRUSAGE_PARAMS_DICT, train_combination
    from sldm_gnn_tpu.data.dataset import GraphDataset
    from sldm_gnn_tpu.train.sweep import ParamSweepContext

    comb = next(iter(ParamSweepContext(GRUSAGE_PARAMS_DICT).combinations()))
    mu_sigma = GraphDataset(built / "train" / ".graphs", normalize_zscore=True).get_mu_sigma()
    cfgdir = workspace / "ckpt_cfg"
    cfgdir.mkdir(exist_ok=True)

    kw = dict(inputdir=built, cfgdir=cfgdir, lbnum=2, cut=None, include_map=False,
              mu_sigma=mu_sigma, quiet=True, epochs_override=2, checkpoints=True)
    state1, _ = train_combination(0, comb, **kw)
    ckpts = list((cfgdir / "ckpt").iterdir())
    assert ckpts, "no checkpoints written"
    assert int(state1.step) > 0

    # retry the same config dir after a COMPLETED run: crash recovery sees
    # all epochs finished (epochs_done extras) and re-trains nothing
    state2, _ = train_combination(0, comb, **kw)
    assert int(state2.step) == int(state1.step)

    # a crash mid-run is modeled by extending the budget: resume restores
    # the saved step and trains only the remaining epoch (step grows)
    kw["epochs_override"] = 3
    state3, _ = train_combination(0, comb, **kw)
    assert int(state3.step) > int(state1.step)


def test_streaming_server_incremental_matches_classic(trained, built, tmp_path):
    """Incremental (O(V²)/frame) server produces the same scores as the
    classic full-rebuild server on an identical stream (incl. warmup
    cadence and vehicle churn)."""
    from sldm_gnn_tpu.serve.stream import StreamingServer

    vinfo = pd.read_parquet(built / "test" / "vinfo.parquet")
    vids = vinfo["VehicleId"].tolist()[:4]
    vrows = vinfo.set_index("VehicleId")

    def frame(t, vids_in_frame):
        return [
            {
                "VehicleId": v,
                "X": 10.0 + 2.0 * t + 3.0 * i,
                "Y": 5.0 + i + 0.5 * t,
                "Speed": 8.0 + i,
                "Angle": 15.0 * t,
                "Width": float(vrows.loc[v, "Width"]),
                "Length": float(vrows.loc[v, "Length"]),
                "StationType": int(vrows.loc[v, "StationType"]),
            }
            for i, v in enumerate(vids_in_frame)
        ]

    n_frames, pack_size = 9, 4
    streams = []
    for t in range(n_frames):
        # churn: vehicle t%4 missing each frame; frame 6 fully empty
        vset = [] if t == 6 else [v for i, v in enumerate(vids) if i != t % 4]
        streams.append(json.dumps(frame(t, vset)) + "\n")

    outputs = {}
    for mode in (False, True):
        fifo = tmp_path / f"frames_{mode}.fifo"
        os.mkfifo(fifo)
        out_csv = tmp_path / f"scores_{mode}.csv"
        server = StreamingServer(
            fifo, trained, out_csv, pack_size=pack_size, m_radius=25.0, incremental=mode
        )
        st = threading.Thread(target=server.run)
        st.start()
        with open(fifo, "w") as w:
            for line in streams:
                w.write(line)
                w.flush()
        st.join(timeout=180)
        assert not st.is_alive()
        outputs[mode] = out_csv.read_text().strip().split("\n")

    classic, incremental = outputs[False], outputs[True]
    assert classic[0] == incremental[0] == "Score"
    assert len(classic) == len(incremental) == 1 + (n_frames - pack_size + 1)
    for a, b in zip(classic[1:], incremental[1:]):
        if a == "." or b == ".":
            assert a == b
        else:
            va = np.array([float(s) for s in a.split(",")])
            vb = np.array([float(s) for s in b.split(",")])
            np.testing.assert_allclose(vb, va, rtol=1e-4, atol=1e-5)


def test_train_cli_dp(built, workspace):
    """--dp 2: the sweep driver trains through the SPMD data-parallel step
    on the virtual mesh and still produces a loadable snapshot."""
    from sldm_gnn_tpu.cli.train import main as train_main
    from sldm_gnn_tpu.train.snapshot import load_snapshot

    outdir = workspace / "out_dp"
    r = CliRunner().invoke(
        train_main,
        [str(built), str(outdir), "-l", "2", "--epochs", "2", "--dp", "2", "-y"],
    )
    assert r.exit_code == 0, r.output
    assert "Data-parallel SPMD over 2 devices" in r.output
    snaps = list(outdir.glob("config*/GRUSAGE__best_state.pkl"))
    assert snaps, f"no snapshot produced; output:\n{r.output}"
    snap = load_snapshot(snaps[0])
    assert snap["params"]


def test_train_cli_dense_batches(built, workspace):
    """--dense-batches: the sweep trains through the scatter-free
    block-diagonal batch layout and produces a loadable snapshot."""
    from sldm_gnn_tpu.cli.train import main as train_main
    from sldm_gnn_tpu.train.snapshot import load_snapshot

    outdir = workspace / "out_dense"
    r = CliRunner().invoke(
        train_main,
        [str(built), str(outdir), "-l", "2", "--epochs", "2",
         "--dense-batches", "-y"],
    )
    assert r.exit_code == 0, r.output
    snaps = list(outdir.glob("config*/GRUSAGE__best_state.pkl"))
    assert snaps, f"no snapshot produced; output:\n{r.output}"
    snap = load_snapshot(snaps[0])
    assert snap["params"]


def test_train_cli_sampled(tmp_path):
    """--sampled: the config-3 neighbor-sampled path end to end from the
    CLI — graph.npz in, trained state + throughput metrics out, learnable
    community structure actually learned."""
    import pickle

    from sldm_gnn_tpu.cli.train import main as train_main

    rng = np.random.default_rng(3)
    n, deg, n_com = 120, 6, 3
    com = np.arange(n) % n_com
    src, dst = [], []
    for i in range(n):
        peers = np.nonzero(com == com[i])[0]
        for p in rng.choice(peers, deg):
            src.append(p)
            dst.append(i)
    x = rng.standard_normal((n, 8)).astype(np.float32) * 0.2
    x += com[:, None] * 1.5
    indir = tmp_path / "in"
    indir.mkdir()
    np.savez(indir / "graph.npz", src=np.array(src), dst=np.array(dst),
             x=x, y=com.astype(np.int64))

    outdir = tmp_path / "out"
    r = CliRunner().invoke(
        train_main,
        [str(indir), str(outdir), "-l", "1", "--sampled", "--fanouts", "4,4",
         "--sampled-batch-size", "32", "--sampled-hidden", "16,16",
         "--sampled-lr", "1e-2", "--sampled-wd", "0.0",
         "--epochs", "25", "-y"],
    )
    assert r.exit_code == 0, r.output
    metrics = json.loads((outdir / "sampled_metrics.json").read_text())
    assert metrics["val_acc"][-1] >= 0.9, metrics["val_acc"]
    assert metrics["seeds_per_s"] > 0 and metrics["sampled_edges_per_s"] > 0
    with open(outdir / "SAMPLED_state.pkl", "rb") as fh:
        state = pickle.load(fh)
    assert state["fanouts"] == [4, 4] and state["num_classes"] == 3
    assert state["params"]


@pytest.mark.slow
def test_train_halo_cli(tmp_path):
    """Multi-chip halo training CLI end to end on the virtual mesh:
    multi-label focal loss, micro-F1 metrics, best snapshot + curves
    written, checkpoint resume continues without error."""
    from sldm_gnn_tpu.cli.train_halo import main as halo_main

    rng = np.random.default_rng(5)
    n, deg, d, L = 96, 4, 8, 2
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-10, 11, n * deg), 0, n - 1)
    x = rng.standard_normal((n, d)).astype(np.float32) * 0.3
    y = np.stack([(x[:, 0] > 0), (x[:, 1] > 0)], axis=1).astype(np.float32)
    indir = tmp_path / "in"
    indir.mkdir()
    np.savez(indir / "graph.npz", src=src, dst=dst, x=x, y=y)

    outdir = tmp_path / "out"
    args = [str(indir), str(outdir), "--ep", "4", "--hidden", "12",
            "--epochs", "15", "--lr", "3e-2", "--loss", "bce",
            "--checkpoint-every", "5", "--banded-k", "2"]
    r = CliRunner().invoke(halo_main, args)
    assert r.exit_code == 0, r.output
    curves = json.loads((outdir / "curves.json").read_text())
    assert len(curves["micro_f1"]) == 15
    assert curves["micro_f1"][-1] > 0.8, curves["micro_f1"]
    assert (outdir / "HALO_best_state.pkl").is_file()
    assert (outdir / "metrics.jsonl").is_file()

    # resume with more epochs: continues from the checkpoint
    args2 = [a if a != "15" else "18" for a in args] + ["--resume"]
    r2 = CliRunner().invoke(halo_main, args2)
    assert r2.exit_code == 0, r2.output
    curves2 = json.loads((outdir / "curves.json").read_text())
    assert len(curves2["micro_f1"]) == 18
    np.testing.assert_allclose(curves2["loss"][:15], curves["loss"],
                               rtol=1e-5)


def test_train_cli_dp_dense_batches(built, workspace):
    """--dp 2 + --dense-batches compose: the aligned batch (incl. its
    [G, vmax, vmax] adjacency) shards over the dp mesh on the graph
    axis like every other [G, ...] leaf."""
    from sldm_gnn_tpu.cli.train import main as train_main
    from sldm_gnn_tpu.train.snapshot import load_snapshot

    outdir = workspace / "out_dp_dense"
    r = CliRunner().invoke(
        train_main,
        [str(built), str(outdir), "-l", "2", "--epochs", "2", "--dp", "2",
         "--dense-batches", "-y"],
    )
    assert r.exit_code == 0, r.output
    snaps = list(outdir.glob("config*/GRUSAGE__best_state.pkl"))
    assert snaps, f"no snapshot produced; output:\n{r.output}"
    assert load_snapshot(snaps[0])["params"]
