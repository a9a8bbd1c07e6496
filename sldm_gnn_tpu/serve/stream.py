"""Streaming inference server: named-pipe JSON frames -> sliding window ->
on-the-fly graph build -> jitted model -> CSV scores.

Parity: /root/reference/rcv.py — producer thread does blocking reads on a
FIFO and parses newline-delimited JSON frames into DataFrames appended to a
shared deque under a Condition (:24-56); the consumer waits for
``pack_size`` frames, concatenates them into a pack with ``FrameId`` keys
(:69-74), builds the window graph, runs the model, appends the sigmoid
score to a CSV (writing ``"."`` for empty windows, :77-87), then pops one
frame for a stride-1 sliding window (:89-91). Clean shutdown via a
termination Event + ``notify_all``.

TPU-first difference: window graphs are padded to power-of-two node/edge
**buckets** before the jitted forward, so the stream triggers at most
O(log V_max) compilations instead of one per distinct vehicle count
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import json
import os
import threading
from collections import deque
from pathlib import Path

import numpy as np
import pandas as pd

from ..build.online import GraphOnlineCreator, IncrementalGraphOnlineCreator
from ..graph.batching import BatchDims, pad_and_batch
from ..models.grusage import GruSage
from ..train.snapshot import load_snapshot

MAX_JSON_CHUNK_SIZE = 32 * 1024


def _next_pow2(n: int, lo: int = 4) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


class InferenceEngine:
    """Snapshot-driven single-window inference with bucketed padding."""

    def __init__(
        self,
        snapshot_path: Path | str,
        *,
        pack_size: int,
        m_radius: float = 25.0,
        incremental: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        snap = load_snapshot(snapshot_path)
        self.config = snap["config"]
        self.params = snap["params"]
        self.map_embeddings = (
            jnp.asarray(snap["map_embeddings"]) if snap["map_embeddings"] is not None else None
        )
        self.map_centroids = (
            jnp.asarray(snap["map_centroids"]) if snap["map_centroids"] is not None else None
        )
        self.model = GruSage(self.config)
        self.creator = GraphOnlineCreator(
            frames_num=pack_size,
            m_radius=m_radius,
            active_labels=None,
            has_label=False,
            norm_stats=snap["norm_stat_dict"],
        )
        self.inc_creator = (
            IncrementalGraphOnlineCreator(
                frames_num=pack_size, m_radius=m_radius, norm_stats=snap["norm_stat_dict"]
            )
            if incremental
            else None
        )
        self.pack_size = pack_size
        self._jax = jax
        self._jnp = jnp

        def fwd(params, batch):
            return jax.nn.sigmoid(
                self.model.apply(
                    {"params": params},
                    batch,
                    map_embeddings=self.map_embeddings,
                    map_centroids=self.map_centroids,
                    train=False,
                )
            )

        self._fwd = jax.jit(fwd)

    def score_window(self, pack_df: pd.DataFrame) -> np.ndarray | None:
        """Score one sliding window; None for an empty window."""
        return self._score_graph(self.creator(pack_df))

    @property
    def warm(self) -> bool:
        """Incremental mode: whether a full window has been pushed."""
        return self.inc_creator is not None and self.inc_creator.warm

    def push_frame(self, frame_df: pd.DataFrame) -> np.ndarray | None:
        """Incremental mode: ingest one frame (O(V²) instead of O(V²·F)
        per stride — build/online.py IncrementalGraphOnlineCreator) and
        score the current window. None while warming up or when the warm
        window is empty (check :attr:`warm` to distinguish)."""
        assert self.inc_creator is not None, "engine not built with incremental=True"
        self.inc_creator.push(frame_df)
        if not self.inc_creator.warm:
            return None
        return self._score_graph(self.inc_creator.window())

    def push_frame_rows(self, rows: list[dict]) -> np.ndarray | None:
        """:meth:`push_frame` from the wire format directly (list of
        per-vehicle row dicts, the stream's JSON payload) — skips the
        DataFrame round-trip whose column accessors cost ~0.8 ms/frame
        at V=32 (BASELINE.md serving budget)."""
        assert self.inc_creator is not None, "engine not built with incremental=True"

        def col(key, dtype, fill_nan=False):
            vals = [r.get(key) for r in rows]
            if fill_nan:
                # JSON null / NaN dims -> 0.0, the pandas path's fillna
                # contract (NaN would poison the pair distances)
                vals = [0.0 if v is None else v for v in vals]
            a = np.asarray(vals, dtype)
            if fill_nan and a.size:
                np.nan_to_num(a, copy=False, nan=0.0)
            return a

        self.inc_creator.push_arrays(
            [r["VehicleId"] for r in rows],
            col("X", np.float32), col("Y", np.float32),
            col("Speed", np.float32), col("Angle", np.float32),
            col("Width", np.float32, fill_nan=True),
            col("Length", np.float32, fill_nan=True),
            col("StationType", np.int32),
        )
        if not self.inc_creator.warm:
            return None
        return self._score_graph(self.inc_creator.window())

    def _score_graph(self, g) -> np.ndarray | None:
        if g.num_nodes == 0:
            return None
        dims = BatchDims(
            node_capacity=_next_pow2(g.num_nodes),
            edge_capacity=_next_pow2(max(g.num_edges, 1)),
            graph_capacity=1,
            num_frames=self.pack_size,
            num_labels=self.config.out_dim,
        )
        batch = self._jax.tree.map(self._jnp.asarray, pad_and_batch([g], dims))
        scores = self._fwd(self.params, batch)
        return np.asarray(scores)[0]


class StreamingServer:
    def __init__(
        self,
        fifo_path: Path | str,
        snapshot_path: Path | str,
        output_csv: Path | str,
        *,
        pack_size: int,
        m_radius: float = 25.0,
        incremental: bool = False,
    ):
        self.fifo_path = Path(fifo_path)
        self.snapshot_path = Path(snapshot_path)
        self.output_csv = Path(output_csv)
        self.pack_size = pack_size
        self.m_radius = m_radius
        self.incremental = incremental

        self.frames: deque[pd.DataFrame] = deque()
        self.lock = threading.Lock()
        self.condition = threading.Condition(self.lock)
        self.terminate = threading.Event()
        self.n_scored = 0
        self._fd: int | None = None
        self._fd_closed = False
        self.consumer_error: BaseException | None = None

    def _signal_termination(self, reason: str | None = None):
        if reason:
            print(reason)
        self.terminate.set()
        with self.condition:
            self.condition.notify_all()
        # the producer's select() times out and re-checks the event, so no
        # fd gymnastics are needed to wake it (closing the fd from another
        # thread would NOT interrupt a blocked os.read on Linux anyway, and
        # racing closes could hit an unrelated reused descriptor)

    def _producer(self, fd: int):
        import select

        buffer = ""
        try:
            while not self.terminate.is_set():
                # bounded wait instead of a blocking read: a consumer error
                # (or any _signal_termination) must end this thread even if
                # the writer never sends another byte
                readable, _, _ = select.select([fd], [], [], 0.2)
                if not readable:
                    continue
                try:
                    chunk = os.read(fd, MAX_JSON_CHUNK_SIZE).decode()
                except BlockingIOError:
                    continue
                except OSError as e:
                    self._signal_termination(f"FIFO read error: {e}")
                    break
                if not chunk:
                    self._signal_termination("writer closed the FIFO")
                    break
                buffer += chunk
                while "\n" in buffer:
                    line, buffer = buffer.split("\n", 1)
                    if not line.strip():
                        continue
                    try:
                        data = json.loads(line)
                    except json.JSONDecodeError as e:
                        self._signal_termination(f"malformed JSON frame: {e}")
                        return
                    # incremental mode keeps the raw row list — the
                    # consumer feeds push_frame_rows and never builds a
                    # DataFrame (0.8 ms/frame of accessor overhead saved)
                    payload = (data if self.incremental and isinstance(data, list)
                               else pd.DataFrame(data))
                    with self.condition:
                        self.frames.append(payload)
                        # incremental consumer wakes per frame; the classic
                        # one re-checks its >= pack_size predicate anyway
                        if self.incremental or len(self.frames) >= self.pack_size:
                            self.condition.notify_all()
        finally:
            self._signal_termination()

    def _consumer(self):
        try:
            self._consume_loop()
        except Exception as e:
            # fail fast: leave no silently-dead consumer behind an alive
            # producer (unbounded frame buffering + a hung join); the error
            # is stored so run() re-raises it on the caller's thread
            self.consumer_error = e
            self._signal_termination(f"consumer error: {type(e).__name__}: {e}")

    def _consume_loop(self):
        if self.incremental:
            self._consume_loop_incremental()
            return
        engine = InferenceEngine(
            self.snapshot_path, pack_size=self.pack_size, m_radius=self.m_radius
        )
        self._write_csv_header()
        while True:
            pack_df = None
            with self.condition:
                while len(self.frames) < self.pack_size and not self.terminate.is_set():
                    self.condition.wait()
                # drain remaining buffered windows after producer termination
                if len(self.frames) >= self.pack_size:
                    pack_df = pd.concat(
                        list(self.frames)[: self.pack_size],
                        keys=range(self.pack_size),
                        names=["FrameId"],
                    ).reset_index(level=0)
            if pack_df is None:
                break
            scores = engine.score_window(pack_df)
            self._append_score_row(scores)
            with self.condition:
                if self.frames:
                    self.frames.popleft()

    def _consume_loop_incremental(self):
        """Stride-1 consumption with per-frame pushes: the creator carries
        the window state, so frames are dequeued as they arrive and each
        push after warmup emits one score line — identical output cadence
        and '.'-for-empty semantics as the classic loop."""
        engine = InferenceEngine(
            self.snapshot_path, pack_size=self.pack_size, m_radius=self.m_radius,
            incremental=True,
        )
        self._write_csv_header()
        while True:
            frame = None
            with self.condition:
                while not self.frames and not self.terminate.is_set():
                    self.condition.wait()
                if self.frames:
                    frame = self.frames.popleft()
            if frame is None:
                break
            scores = (engine.push_frame_rows(frame) if isinstance(frame, list)
                      else engine.push_frame(frame))
            if not engine.warm:
                continue
            self._append_score_row(scores)

    def _write_csv_header(self):
        with open(self.output_csv, "w") as f:
            f.write("Score\n")

    def _append_score_row(self, scores):
        """One line per scored window: '.' for empty windows (reference
        rcv.py:83-87), else comma-joined %.6f scores."""
        with open(self.output_csv, "a") as f:
            if scores is None:
                f.write(".\n")
            else:
                f.write(",".join(f"{s:.6f}" for s in np.atleast_1d(scores)) + "\n")
        self.n_scored += 1

    def run(self):
        # blocking open (waits for a writer, reference rcv.py semantics),
        # then non-blocking reads under select so termination can interrupt
        self._fd = os.open(self.fifo_path, os.O_RDONLY)
        os.set_blocking(self._fd, False)
        try:
            t1 = threading.Thread(target=self._producer, args=(self._fd,))
            t2 = threading.Thread(target=self._consumer)
            t1.start()
            t2.start()
            t1.join()
            t2.join()
        finally:
            if not self._fd_closed:
                self._fd_closed = True
                os.close(self._fd)
        if self.consumer_error is not None:
            raise self.consumer_error
