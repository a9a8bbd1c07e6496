"""Offline pack→graph ETL (the reference's GraphsBuilder,
/root/reference/src/gbuilder.py:432-624, re-designed).

Reads the parquet triplet of a split directory
(``packs.parquet`` per-frame rows [PackId, VehicleId, FrameId, X, Y, Speed,
Angle], ``vinfo.parquet`` [VehicleId, Width, Length, StationType],
``labels.parquet`` [PackId, MLBEncoded] bitmask — gbuilder.py:452-476),
tensorizes each pack (vectorized; no per-row DataFrame concat), builds
trajectory-proximity edges, decodes the label bitmask, and writes one
``pack_<pid>.npz`` per pack plus ``metadata.json``
(fields parity: gbuilder.py:615-622).

Worker parallelism: a thread pool over packs mirrors the reference's
worker/queue ETL (§2.4.2) but with row-group streaming kept in the parent.
Threads (not processes) on purpose: the O(V²F) hot loop runs in the native
C++ kernel (native/libgraphbuild.so), whose ctypes calls release the GIL —
and forked process pools deadlock in environments where the parent has
live accelerator-client threads (e.g. the remote-TPU plugin).
"""

from __future__ import annotations

import json
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

from ..labels import ALL_LABELS, decode_bitmask
from ..utils.metadata import MetaData
from .tensorize import build_trajectory_edges, tensorize_pack


def pack_to_graph(
    pack_df: pd.DataFrame,
    vinfo_df: pd.DataFrame | None,
    *,
    frames_num: int,
    m_radius: float,
    mlb: int | None,
    active_labels: list[int],
) -> dict[str, np.ndarray]:
    """Build one pack graph as a dict of arrays (npz payload)."""
    x, xsttype, xdims = tensorize_pack(pack_df, vinfo_df, frames_num)
    edge_index, edge_attr = build_trajectory_edges(x, m_radius)
    out = {
        "x": x,
        "xsttype": xsttype,
        "xdims": xdims,
        "edge_index": edge_index,
        "edge_attr": edge_attr,
    }
    if mlb is not None:
        out["y"] = np.array(decode_bitmask(mlb, active_labels), dtype=np.float32)
    return out


def _worker(args):
    pid, pack_df, vinfo_df, frames_num, m_radius, mlb, active_labels, gpath = args
    g = pack_to_graph(
        pack_df,
        vinfo_df,
        frames_num=frames_num,
        m_radius=m_radius,
        mlb=mlb,
        active_labels=active_labels,
    )
    np.savez(Path(gpath) / f"pack_{pid}.npz", **g)
    return pid


class GraphsBuilder:
    def __init__(
        self,
        dirpath: Path | str,
        *,
        frames_num: int,
        m_radius: float,
        active_labels: list[int] | None = None,
        n_workers: int = 1,
    ):
        self.dirpath = Path(dirpath).resolve()
        self.gpath = self.dirpath / ".graphs"
        self.frames_num = frames_num
        self.m_radius = m_radius
        self.n_workers = n_workers

        if active_labels is None:
            active_labels = list(ALL_LABELS)
        elif len(active_labels) == 0:
            raise ValueError("active_labels must contain at least one label index")
        else:
            for c in active_labels:
                if not isinstance(c, int) or c < 0:
                    raise ValueError("active_labels must be non-negative integers")
        self.active_labels = active_labels

        ypath = self.dirpath / "labels.parquet"
        self.labels_df = pd.read_parquet(ypath) if ypath.is_file() else None
        # O(1) label lookup per pack (the DataFrame-scan version is O(P^2)
        # over the dataset); duplicate PackIds are rejected here once
        if self.labels_df is not None:
            if self.labels_df["PackId"].duplicated().any():
                dupes = self.labels_df["PackId"][self.labels_df["PackId"].duplicated()]
                raise ValueError(f"Multiple label rows for PackId(s) {sorted(set(dupes))[:5]}")
            self._mlb_map = dict(
                zip(self.labels_df["PackId"].tolist(), self.labels_df["MLBEncoded"].tolist())
            )
        else:
            self._mlb_map = {}

        vpath = self.dirpath / "vinfo.parquet"
        if vpath.is_file():
            v = pd.read_parquet(vpath)
            v["Width"] = v["Width"].fillna(0.0)
            v["Length"] = v["Length"].fillna(0.0)
            self.vinfo_df = v
        else:
            self.vinfo_df = None

    def _mlb_by_pid(self, pid) -> int | None:
        mlb = self._mlb_map.get(pid)
        return int(mlb) if mlb is not None else None

    def save(self, *, progress: bool = False) -> Path:
        if self.gpath.exists():
            shutil.rmtree(self.gpath)
        self.gpath.mkdir(parents=True)

        import pyarrow.parquet as pq

        # stream row groups: only one row group's packs are in flight at a
        # time, bounding peak memory on large datasets. A pack whose rows
        # straddle a row-group boundary is carried over (its last group is
        # held back and prepended to the next row group); non-contiguous
        # reappearance of a pack is data corruption and raises.
        import warnings

        from .native import available as _native_available

        if self.n_workers > 1 and not _native_available():
            warnings.warn(
                "GraphsBuilder: native edge kernel not built "
                "(make -C native); the numpy fallback holds the GIL so "
                "thread workers add little parallelism",
                stacklevel=2,
            )

        pf = pq.ParquetFile(self.dirpath / "packs.parquet")
        done = 0
        built: set = set()
        carry: tuple | None = None  # (pid, partial DataFrame)

        def make_task(pid, pg):
            return (
                pid,
                pg.drop(columns=["PackId"]),
                self.vinfo_df,
                self.frames_num,
                self.m_radius,
                self._mlb_by_pid(pid),
                self.active_labels,
                str(self.gpath),
            )

        with ThreadPoolExecutor(max(self.n_workers, 1)) as pool:
            for rg in range(pf.num_row_groups):
                batch_df = pf.read_row_group(rg).to_pandas()
                groups = list(batch_df.groupby("PackId", sort=False))
                if carry is not None:
                    cpid, cdf = carry
                    if groups and groups[0][0] == cpid:
                        groups[0] = (cpid, pd.concat([cdf, groups[0][1]], ignore_index=True))
                    else:
                        groups.insert(0, (cpid, cdf))
                    carry = None
                if rg + 1 < pf.num_row_groups and groups:
                    carry = groups.pop()  # may continue in the next row group
                tasks = []
                for pid, pg in groups:
                    if pid in built:
                        raise ValueError(
                            f"PackId {pid} reappears non-contiguously across row "
                            "groups; rewrite packs.parquet with pack-contiguous rows"
                        )
                    built.add(pid)
                    tasks.append(make_task(pid, pg))
                for _ in pool.map(_worker, tasks):
                    done += 1
                    if progress and done % 50 == 1:
                        print(f"built {done} graphs")
            if carry is not None:
                pid, pg = carry
                if pid in built:
                    raise ValueError(
                        f"PackId {pid} reappears non-contiguously across row groups"
                    )
                _worker(make_task(pid, pg))
                done += 1
        pf.close()

        n_samples = (
            int(self.labels_df["PackId"].nunique())
            if self.labels_df is not None
            else len(list(self.gpath.glob("*.npz")))
        )
        n_positive = (
            int((self.labels_df["MLBEncoded"] > 0).sum()) if self.labels_df is not None else None
        )
        MetaData(
            n_samples=n_samples,
            n_positive=n_positive,
            n_edge_features=4,
            frames_num=self.frames_num,
            m_radius=self.m_radius,
            active_labels=self.active_labels,
        ).to_json(self.gpath / "metadata.json")
        return self.gpath
