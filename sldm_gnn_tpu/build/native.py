"""ctypes bindings to the native ETL kernels (native/libgraphbuild.so).

Loads the OpenMP C++ library when built (``make -C native``); callers fall
back to the vectorized numpy paths when it is absent or disabled via
``SLDM_GNN_TPU_NO_NATIVE=1``. Emission order and numerics match the numpy
implementations bit-for-bit-closely (see tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / "libgraphbuild.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("SLDM_GNN_TPU_NO_NATIVE") == "1" or not _LIB_PATH.is_file():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64 = ctypes.c_int64
    f32 = ctypes.c_float
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.traj_edge_count.argtypes = [pf, pf, i64, i64, f32, pi64]
    lib.traj_edge_fill.argtypes = [pf, pf, i64, i64, f32, pi64, pi32, pi32, pf]
    lib.map_edge_count.argtypes = [pf, pf, pf, pu8, pu8, i64, f32, f32, f32, pi64]
    lib.map_edge_fill.argtypes = [pf, pf, pf, pu8, pu8, i64, f32, f32, f32, pi64, pi64, pi64]
    _lib = lib
    return lib


def _load_incr():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_incr_ready"):
        try:
            i64 = ctypes.c_int64
            pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.incr_push.argtypes = [
                i64, i64, i64, i64,        # cap, F, pos, evict
                pi64, i64,                 # slots, n
                pf, pf, pf, pf, pf,        # px, py, speed, sin_a, cos_a
                pf,                        # wl [cap, 2]
                pf, pu8, pf,               # x, present(uint8 view), d
                pf64, pf64, pi64,          # dsum, d2sum, cnt
                pf, pi32, pf, pi32,        # dmin, dmin_pos, dmax, dmax_pos
            ]
        except AttributeError:
            # stale libgraphbuild.so built before incr_push existed:
            # fall back to the numpy path (rebuild with make -C native)
            return None
        lib._incr_ready = True
    return lib


def available() -> bool:
    return _load() is not None


def native_trajectory_edges(x: np.ndarray, m_radius: float):
    """Native path of build_trajectory_edges; returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    V, F, _ = x.shape
    if V == 0:
        return np.zeros((2, 0), np.int32), np.zeros((0, 4), np.float32)
    xy = np.ascontiguousarray(x[:, :, :2], dtype=np.float32)
    presence = np.ascontiguousarray(x[:, :, 5], dtype=np.float32)
    counts = np.zeros(V, np.int64)
    lib.traj_edge_count(xy, presence, V, F, m_radius, counts)
    offsets = np.zeros(V, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    E = int(counts.sum())
    src = np.zeros(E, np.int32)
    dst = np.zeros(E, np.int32)
    attr = np.zeros((E, 4), np.float32)
    if E:
        lib.traj_edge_fill(xy, presence, V, F, m_radius, offsets, src, dst, attr)
    return np.stack([src, dst]), attr


def native_map_edges(
    start: np.ndarray,
    end: np.ndarray,
    widths: np.ndarray,
    allow_left: np.ndarray,
    allow_right: np.ndarray,
    *,
    lat_conn_max_angle_deg: float,
    lat_conn_proximity_threshold: float,
    fwd_dist_threshold: float = 2.0,
):
    """Native path of build_map_edges; returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    S = start.shape[0]
    start = np.ascontiguousarray(start, np.float32)
    end = np.ascontiguousarray(end, np.float32)
    widths = np.ascontiguousarray(widths, np.float32)
    al = np.ascontiguousarray(allow_left, np.uint8)
    ar = np.ascontiguousarray(allow_right, np.uint8)
    max_ang = float(np.deg2rad(lat_conn_max_angle_deg))
    counts = np.zeros(S, np.int64)
    lib.map_edge_count(start, end, widths, al, ar, S, max_ang,
                       lat_conn_proximity_threshold, fwd_dist_threshold, counts)
    offsets = np.zeros(S, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    E = int(counts.sum())
    src = np.zeros(E, np.int64)
    dst = np.zeros(E, np.int64)
    if E:
        lib.map_edge_fill(start, end, widths, al, ar, S, max_ang,
                          lat_conn_proximity_threshold, fwd_dist_threshold,
                          offsets, src, dst)
    return np.stack([src, dst])


def _load_blocked():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_be_ready"):
        try:
            i64 = ctypes.c_int64
            pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.be_plan.argtypes = [pi64, pi64, ctypes.c_void_p, i64, i64, i64, i64, i64,
                                    ctypes.POINTER(i64)]
            lib.be_plan.restype = ctypes.c_void_p
            lib.be_fill.argtypes = [ctypes.c_void_p, pi32, pi32, pi32, pf, pi32]
            lib.be_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            # stale libgraphbuild.so built before these symbols existed:
            # fall back to the python builder (rebuild with make -C native)
            return None
        lib._be_ready = True
    return lib


def native_block_edges(src, dst, num_nodes_padded, *, weight=None, tile, edge_chunk,
                       step_chunks):
    """Native blocked-layout builder; returns raw arrays or None if the
    library is unavailable. Chunk order within a dst block may differ from
    the python builder (functionally equivalent — summation order only)."""
    lib = _load_blocked()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    E = len(src)
    # keep the weight array alive across the call
    w_keep = np.ascontiguousarray(weight, np.float32) if weight is not None else None
    nchunks = ctypes.c_int64(0)
    handle = lib.be_plan(
        src, dst,
        w_keep.ctypes.data_as(ctypes.c_void_p) if w_keep is not None else None,
        E, num_nodes_padded, tile, edge_chunk, step_chunks, ctypes.byref(nchunks),
    )
    if nchunks.value < 0 or handle is None:
        raise ValueError(
            "native block_edges: edges reference nodes outside the padded "
            "range (pass num_nodes >= max(src, dst) + 1, tile-padded)"
        )
    W = nchunks.value
    try:
        meta = np.zeros((W, 2), np.int32)
        src_local = np.zeros((W, edge_chunk), np.int32)
        dst_local = np.zeros((W, edge_chunk), np.int32)
        w_arr = np.zeros((W, edge_chunk), np.float32)
        eid = np.zeros((W, edge_chunk), np.int32)
    except BaseException:
        lib.be_free(handle)  # context would otherwise leak on OOM
        raise
    lib.be_fill(handle, meta, src_local, dst_local, w_arr, eid)
    return meta, src_local, dst_local, w_arr, eid


def _load_dense():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_da_ready"):
        try:
            i64 = ctypes.c_int64
            pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.da_plan.argtypes = [pi64, pi64, i64, i64, i64, ctypes.POINTER(i64)]
            lib.da_plan.restype = ctypes.c_void_p
            lib.da_fill.argtypes = [ctypes.c_void_p, pf, i64, pf, pi32]
            lib.da_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            return None  # stale .so — rebuild with make -C native
        try:
            # added after da_plan/da_fill: its absence (stale .so) only
            # disables the int8 fast path, not the f32 one
            pi8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
            lib.da_fill_i8.argtypes = [ctypes.c_void_p, i64, pi8, pi32]
            lib.da_fill_i8.restype = i64
            lib._da_i8 = True
        except AttributeError:
            lib._da_i8 = False
        try:
            pi8b = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
            lib.da_fill_banded_i8.argtypes = [ctypes.c_void_p, i64, pi8b, pi32]
            lib.da_fill_banded_i8.restype = i64
            lib._da_banded = True
        except AttributeError:
            lib._da_banded = False
        lib._da_ready = True
    return lib


def native_dense_blocks(src, dst, weight, num_dst_blocks, tile):
    """Native dense-adjacency-tile builder (ops/spmm_dense.py fast path).
    Returns (a [nb, s_max, T, T] f32, src_blk [nb, s_max] i32) or None."""
    lib = _load_dense()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    w = np.ascontiguousarray(weight, np.float32)
    s_max = ctypes.c_int64(0)
    handle = lib.da_plan(src, dst, len(src), num_dst_blocks, tile, ctypes.byref(s_max))
    S = max(int(s_max.value), 1)
    try:
        a = np.zeros((num_dst_blocks, S, tile, tile), np.float32)
        src_blk = np.zeros((num_dst_blocks, S), np.int32)
    except BaseException:
        lib.da_free(handle)
        raise
    lib.da_fill(handle, w, S, a, src_blk)  # frees the context
    return a, src_blk


def native_dense_blocks_i8(src, dst, num_dst_blocks, tile):
    """Native int8 count-tile builder (the factored mean layout's fast
    path — avoids the f32 tile transient entirely). Returns
    (a [nb, s_max, T, T] int8, src_blk [nb, s_max] i32, max_count) or
    None when the native lib is unavailable."""
    lib = _load_dense()
    if lib is None or not lib._da_i8:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    s_max = ctypes.c_int64(0)
    handle = lib.da_plan(src, dst, len(src), num_dst_blocks, tile, ctypes.byref(s_max))
    S = max(int(s_max.value), 1)
    try:
        a = np.zeros((num_dst_blocks, S, tile, tile), np.int8)
        src_blk = np.zeros((num_dst_blocks, S), np.int32)
    except BaseException:
        lib.da_free(handle)
        raise
    cmax = int(lib.da_fill_i8(handle, S, a, src_blk))  # frees the context
    return a, src_blk, cmax


def native_banded_blocks_i8(src, dst, num_dst_blocks, tile, s_span):
    """Native banded int8 count fill (ops/spmm_banded.py fast path).
    Returns (a [nb, s_span, T, T] int8, bo [nb] i32, max_count) or None;
    max_count is -1 when some block's span exceeds s_span."""
    lib = _load_dense()
    if lib is None or not lib._da_banded:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    s_max = ctypes.c_int64(0)
    handle = lib.da_plan(src, dst, len(src), num_dst_blocks, tile, ctypes.byref(s_max))
    try:
        a = np.zeros((num_dst_blocks, s_span, tile, tile), np.int8)
        bo = np.arange(num_dst_blocks, dtype=np.int32)
    except BaseException:
        lib.da_free(handle)
        raise
    cmax = int(lib.da_fill_banded_i8(handle, s_span, a, bo))  # frees ctx
    return a, bo, cmax


def native_incr_push(creator, pos: int, evict: bool, slots, px, py, speed,
                     sin_a, cos_a) -> bool:
    """Native core of IncrementalGraphOnlineCreator.push_arrays: eviction
    accumulator subtraction + lazy min/max maintenance + ring-column
    clear/write + frame pair distances + accumulator add, as ONE call
    over the creator's state arrays in place (the numpy path is
    dispatch-bound at serving sizes). Returns False when the library is
    unavailable — the caller falls back to the numpy body."""
    lib = _load_incr()
    if lib is None:
        return False
    c = creator
    lib.incr_push(
        c._cap, c.frames_num, pos, int(evict),
        np.ascontiguousarray(slots, np.int64), len(slots),
        np.ascontiguousarray(px, np.float32),
        np.ascontiguousarray(py, np.float32),
        np.ascontiguousarray(speed, np.float32),
        np.ascontiguousarray(sin_a, np.float32),
        np.ascontiguousarray(cos_a, np.float32),
        c._wl, c._x, c._present.view(np.uint8), c._d,
        c._dsum, c._d2sum, c._cnt,
        c._dmin, c._dmin_pos, c._dmax, c._dmax_pos,
    )
    return True


def _load_window():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_win_ready"):
        try:
            i64 = ctypes.c_int64
            f32 = ctypes.c_float
            pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.incr_window_edges.argtypes = [
                i64, pi64, i64, f32,
                pf, pf, pf64, pf64, pi64,
                pi32, pi32, pf,
            ]
            lib.incr_window_edges.restype = i64
        except AttributeError:
            return None
        lib._win_ready = True
    return lib


def native_incr_window_edges(creator, sl: np.ndarray):
    """Native edge emission for IncrementalGraphOnlineCreator.window():
    valid live-slot pairs in i-major order + their [dmin, dmax, dmean,
    dmsq] attributes in one call (~15 numpy dispatches replaced).
    Returns (edge_index [2, E] int32, edge_attr [E, 4] float32) or None
    when the library is unavailable."""
    lib = _load_window()
    if lib is None:
        return None
    c = creator
    v = len(sl)
    src = np.empty(v * v, np.int32)
    dst = np.empty(v * v, np.int32)
    attr = np.empty((v * v, 4), np.float32)
    k = lib.incr_window_edges(
        c._cap, np.ascontiguousarray(sl, np.int64), v,
        np.float32(c.m_radius), c._dmin, c._dmax, c._dsum, c._d2sum,
        c._cnt, src, dst, attr)
    return np.stack([src[:k], dst[:k]]), attr[:k].copy()
