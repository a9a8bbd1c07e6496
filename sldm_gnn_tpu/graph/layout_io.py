"""Serialize precomputed SpMM edge layouts to disk.

The blocked layouts (BlockedEdges / DenseBlocks / BandedBlocks) are pure
functions of the static edge set, but building them costs host time that
grows with the graph (~100 s for the 64M-edge banded layout, dominated by
the adjacency-tile fill). Training jobs over a static graph should pay
that once: ``save_layout``/``load_layout`` round-trip any registered
layout dataclass through one ``.npz`` file (arrays + a JSON header with
the class name and static fields), and ``cached_layouts`` wraps a builder
with an on-disk cache keyed by the caller's own content key.

Reference parallel: the reference also persists its preprocessing
(per-pack ``.pt`` graph files, ``/root/reference/src/gbuilder.py:537-554``)
— this is the same play one level down, at the kernel-layout tier that
exists only in the TPU design.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

_NONE = "__none__"


def _registry():
    from ..graph.csr import BlockedEdges
    from ..ops.spmm_banded import BandedBlocks
    from ..ops.spmm_dense import DenseBlocks
    from ..ops.spmm_hybrid import HybridLayout

    return {c.__name__: c for c in (BlockedEdges, DenseBlocks, BandedBlocks,
                                    HybridLayout)}


def _flatten(layout, prefix: str, arrays: dict) -> dict:
    """Recursive header+array flattening: nested registered layouts (e.g.
    HybridLayout's DenseBlocks/BlockedEdges halves) get dotted key
    prefixes; None data fields get a string marker array."""
    cls = type(layout)
    header = {"class": cls.__name__, "static": {}, "nested": {}}
    for f in dataclasses.fields(cls):
        v = getattr(layout, f.name)
        if f.metadata.get("static"):
            header["static"][f.name] = v.item() if isinstance(v, np.generic) else v
        elif type(v).__name__ in _registry():
            header["nested"][f.name] = _flatten(v, f"{prefix}{f.name}.", arrays)
        elif v is None:
            arrays[prefix + f.name] = np.asarray(_NONE)
        else:
            arrays[prefix + f.name] = np.asarray(v)
    return header


def _unflatten(z, prefix: str, header: dict):
    cls = _registry()[header["class"]]
    kwargs = dict(header["static"])
    for f in dataclasses.fields(cls):
        if f.name in kwargs:
            continue
        if f.name in header["nested"]:
            kwargs[f.name] = _unflatten(z, f"{prefix}{f.name}.", header["nested"][f.name])
        else:
            a = z[prefix + f.name]
            kwargs[f.name] = None if a.shape == () and a.dtype.kind in "US" and str(a) == _NONE else a
    return cls(**kwargs)


_I4_SUFFIX = "__i4"


def _pack_int4(a: np.ndarray) -> np.ndarray:
    """int8 values in [-8, 7] -> two nibbles per byte (uint8)."""
    flat = np.ascontiguousarray(a, np.int8).reshape(-1)
    if len(flat) % 2:
        flat = np.concatenate([flat, np.zeros(1, np.int8)])
    u = flat.view(np.uint8)
    return ((u[0::2] & 0x0F) | ((u[1::2] & 0x0F) << 4)).astype(np.uint8)


_I4_LUT = None


def _unpack_int4(p: np.ndarray, shape) -> np.ndarray:
    # one 256-entry byte->(lo, hi) int8 LUT gather; the (256, 2) table puts
    # the sign-extended low nibble in column 0 and the high nibble in
    # column 1, so reshape(-1) IS the unpacked stream on any host
    # endianness (the naive strided out[0::2]/out[1::2] writes ran
    # ~5 s/GB; this is ~0.5 s/GB)
    global _I4_LUT
    if _I4_LUT is None:
        b = np.arange(256, dtype=np.int16)
        lo = (((b & 0x0F) ^ 8) - 8).astype(np.int8)
        hi = ((((b >> 4) & 0x0F) ^ 8) - 8).astype(np.int8)
        _I4_LUT = np.stack([lo, hi], axis=1)
    n = int(np.prod(shape))
    out = _I4_LUT[p].reshape(-1)
    return out[:n].reshape(shape)


def save_layout(path: str | Path, layout, *, pack_int4: bool = True,
                raw_threshold: int | None = 16 * 2**20) -> None:
    """Write one layout dataclass (incl. nested, e.g. HybridLayout) to
    ``path`` (.npz), with large arrays as raw ``.npy`` side-car files.

    ``pack_int4`` (default): int8 arrays whose values fit [-8, 7] — count
    tiles of any simple graph — store as packed nibbles, halving the
    on-disk A footprint (the config-5 plans' dominant term, BASELINE.md).
    Exact and transparent: :func:`load_layout` unpacks to int8.

    ``raw_threshold``: arrays at/above this many bytes (post-packing) are
    written as ``<stem>.<field>.npy`` NEXT TO the npz and referenced from
    its header — numpy's zipfile member reader tops out ~150 MB/s
    (64 KB chunks + CRC) while a raw ``.npy`` reads at memory/disk speed,
    which dominates multi-GB plan loads (multi-host worker startup).
    ``None`` disables side-cars. The npz and its side-cars form ONE
    artifact: move/delete them together."""
    if type(layout).__name__ not in _registry():
        raise TypeError(f"unknown layout type {type(layout).__name__}")
    arrays: dict = {}
    header = _flatten(layout, "", arrays)
    if pack_int4:
        i4 = {}
        out_arrays = {}
        for k, v in arrays.items():
            if (v.dtype == np.int8 and v.size >= 4096
                    and int(v.min(initial=0)) >= -8
                    and int(v.max(initial=0)) <= 7):
                out_arrays[k + _I4_SUFFIX] = _pack_int4(v)
                i4[k] = list(v.shape)
            else:
                out_arrays[k] = v
        arrays = out_arrays
        header["__i4__"] = i4
    p = Path(path)
    raw = {}
    if raw_threshold is not None:
        for k in sorted(arrays):
            v = arrays[k]
            if v.nbytes >= raw_threshold:
                fn = f"{p.stem}.{k}.npy"
                np.save(p.parent / fn, v)
                raw[k] = fn
                del arrays[k]
    header["__raw__"] = raw
    np.savez(path, __layout_header__=np.asarray(json.dumps(header)), **arrays)


def load_layout(path: str | Path):
    """Read a layout written by :func:`save_layout` (host numpy arrays;
    move to device with ``jax.tree.map(jnp.asarray, layout)``)."""
    p = Path(path)
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__layout_header__"]))
        data = {k: z[k] for k in z.files if k != "__layout_header__"}
    for k, fn in header.get("__raw__", {}).items():
        data[k] = np.load(p.parent / fn, allow_pickle=False)
    i4 = header.get("__i4__", {})
    if i4:
        out = {}
        for k, v in data.items():
            if k.endswith(_I4_SUFFIX) and k[: -len(_I4_SUFFIX)] in i4:
                base = k[: -len(_I4_SUFFIX)]
                out[base] = _unpack_int4(v, i4[base])
            else:
                out[k] = v
        data = out
    return _unflatten(data, "", header)


def cached_layouts(cache_dir: str | Path, key: str, build):
    """Layout-tuple cache: returns ``build()``'s result, persisting every
    layout element under ``cache_dir/key-<i>.npz`` (non-layout elements —
    e.g. the padded node count — go into a JSON sidecar). ``key`` must
    encode everything the layouts depend on (graph hash/source, tile, k,
    dtype, backend); the cache trusts it blindly."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    meta_p = cache_dir / f"{key}.json"
    if meta_p.is_file():
        meta = json.loads(meta_p.read_text())
        out = []
        for i, kind in enumerate(meta["kinds"]):
            if kind == "layout":
                out.append(load_layout(cache_dir / f"{key}-{i}.npz"))
            else:
                out.append(meta["values"][str(i)])
        return tuple(out)
    result = tuple(build())
    kinds, values = [], {}
    for i, item in enumerate(result):
        if type(item).__name__ in _registry():
            save_layout(cache_dir / f"{key}-{i}.npz", item)
            kinds.append("layout")
        else:
            kinds.append("value")
            values[str(i)] = item.item() if isinstance(item, np.generic) else item
    # write the manifest last: a crash mid-save leaves no valid cache entry
    meta_p.write_text(json.dumps({"kinds": kinds, "values": values}))
    return result
