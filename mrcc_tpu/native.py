"""ctypes bindings to the native host-runtime library (runtime/).

The C++ core (runtime/voxelizer.cpp) provides the host input-pipeline hot
ops — voxelization, FPS, ball query — mirroring the native engines the
reference leans on (MinkowskiEngine C++ quantization, SURVEY.md §2.1).
Falls back to the numpy implementations transparently when the library has
not been built (``make -C runtime``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "runtime",
                 "libmrcc_runtime.so"),
    os.path.join(os.path.dirname(__file__), "libmrcc_runtime.so"),
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        if os.path.isfile(p):
            lib = ctypes.CDLL(p)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.mrcc_voxelize.restype = ctypes.c_int32
            lib.mrcc_voxelize.argtypes = [
                f32p, f32p, i32p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float, ctypes.c_int64, ctypes.c_int32,
                i32p, f32p, i32p, i32p,
            ]
            lib.mrcc_fps.restype = None
            lib.mrcc_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i32p]
            lib.mrcc_ball_query.restype = None
            lib.mrcc_ball_query.argtypes = [
                f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float,
                ctypes.c_int64, i32p,
            ]
            _LIB = lib
            return lib
    _LIB = False
    return None


def available() -> bool:
    return bool(_load())


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def voxelize_host(points, feats, quantization_size, capacity, labels=None,
                  ignore_label=-100):
    """Host voxelization -> (coords [V,3] i32, feats [V,C] f32,
    labels [V] i32 | None, point_to_voxel [N] i32, n_voxels)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    feats = np.ascontiguousarray(feats, np.float32)
    n, c = feats.shape
    if lib:
        out_coords = np.empty((capacity, 3), np.int32)
        out_feats = np.zeros((capacity, c), np.float32)
        out_labels = np.empty(capacity, np.int32)
        pv = np.empty(n, np.int32)
        lab = (np.ascontiguousarray(labels, np.int32) if labels is not None
               else None)
        n_vox = lib.mrcc_voxelize(
            _f32p(points), _f32p(feats),
            _i32p(lab) if lab is not None else None,
            n, c, float(quantization_size), capacity, int(ignore_label),
            _i32p(out_coords), _f32p(out_feats), _i32p(out_labels), _i32p(pv))
        labels_out = out_labels[:n_vox] if labels is not None else None
        return (out_coords[:n_vox], out_feats[:n_vox], labels_out, pv, n_vox)

    # numpy fallback
    coords = np.floor(points / quantization_size).astype(np.int32)
    uniq, first_idx, inverse = np.unique(coords, axis=0, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx)  # first-appearance order like the C++ map
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    inverse = rank[inverse]
    uniq = uniq[order]
    n_vox = min(len(uniq), capacity)
    keep = inverse < n_vox
    fsum = np.zeros((n_vox, c), np.float64)
    np.add.at(fsum, inverse[keep], feats[keep])
    cnt = np.bincount(inverse[keep], minlength=n_vox)[:n_vox]
    fmean = (fsum / np.maximum(cnt, 1)[:, None]).astype(np.float32)
    pv = np.where(keep, inverse, capacity).astype(np.int32)
    labels_out = None
    if labels is not None:
        labels = np.asarray(labels, np.int64)
        lmin = np.full(n_vox, 2**31 - 1, np.int64)
        lmax = np.full(n_vox, -(2**31), np.int64)
        np.minimum.at(lmin, inverse[keep], labels[keep])
        np.maximum.at(lmax, inverse[keep], labels[keep])
        labels_out = np.where(lmin == lmax, lmin, ignore_label).astype(np.int32)
    return uniq[:n_vox], fmean, labels_out, pv, n_vox


def fps_host(points, npoint, start_idx=0):
    """Host FPS -> [npoint] int32 indices."""
    lib = _load()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    if lib:
        out = np.empty(npoint, np.int32)
        lib.mrcc_fps(_f32p(points), len(points), npoint, int(start_idx),
                     _i32p(out))
        return out
    from .data.labels import farthest_point_sample_idx

    # seed the first centroid with start_idx so native and numpy paths agree
    return farthest_point_sample_idx(
        points, npoint, start_idx=start_idx).astype(np.int32)


def ball_query_host(points, queries, radius, nsample):
    """Host ball query -> [S, nsample] int32 (reference semantics)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    if lib:
        out = np.empty((len(queries), nsample), np.int32)
        lib.mrcc_ball_query(_f32p(points), len(points), _f32p(queries),
                            len(queries), float(radius), nsample, _i32p(out))
        return out
    d2 = ((queries[:, None, :] - points[None]) ** 2).sum(-1)
    out = np.zeros((len(queries), nsample), np.int32)
    for q in range(len(queries)):
        within = np.where(d2[q] < radius**2)[0][:nsample]
        if len(within):
            out[q, :len(within)] = within
            out[q, len(within):] = within[0]
    return out
