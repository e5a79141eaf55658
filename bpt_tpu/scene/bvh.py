"""Host-side BVH builder (numpy) -> threaded-DFS flat arrays.

Replicates the reference build policy exactly (src/acceleration/bvh.h:20-48):
node bbox = union of member bboxes (padded to min width 1e-4 per axis,
src/acceleration/aabb.h:81-88), split axis = longest axis of the node bbox,
sort the span by per-triangle bbox min on that axis, split at the median;
spans of 1-2 become leaves (the reference materializes them as nodes whose
children are the triangles themselves — identical test set).

The flat layout is DFS preorder with skip links: an AABB hit at internal node
i continues to i+1, a miss jumps to skip[i].  With the per-ray t-max shrink
this visits the same nodes in the same order as bvh_node::hit (bvh.h:50-59),
but traversal state on device is a single int — no stack.
"""

from __future__ import annotations

import sys

import numpy as np

_PAD_DELTA = 1.0e-4  # src/acceleration/aabb.h:84
# streaming-block packing grain for the split rounding (must equal
# ops/pallas/clusters.CLUSTER_TRIS; literal to keep this module and the
# native builder dependency-free)
_PACK_TRIS = 32


def subtree_splits(bvh_skip, bvh_count, max_tris: int):
    """Greedy maximal-subtree triangle-range split points.

    Walks the preorder/skip-link node array; at each node whose subtree
    holds <= max_tris triangles, emits the subtree's contiguous tri range
    as one segment and jumps the whole subtree.  Because the triangle
    order IS the BVH leaf order, every subtree covers a contiguous range,
    so segments tile [0, T) exactly and each segment's AABB is a node
    bbox the build already proved tight — unlike a fixed-stride chop,
    which straddles sibling subtrees and balloons the union.  Used by
    the TPU streaming traversal (ops/pallas/clusters.py); the reference
    needs nothing like this because it walks the tree per ray
    (src/acceleration/bvh.h:50-59)."""
    skip = np.asarray(bvh_skip, np.int64)
    count = np.asarray(bvh_count, np.int64)
    N = skip.shape[0]
    pre = np.zeros(N + 1, np.int64)
    pre[1:] = np.cumsum(count)
    tri_count = pre[skip] - pre[:N]
    splits = [0]
    pos = 0
    while pos < N:
        tc = int(tri_count[pos])
        if 0 < tc <= max_tris:
            splits.append(int(pre[pos]) + tc)
            pos = int(skip[pos])
        else:
            pos += 1
    return tuple(splits)


def merge_splits(cs, ss, cap: int):
    """Greedy fill-merge of adjacent subtree segments up to ``cap`` tris,
    closing at every ``ss`` boundary so outer/inner alignment survives.

    On BALANCED median-split trees this is a measured no-op (subtree
    sizes sit just above cap/2, so any two adjacent segments overflow —
    coffee-91k: 22.3/32 mean, zero merges); the real fill fix is the
    packing-aware split rounding in rec() below.  Kept because LOPSIDED
    trees (heavily non-uniform meshes) do produce mergeable runt
    segments, where fuller blocks mean proportionally fewer
    CLUSTER_TRIS-step roll visits."""
    ssi = frozenset(ss)
    merged = [cs[0]]
    for k in range(1, len(cs)):
        b = cs[k]
        if b == cs[-1] or b in ssi or (cs[k + 1] - merged[-1]) > cap:
            merged.append(b)
    return tuple(merged)


def _pad_box(bmin: np.ndarray, bmax: np.ndarray):
    size = bmax - bmin
    pad = np.where(size < _PAD_DELTA, _PAD_DELTA / 2.0, 0.0)
    return bmin - pad, bmax + pad


def build_bvh(tri_min: np.ndarray, tri_max: np.ndarray, use_native: bool = True):
    """Build from per-triangle bounds [T,3] (float64 host math).

    Returns dict with preorder node arrays (bvh_min, bvh_max, bvh_skip,
    bvh_first, bvh_count) and ``order`` — the triangle permutation such that
    leaves cover contiguous ranges of the permuted triangle arrays.

    Uses the C++ builder (bpt_tpu.native) when available — identical output
    (asserted by tests), ~50x faster on large meshes; this Python version is
    the always-available fallback and the test oracle.
    """
    T = tri_min.shape[0]
    if use_native and T > 0:
        from bpt_tpu import native

        out = native.build_bvh_native(np.asarray(tri_min), np.asarray(tri_max))
        if out is not None:
            return out
    if T == 0:
        return dict(
            bvh_min=np.zeros((1, 3)),
            bvh_max=np.zeros((1, 3)),
            bvh_skip=np.array([1], np.int32),
            bvh_first=np.array([0], np.int32),
            bvh_count=np.array([0], np.int32),
            order=np.zeros((0,), np.int64),
        )

    tri_min = np.asarray(tri_min, np.float64)
    tri_max = np.asarray(tri_max, np.float64)

    node_min, node_max = [], []
    node_skip, node_first, node_count = [], [], []
    new_order: list[int] = []

    # iterative DFS to avoid Python recursion limits on deep trees
    sys.setrecursionlimit(10000)

    def rec(idx: np.ndarray):
        my_pos = len(node_min)
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        bmin, bmax = _pad_box(bmin, bmax)
        node_min.append(bmin)
        node_max.append(bmax)
        node_skip.append(-1)  # patched after subtree emitted

        span = len(idx)
        if span <= 2:
            node_first.append(len(new_order))
            node_count.append(span)
            new_order.extend(idx.tolist())
        else:
            node_first.append(0)
            node_count.append(0)
            axis = int(np.argmax(bmax - bmin))  # longest_axis, aabb.h:68-75
            keys = tri_min[idx, axis]
            order = np.argsort(keys, kind="stable")
            idx = idx[order]
            if span > _PACK_TRIS:
                # PACKING-AWARE median (TPU deviation from bvh.h:43's
                # span/2): round the split to a _PACK_TRIS multiple so
                # every maximal <=32-tri subtree FILLS its streaming
                # roll block.  Balanced medians leave blocks ~70% full
                # (sizes ~22.3/32 on coffee-91k) and the kernel pays a
                # full 32-step roll per visit regardless — measured:
                # C 4096 -> 2861, tile-union visits -23%
                # (tools/probe_packsplit.py).  Within 16 tris of the
                # true median, so box quality is unchanged at depth.
                # floor(x+0.5) == C++ llround for positive x (python's
                # round() is banker's and would diverge at exact halves)
                mid = int(np.clip(
                    int(span / (2 * _PACK_TRIS) + 0.5) * _PACK_TRIS,
                    _PACK_TRIS, span - 1))
            else:
                mid = span // 2  # bvh.h:43
            rec(idx[:mid])
            rec(idx[mid:])
        node_skip[my_pos] = len(node_min)

    rec(np.arange(T))

    return dict(
        bvh_min=np.stack(node_min),
        bvh_max=np.stack(node_max),
        bvh_skip=np.asarray(node_skip, np.int32),
        bvh_first=np.asarray(node_first, np.int32),
        bvh_count=np.asarray(node_count, np.int32),
        order=np.asarray(new_order, np.int64),
    )
