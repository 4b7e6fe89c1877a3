"""Probe: voxel_map insert/knn algorithm variants on the chip.

Compares the shipped (N+B)-sized stable-argsort insert against a merge-based
insert (sort only the B batch, binary-search ranks into the sorted pool), and
knn's searchsorted method ('sort' co-sorting vs 'scan' binary search).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tc2li_slam_tpu.ops import voxel_map as vm


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def devtime(name, fn, n=10, reps=3):
    out = fn()
    _fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:<52}{best * 1e3:>9.2f} ms", flush=True)
    return best * 1e3


@jax.jit
def insert_merge(m, pts, valid):
    B = pts.shape[0]
    N = m.capacity
    keys0 = jnp.where(valid, vm.point_keys(m, pts), vm.EMPTY_KEY)
    order_b = jnp.argsort(keys0, stable=True)
    bk = keys0[order_b]
    bp = pts[order_b]
    dup_b = jnp.concatenate(
        [jnp.zeros((1,), bool), bk[1:] == bk[:-1]]) & (bk != vm.EMPTY_KEY)
    pos = jnp.searchsorted(m.keys, bk).astype(jnp.int32)
    present = m.keys[jnp.clip(pos, 0, N - 1)] == bk
    keep_b = (bk != vm.EMPTY_KEY) & ~dup_b & ~present
    # compact survivors (order-preserving -> stays sorted)
    rank_c = jnp.cumsum(keep_b.astype(jnp.int32)) - 1
    n_keep = rank_c[-1] + 1
    idx_c = jnp.where(keep_b, rank_c, B)
    bk_c = jnp.full((B + 1,), vm.EMPTY_KEY, jnp.int32).at[idx_c].set(
        jnp.where(keep_b, bk, vm.EMPTY_KEY))[:B]
    bp_c = jnp.zeros((B + 1, 3), jnp.float32).at[idx_c].set(bp)[:B]
    # merged rank of each map element / each batch element
    rank_m = jnp.arange(N, dtype=jnp.int32) + jnp.searchsorted(
        bk_c, m.keys, side="left").astype(jnp.int32)
    rank_b = jnp.arange(B, dtype=jnp.int32) + jnp.searchsorted(
        m.keys, bk_c, side="left").astype(jnp.int32)
    m_valid = m.keys != vm.EMPTY_KEY
    b_valid = jnp.arange(B) < n_keep
    idx_m = jnp.where(m_valid & (rank_m < N), rank_m, N)
    idx_b = jnp.where(b_valid & (rank_b < N), rank_b, N)
    out_keys = jnp.full((N + 1,), vm.EMPTY_KEY, jnp.int32)
    out_keys = out_keys.at[idx_m].set(jnp.where(m_valid, m.keys, vm.EMPTY_KEY))
    out_keys = out_keys.at[idx_b].set(jnp.where(b_valid, bk_c, vm.EMPTY_KEY))
    out_pts = jnp.zeros((N + 1, 3), jnp.float32)
    out_pts = out_pts.at[idx_m].set(m.points)
    out_pts = out_pts.at[idx_b].set(bp_c)
    count = jnp.minimum(jnp.sum(m_valid) + n_keep, N).astype(jnp.int32)
    return m._replace(points=out_pts[:N], keys=out_keys[:N], count=count)


def knn_scan(m, queries, k=5, radius=1):
    """knn with binary-search searchsorted instead of method='sort'."""
    Q = queries.shape[0]
    W = 2 * radius + 1
    cols = vm._column_offsets(radius)
    qidx = vm.voxel_indices(m, queries)
    col_idx = qidx[:, None, :2] + cols[None, :, :]
    z_lo = jnp.clip(qidx[:, 2] - radius, 0, vm.GRID_SIZE - 1)
    z_hi = jnp.clip(qidx[:, 2] + radius, 0, vm.GRID_SIZE - 1)
    lo3 = jnp.concatenate(
        [col_idx, jnp.broadcast_to(z_lo[:, None, None], (Q, cols.shape[0], 1))],
        axis=-1,
    )
    key_lo = vm.pack_key(lo3)
    key_hi = key_lo + (z_hi - z_lo)[:, None]
    pos0 = jnp.searchsorted(m.keys, key_lo.reshape(-1)).reshape(
        key_lo.shape).astype(jnp.int32)
    run = jnp.arange(W, dtype=jnp.int32)
    cand_pos = jnp.clip(pos0[..., None] + run, 0, m.capacity - 1).reshape(Q, -1)
    cand_keys = m.keys[cand_pos]
    lo_b = jnp.repeat(key_lo, W, axis=-1)
    hi_b = jnp.repeat(key_hi, W, axis=-1)
    cand_valid = (
        (cand_keys >= lo_b) & (cand_keys <= hi_b)
        & (cand_keys != vm.EMPTY_KEY) & (lo_b != vm.EMPTY_KEY)
    )
    cand_pts = m.points[cand_pos]
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_valid, d2, jnp.inf)
    neg_d2, sel = jax.lax.top_k(-d2, k)
    dists = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    sel_pts = jnp.take_along_axis(cand_pts, sel[..., None], axis=1)
    sel_valid = jnp.take_along_axis(cand_valid, sel, axis=1)
    return dists, sel_pts, sel_valid


def main():
    rng = np.random.default_rng(0)
    cap = 1 << 19
    m = vm.create(cap, 0.5)
    pts = jnp.asarray(rng.uniform(-80, 80, (1 << 17, 3)), jnp.float32)
    val = jnp.ones(1 << 17, bool)
    m = vm.insert(m, pts, val)
    _fetch(m.keys)
    print(f"map count after seed: {int(m.count)}")

    b = 1 << 15
    newp = jnp.asarray(rng.uniform(-80, 80, (b, 3)), jnp.float32)
    newv = jnp.ones(b, bool)

    # correctness: oracle compare
    m_old = vm.insert(m, newp, newv)
    m_new = insert_merge(m, newp, newv)
    k_old = np.asarray(m_old.keys)
    k_new = np.asarray(m_new.keys)
    same_keys = np.array_equal(np.sort(k_old), np.sort(k_new))
    print(f"insert_merge keys match old insert: {same_keys} "
          f"(old count {int(m_old.count)}, new count {int(m_new.count)})")
    if not same_keys:
        d1 = set(k_old.tolist()) - set(k_new.tolist())
        d2 = set(k_new.tolist()) - set(k_old.tolist())
        print(f"  old-only {len(d1)}, new-only {len(d2)}")
    # points associated with keys must match too
    po = np.asarray(m_old.points)[np.argsort(k_old)]
    pn = np.asarray(m_new.points)[np.argsort(k_new)]
    print(f"points match: {np.allclose(po, pn)}")
    # sorted invariant
    print(f"new keys sorted: {bool(np.all(np.diff(k_new.astype(np.int64)) >= 0))}")

    devtime("insert OLD (N+B argsort) 32k->512k", lambda: vm.insert(m, newp, newv), n=5)
    devtime("insert MERGE 32k->512k", lambda: insert_merge(m, newp, newv), n=5)

    q = jnp.asarray(rng.uniform(-40, 40, (2000, 3)), jnp.float32)
    f_knn_sort = jax.jit(lambda: vm.knn(m, q, k=5, radius=3))
    f_knn_scan = jax.jit(lambda: knn_scan(m, q, k=5, radius=3))
    o1 = f_knn_sort()
    o2 = f_knn_scan()
    print(f"knn match: {np.allclose(np.asarray(o1[0]), np.asarray(o2[0]), equal_nan=True)}")
    devtime("knn 2000q r=3 (method=sort)", f_knn_sort, n=5)
    devtime("knn 2000q r=3 (binary scan)", f_knn_scan, n=5)
    # also radius 2 (the KF-path compacted query shape)
    q512 = q[:512]
    f_k2s = jax.jit(lambda: vm.knn(m, q512, k=5, radius=2))
    f_k2b = jax.jit(lambda: knn_scan(m, q512, k=5, radius=2))
    devtime("knn 512q r=2 (method=sort)", f_k2s, n=5)
    devtime("knn 512q r=2 (binary scan)", f_k2b, n=5)


if __name__ == "__main__":
    main()
