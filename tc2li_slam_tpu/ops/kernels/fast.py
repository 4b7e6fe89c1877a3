"""Pallas FAST-16 segment-test score kernel.

The XLA reference path (``ops.orb.fast_score``) materializes a [16, H, W]
neighbor-difference stack and a [9, 16, H, W] run stack — ~140 HBM-resident
copies of the image per level that XLA only partially fuses. This kernel
streams row slabs through VMEM and evaluates the full 16-run segment test
in registers: the only HBM traffic is 7 row-shifted views of the level in
and one score map out.

Mosaic requires dynamic sublane (row) offsets to be 8-aligned, so the +/-3
row shifts of the FAST circle are hoisted into a [7, H, W] stacked input
built with static XLA slices; inside the kernel every index is static and
the column shifts are static lane offsets.

Semantics match ``ORBextractor``'s FAST + score exactly (reference
``slam_framework/src/ORBextractor.cc``, OpenCV FAST-9/16): score at a pixel
is the max over the 16 circular 9-runs of min(|neighbor - center|),
restricted to runs that are uniformly brighter or darker by > threshold;
non-corners score 0. Border handling (radius-3 ring + the detection margin)
is applied by the caller, identically to the XLA path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST circle (dx, dy), radius 3, cv2 ordering — keep in sync with ops.orb.
_FAST_OFFS = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    np.int32,
)

_TILE = 16  # output rows per grid step (keeps the 16-diff live set in VMEM)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fast_kernel(rows_ref, out_ref, *, thr: float, w_out: int):
    """One _TILE-row slab of the score map.

    rows_ref: [7, _TILE, W_img] — plane d holds the level shifted down by
    (d - 3) rows, so plane 3 is the centers; output col c reads image col
    c + 3 (3-px left pad).
    out_ref: [_TILE, w_out] block.
    """
    ctr = rows_ref[3, :, 3 : 3 + w_out]

    # 16 neighbor differences; static plane + static lane offsets only.
    dpos = []
    for dx, dy in _FAST_OFFS:
        nbr = rows_ref[int(dy) + 3, :, 3 + int(dx) : 3 + int(dx) + w_out]
        dpos.append(nbr - ctr)

    neg_inf = jnp.float32(-jnp.inf)
    sb = jnp.full(ctr.shape, neg_inf)
    sd = jnp.full(ctr.shape, neg_inf)
    for start in range(16):
        run_p = dpos[start]
        run_n = -dpos[start]
        for j in range(1, 9):
            d = dpos[(start + j) % 16]
            run_p = jnp.minimum(run_p, d)
            run_n = jnp.minimum(run_n, -d)
        sb = jnp.maximum(sb, run_p)
        sd = jnp.maximum(sd, run_n)

    score = jnp.maximum(sb, sd)
    out_ref[:] = jnp.where(score > thr, score, 0.0) if thr > 0.0 else score


def fast_score_pallas(
    img: jax.Array, threshold: float, interpret: bool | None = None
) -> jax.Array:
    """FAST-16 score map [H, W] (0 where not a corner), Pallas path.

    Bit-identical to ``ops.orb.fast_score_xla`` away from the 3-px border
    ring (which both paths zero out).
    """
    f = img.astype(jnp.float32)
    h, w = f.shape
    w_out = _round_up(w, 128)
    n_tiles = -(-h // _TILE)
    h_pad = n_tiles * _TILE
    w_img = w_out + 128  # room for the 0..6 column shifts, lane-aligned

    # padded level: 3-px halo top/left, enough slack bottom/right
    padded = jnp.zeros((h_pad + 6, w_img), jnp.float32).at[3 : 3 + h, 3 : 3 + w].set(f)
    # plane d = rows shifted by (d - 3): plane 3 row r == image row r
    rows = jnp.stack([padded[d : d + h_pad] for d in range(7)], axis=0)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        partial(_fast_kernel, thr=float(threshold), w_out=w_out),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (7, _TILE, w_img), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_TILE, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_out), jnp.float32),
        interpret=interpret,
    )(rows)

    score = out[:h, :w]
    # kill the radius-3 border ring (neighbors fall into padding there)
    border = jnp.zeros((h, w), bool).at[3 : h - 3, 3 : w - 3].set(True)
    return jnp.where(border, score, 0.0)
