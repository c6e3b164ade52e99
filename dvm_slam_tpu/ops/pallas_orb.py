"""Pallas TPU kernel: fused per-keypoint orientation + steered rBRIEF.

The per-keypoint stage of the ORB front end is random-access dominated
(31x31 patch reads + 512 rotated pattern samples per keypoint) — the one
part of the pipeline XLA's gather lowering handles worst. This kernel fuses
it: one program per keypoint DMAs its raw and blurred patches into VMEM,
computes the intensity-centroid angle on the VPU, rotates the 256 BRIEF test
pairs, and resolves all 512 patch samples as ONE one-hot matmul on the MXU
(the TPU-native replacement for a scatter/gather: sample = onehot(idx) @
patch.flat).

Numerically identical to the XLA reference path in ops/orb_descriptor.py
(same rounding, same pattern); equivalence is tested in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import orb_descriptor as od

PATCH = 31           # orientation patch (radius 15)
HALF = 15
BHALF = 19           # BRIEF sampling radius: rotated +-13 offsets reach
BPATCH = 39          # ceil(13*sqrt(2)) = 19 (the reference's EDGE_THRESHOLD)


def _constants():
    # constants live on the BPATCH grid; the orientation mask is the 31x31
    # circular mask embedded centrally (zero ring outside radius 15)
    mask31 = od._circular_mask_rows().astype(np.float32)    # [31,31]
    mask = np.zeros((BPATCH, BPATCH), np.float32)
    o = BHALF - HALF
    mask[o:o + PATCH, o:o + PATCH] = mask31
    r = BHALF
    ys = np.arange(-r, r + 1, dtype=np.float32)[:, None] * np.ones((1, BPATCH), np.float32)
    xs = np.arange(-r, r + 1, dtype=np.float32)[None, :] * np.ones((BPATCH, 1), np.float32)
    pat = od.PATTERN.astype(np.float32)                     # [256,4]
    return mask, ys, xs, pat


_MASK, _YS, _XS, _PAT = _constants()


WIN_R = 48    # row window: 39 + up to 7 alignment slack, multiple of 8
WIN_C = 256   # col window: 39 + up to 127 alignment slack, multiple of 128


def _kernel(xy_ref, raw_ref, blur_ref, mask_ref, ys_ref, xs_ref, pat_ref,
            mom_out, desc_out, raw_win, blur_win, sem):
    n = pl.program_id(0)
    cx = xy_ref[n, 0]
    cy = xy_ref[n, 1]

    # HBM slices must be (8,128)-tile aligned: DMA an aligned window that
    # contains the 39x39 patch, then extract it with one-hot row/column
    # selection matmuls (gather-free). Images arrive edge-padded by BHALF
    # (see wrapper), so the patch is always in-bounds and patch-local
    # sampling equals the XLA path's coordinate clipping.
    r0 = ((cy - BHALF) // 8) * 8
    c0 = ((cx - BHALF) // 128) * 128
    r0 = pl.multiple_of(r0, 8)
    c0 = pl.multiple_of(c0, 128)
    dr = cy - BHALF - r0     # 0..7
    dc = cx - BHALF - c0     # 0..127

    cp1 = pltpu.make_async_copy(
        raw_ref.at[pl.ds(r0, WIN_R), pl.ds(c0, WIN_C)], raw_win, sem.at[0]
    )
    cp2 = pltpu.make_async_copy(
        blur_ref.at[pl.ds(r0, WIN_R), pl.ds(c0, WIN_C)], blur_win, sem.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BPATCH, WIN_R), 1)
    rowsel = (rows == (jax.lax.broadcasted_iota(jnp.int32, (BPATCH, WIN_R), 0) + dr)).astype(jnp.float32)
    colsI = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, BPATCH), 0)
    colsel = (colsI == (jax.lax.broadcasted_iota(jnp.int32, (WIN_C, BPATCH), 1) + dc)).astype(jnp.float32)

    def extract(win_ref):
        a = jax.lax.dot_general(
            rowsel, win_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [39, WIN_C]
        return jax.lax.dot_general(
            a, colsel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [39,39]

    raw_patch = extract(raw_win)
    blur_patch = extract(blur_win)

    # --- intensity-centroid orientation (IC_Angle) on the raw patch ----
    pm = raw_patch * mask_ref[:]
    m01 = jnp.sum(pm * ys_ref[:])
    m10 = jnp.sum(pm * xs_ref[:])
    # VMEM stores must be vector-wide: broadcast the two moments over a
    # 256-lane row ([:128] = m01, [128:] = m10), unpacked by the wrapper
    lane = jax.lax.broadcasted_iota(jnp.int32, (256,), 0)
    mom_out[n, :] = jnp.where(lane < 128, m01, m10)

    # --- steered BRIEF on the blurred patch -----------------------------
    # cos/sin straight from the moments (atan2 has no Mosaic lowering; it
    # also isn't needed — steering only uses the direction)
    rlen = jnp.sqrt(m01 * m01 + m10 * m10)
    safe = rlen > 1e-9
    inv = jnp.where(safe, 1.0 / jnp.where(safe, rlen, 1.0), 0.0)
    ca = jnp.where(safe, m10 * inv, 1.0)
    sa = jnp.where(safe, m01 * inv, 0.0)
    px1, py1 = pat_ref[:, 0], pat_ref[:, 1]
    px2, py2 = pat_ref[:, 2], pat_ref[:, 3]

    def sample(px, py):
        # rotated integer offsets (same rounding as the XLA path), then a
        # row/column one-hot "gather as two matmuls":
        #   v[s] = sum_j (rowOH @ patch)[s, j] * colOH[s, j]
        rx = jnp.round(px * ca - py * sa).astype(jnp.int32) + BHALF  # [256]
        ry = jnp.round(px * sa + py * ca).astype(jnp.int32) + BHALF
        rows = jax.lax.broadcasted_iota(jnp.int32, (256, BPATCH), 1)
        row_oh = (rows == ry[:, None]).astype(jnp.float32)    # [256,39]
        col_oh = (rows == rx[:, None]).astype(jnp.float32)
        picked = jax.lax.dot_general(
            row_oh, blur_patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                      # [256,39]
        return jnp.sum(picked * col_oh, axis=1)                # [256]

    v1 = sample(px1, py1)
    v2 = sample(px2, py2)
    desc_out[n, :] = (v1 < v2).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def orient_and_describe(img_raw, img_blur, xy, interpret: bool = False):
    """Fused orientation + descriptors for all keypoints of one level.

    Args: img_raw/img_blur [H,W] f32, xy [N,2] f32 level coords.
    Returns (angle [N] f32, desc [N,256] uint8)."""
    h, w = img_raw.shape
    n = xy.shape[0]
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), HALF, w - HALF - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), HALF, h - HALF - 1)
    # Edge-pad by BHALF: patch-local BRIEF sampling in the padded image is
    # then bit-identical to the XLA path's clip-to-image-bounds sampling
    # (clipping == edge replication), and every radius-19 patch is in-bounds
    # even for keypoints at the detection border (BORDER=16 < BHALF=19).
    xy_i = jnp.stack([cx + BHALF, cy + BHALF], axis=-1)
    img_raw = jnp.pad(img_raw, BHALF, mode="edge")
    img_blur = jnp.pad(img_blur, BHALF, mode="edge")
    h2, w2 = h + 2 * BHALF, w + 2 * BHALF
    # zero-pad so every aligned DMA window stays in bounds
    hp = ((h2 + 7) // 8) * 8 + WIN_R
    wp = ((w2 + 127) // 128) * 128 + WIN_C
    img_raw = jnp.pad(img_raw, ((0, hp - h2), (0, wp - w2)))
    img_blur = jnp.pad(img_blur, ((0, hp - h2), (0, wp - w2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # raw image (DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),   # blurred image
            pl.BlockSpec(memory_space=pltpu.VMEM),  # circular mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ys
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pattern
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN_R, WIN_C), jnp.float32),
            pltpu.VMEM((WIN_R, WIN_C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mom, desc = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 256), jnp.float32),
            jax.ShapeDtypeStruct((n, 256), jnp.float32),
        ),
        interpret=interpret,
    )(xy_i, img_raw, img_blur, jnp.asarray(_MASK), jnp.asarray(_YS),
      jnp.asarray(_XS), jnp.asarray(_PAT))
    angle = jnp.arctan2(mom[:, 0], mom[:, 128])
    return angle, desc.astype(jnp.uint8)
