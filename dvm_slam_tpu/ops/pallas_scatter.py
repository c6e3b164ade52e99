"""Pallas TPU kernel: one-hot adjoint contraction (the BA "scatter").

Bundle adjustment assembles point-indexed blocks (H_pp, b_p, the camera-point
coupling W) from per-observation values — a scatter-add over the observation
-> point incidence. The TPU-native formulation is a one-hot matmul
(`vals [G,F] @ onehot(pidx) [F,P]` per camera row), but materializing the
one-hot in HBM costs L*F*P*4 bytes PER LM ITERATION (~160 MB for a 20x512
window over 4096 points) and the solve becomes HBM-bound on re-reading it.

This kernel builds each one-hot tile on the fly in VMEM (an iota compare)
and feeds the MXU directly — HBM traffic drops to the operands
(L*G*F + L*G*P floats), ~100x less than the dense formulation, making the
BA iteration compute-bound.

Reference role: the g2o sparse-block-matrix assembly inside
`Optimizer::LocalBundleAdjustment` (`orb_slam3/src/Optimizer.cc:1030`) /
`BundleAdjustment` (`:48`) — g2o walks edge lists; we batch the adjoint.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TP = 512  # one-hot column tile (multiple of the 128-lane width)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _adjoint_kernel(pidx_ref, vals_ref, out_ref, *, dot_dtype):
    # blocks: pidx [1,1,F] i32, vals [1,G,F] f32, out [1,G,TP] f32
    j = pl.program_id(1)
    f = pidx_ref.shape[2]
    ids = jax.lax.broadcasted_iota(jnp.int32, (f, _TP), 1) + j * _TP
    pidx = pidx_ref[0, 0, :]                                   # [F]
    oh = (pidx[:, None] == ids).astype(dot_dtype)              # [F,TP] in VMEM
    # f32 operands must request HIGHEST precision: the MXU's DEFAULT f32
    # matmul is a single bf16 pass (~1e-2 relative error — measured against
    # the XLA path on device); bf16 operands need DEFAULT (Mosaic rejects
    # the fp32-precision attribute on a bf16 lhs). Accumulation stays f32.
    prec = (jax.lax.Precision.DEFAULT if dot_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.dot(vals_ref[0].astype(dot_dtype), oh,
                         precision=prec,
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("n_cols", "interpret", "dot_dtype"))
def onehot_adjoint_pallas(vals, pidx, n_cols: int, interpret: bool = False,
                          dot_dtype: str = "float32"):
    """`out[l, g, p] = sum_f vals[l, g, f] * (pidx[l, f] == p)`.

    vals: [L,G,F] float32; pidx: [L,F] int32, negative = contributes nowhere.
    `dot_dtype="bfloat16"` runs the MXU contraction with bf16 operands and
    f32 accumulation (4x the f32 matmul rate; the one-hot is exact in bf16,
    the values round to 8 mantissa bits — an inexact-Newton step, residuals
    stay f32). Returns [L, G, n_cols] float32."""
    L, G, F = vals.shape
    Gp, Fp = _round_up(G, 8), _round_up(F, 128)
    Pp = _round_up(n_cols, _TP)
    if (Gp, Fp) != (G, F):
        vals = jnp.pad(vals, ((0, 0), (0, Gp - G), (0, Fp - F)))
        pidx = jnp.pad(pidx, ((0, 0), (0, Fp - F)), constant_values=-1)
    out = pl.pallas_call(
        partial(_adjoint_kernel, dot_dtype=jnp.dtype(dot_dtype)),
        grid=(L, Pp // _TP),
        in_specs=[
            # [L,1,F]: the middle singleton keeps the last-two-dims tiling
            # constraint satisfied (block dims must divide (8,128) or equal
            # the array dims)
            pl.BlockSpec((1, 1, Fp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp, Fp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Gp, _TP), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Gp, Pp), jnp.float32),
        interpret=interpret,
    )(pidx[:, None, :], vals)
    return out[:, :G, :n_cols]


def _gather_kernel(pidx_ref, pts_ref, out_ref):
    # blocks: pidx [1,1,F] i32, pts [G,TP] f32 (tile j), out [1,G,F] f32
    j = pl.program_id(1)
    f = pidx_ref.shape[2]
    pidx = pidx_ref[0, 0, :]                                   # [F]
    ids = jax.lax.broadcasted_iota(jnp.int32, (_TP, f), 0) + j * _TP
    ohT = (ids == pidx[None, :]).astype(jnp.float32)           # [TP,F]
    # f32 operands need an explicit HIGHEST: the MXU's default f32 matmul
    # is a single bf16 pass (~1e-2 rel error) — point coordinates must come
    # back exact (same rule as _adjoint_kernel above).
    part = jnp.dot(pts_ref[:], ohT, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[0] = part

    @pl.when(j > 0)
    def _():
        out_ref[0] = out_ref[0] + part


@partial(jax.jit, static_argnames=("interpret",))
def onehot_gather_pallas(pts_pl, pidx, interpret: bool = False):
    """`out[l, g, f] = pts_pl[g, pidx[l, f]]` (0 where pidx < 0).

    pts_pl: [G,P] plane-major table; pidx: [L,F] int32. The row-gather XLA
    emits for `pts[pidx]` profiled at ~25% of a whole BA iteration; as a
    one-hot matmul with tiles built in VMEM it rides the MXU instead.
    Returns [L, G, F] float32."""
    G, P = pts_pl.shape
    L, F = pidx.shape
    Gp, Fp = _round_up(G, 8), _round_up(F, 128)
    Pp = _round_up(P, _TP)
    if (Gp, Pp) != (G, P):
        pts_pl = jnp.pad(pts_pl, ((0, Gp - G), (0, Pp - P)))
    if Fp != F:
        pidx = jnp.pad(pidx, ((0, 0), (0, Fp - F)), constant_values=-1)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(L, Pp // _TP),
        in_specs=[
            pl.BlockSpec((1, 1, Fp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, _TP), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Gp, Fp), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Gp, Fp), jnp.float32),
        interpret=interpret,
    )(pidx[:, None, :], pts_pl)
    return out[:, :G, :F]


def onehot_gather(pts_pl, pidx):
    """Shape-aware dispatch. At the production BA shape (G=3 planes,
    L=20 x F=512 from a [3,4096] table, batch 8 under vmap) the Pallas
    kernel is LATENCY-bound — 8x20x8 = 1280 grid cells of ~3-row matmuls —
    and the honest microbenchmark (benchmarks/ba_stage_profile2.py, full
    output consumed, TPU v5e) measured 12.5 ms vs 5.6 ms for XLA's row
    gather over 11 iterations x batch 8. The one-hot MXU formulation only
    pays off once G fills MXU rows; until a call site has G >= 64 the row
    gather is the fast path everywhere."""
    G = pts_pl.shape[0]
    if jax.default_backend() == "tpu" and G >= 64:
        return onehot_gather_pallas(pts_pl, pidx)
    safe = jnp.clip(pidx, 0)
    g = jnp.moveaxis(pts_pl[:, safe], 0, 1)                    # [L,G,F]
    return jnp.where(pidx[:, None, :] >= 0, g, 0.0)


def onehot_adjoint_xla(vals, pidx, n_cols: int, dot_dtype: str = "float32"):
    """Reference XLA formulation (dense one-hot in HBM) — numerically
    identical; used on CPU and as the equivalence oracle for the kernel."""
    dt = jnp.dtype(dot_dtype)
    oh = (
        pidx[..., None] == jnp.arange(n_cols, dtype=jnp.int32)
    ).astype(dt)                                                # [L,F,P]
    return jax.lax.dot_general(
        vals.astype(dt), oh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST),
    )


def onehot_adjoint(vals, pidx, n_cols: int, dot_dtype: str = "float32"):
    """Shape-aware dispatch. At the production BA shape (G=30 value planes,
    L=20, F=512, P=4096, batch 8 under vmap) the Pallas kernel's grid is
    1280 cells of 30-row matmuls — latency-bound at ~23% MXU row
    utilization; the honest microbenchmark (benchmarks/ba_stage_profile2.py,
    full output consumed, TPU v5e) measured 11.7 ms vs 7.6 ms for the XLA
    dense-one-hot dot over 11 iterations x batch 8 (XLA fuses the iota
    compare into the contraction operand; the [L,F,P] one-hot is transient).
    The VMEM-tile kernel wins once G fills MXU rows — kept for G >= 128 and
    as the verified-equivalence oracle (bench.py pallas_verified)."""
    G = vals.shape[1]
    if jax.default_backend() == "tpu" and G >= 128:
        return onehot_adjoint_pallas(vals, pidx, n_cols, dot_dtype=dot_dtype)
    return onehot_adjoint_xla(vals, pidx, n_cols, dot_dtype=dot_dtype)
