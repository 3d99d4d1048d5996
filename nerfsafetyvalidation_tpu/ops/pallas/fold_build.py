"""Copy-shaped Pallas kernel for the mip-fold cell-table build.

Role: the training step's dominant term is the in-graph fold rebuild
(ops/mip_encoding.build_mip_fold_table — stack the 8 shifted corner
slices of the materialized dense volume V [(F+1)^3, Cd] into cell rows
[F^3, 8*Cd]) plus its transpose in the backward. Both directions are
PURE DATA MOVEMENT: forward writes 537 MB (F=128, Cd=16, bf16) built
from 8 offset views of a 68 MB volume; backward sums 8 shifted slices
of the cotangent back into the volume. XLA emits them at ~43-47 ms fwd
/ ~24 ms bwd (BENCH_NOTES "round-4 step attribution"), ~30x off the
~1.5 ms HBM streaming bound — the stack axis produces an awkward
layout its copy emitter never flattens. These kernels express the same
slices as explicit VMEM block copies so Mosaic can pipeline them at
write bandwidth (BENCH_NOTES names this the one unmeasured training
route; scripts/bench_fold_pallas.py measures it).

Forward grid: one program per x-slab — reads V rows x and x+1 (the two
x-corner planes, passed as two offset views of the same array), writes
the fold block [F^2, 8*Cd] for that x. Backward grid: (x, bx) — the
dV slab x accumulates the bx=0 corner contributions from cotangent
slab x, then the bx=1 contributions from slab x-1 (the standard
revisited-output accumulation pattern; boundary slabs mask the
out-of-range side).

Semantics target: bit-identical to build_mip_fold_table
(tests/test_fold_pallas.py), which itself is the exact piecewise-
trilinear fold of the reference's dense levels (gridencoder.cu:54-72
dense-until-overflow layout).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .fused_mlp import _HAS_PALLAS, _auto_interpret

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_BITS = [(k & 1, (k >> 1) & 1, (k >> 2) & 1) for k in range(8)]  # x fastest


def _fwd_kernel(vlo_ref, vhi_ref, out_ref, *, F, Cd):
    vlo = vlo_ref[0]                      # [F+1, (F+1)*Cd]
    vhi = vhi_ref[0]
    parts = []
    for bx, by, bz in _BITS:
        src = vhi if bx else vlo
        blk = src[by:by + F, bz * Cd:(bz + F) * Cd]     # [F, F*Cd]
        parts.append(blk.reshape(F, F, Cd))
    out_ref[:] = jnp.concatenate(parts, axis=-1).reshape(F * F, 8 * Cd)


def _bwd_kernel(ct_ref, out_ref, *, F, Cd):
    """dV[x, y+by, z+bz, :] += ct[x-bx, y, z, k] over the 8 corners k.
    Pass bx = program_id(1) handles the 4 corners with that x-bit; the
    dV slab is written on bx=0 and accumulated on bx=1 (revisited output
    block). ct_ref holds cotangent slab clip(x-bx, 0, F-1); the clamp is
    masked out at the boundary slabs."""
    x = pl.program_id(0)
    bx = pl.program_id(1)
    ct = ct_ref[:]                        # [F*F, 8*Cd] slab (clamped idx)

    # valid slab: bx=0 needs x <= F-1 (ct slab x), bx=1 needs x >= 1
    valid = jnp.where(bx == 0, x <= F - 1, x >= 1)
    scale = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)

    acc = jnp.zeros((F + 1, (F + 1) * Cd), jnp.float32)
    for k, (kbx, by, bz) in enumerate(_BITS):
        # select the 4 corners whose x-bit matches this pass
        pass_match = jnp.where(bx == kbx, 1.0, 0.0).astype(jnp.float32)
        piece = ct[:, k * Cd:(k + 1) * Cd].astype(jnp.float32)
        piece = piece.reshape(F, F * Cd) * (scale * pass_match)
        acc = acc.at[by:by + F, bz * Cd:(bz + F) * Cd].add(piece)

    @pl.when(bx == 0)
    def _():
        out_ref[0] = acc.astype(out_ref.dtype)

    @pl.when(bx == 1)
    def _():
        out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("F", "Cd", "interpret"))
def _fold_fwd(V2, F, Cd, interpret=False):
    return pl.pallas_call(
        partial(_fwd_kernel, F=F, Cd=Cd),
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, F + 1, (F + 1) * Cd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F + 1, (F + 1) * Cd), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F * F, 8 * Cd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F ** 3, 8 * Cd), V2.dtype),
        interpret=interpret,
    )(V2, V2)


@partial(jax.jit, static_argnames=("F", "Cd", "dtype", "interpret"))
def _fold_bwd(ct, F, Cd, dtype, interpret=False):
    return pl.pallas_call(
        partial(_bwd_kernel, F=F, Cd=Cd),
        grid=(F + 1, 2),
        in_specs=[
            pl.BlockSpec(
                (F * F, 8 * Cd),
                lambda i, j: (jnp.clip(i - j, 0, F - 1), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F + 1, (F + 1) * Cd),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F + 1, F + 1, (F + 1) * Cd), dtype),
        interpret=interpret,
    )(ct)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fold_build_pallas(V, F, Cd, interpret=None):
    """V [(F+1)^3, Cd] -> fold table [F^3, 8*Cd] (build_mip_fold_table
    semantics) as a copy-shaped Pallas kernel with a Pallas transpose.

    interpret=None auto-selects (real kernel on TPU-class backends,
    interpreter elsewhere — fused_mlp._auto_interpret)."""
    if interpret is None:
        interpret = _auto_interpret()
    V2 = V.reshape(F + 1, F + 1, (F + 1) * Cd)
    return _fold_fwd(V2, F, Cd, interpret=interpret)


def _fold_build_fwd(V, F, Cd, interpret):
    return fold_build_pallas(V, F, Cd, interpret), None


def _fold_build_bwd(F, Cd, interpret, _res, ct):
    if interpret is None:
        interpret = _auto_interpret()
    dV2 = _fold_bwd(ct, F, Cd, ct.dtype, interpret=interpret)
    return (dV2.reshape((F + 1) ** 3, Cd),)


fold_build_pallas.defvjp(_fold_build_fwd, _fold_build_bwd)
