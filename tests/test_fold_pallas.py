"""fold_build_pallas == build_mip_fold_table (value and VJP).

The Pallas kernel is a copy-shaped re-expression of the slice-stack
fold (ops/mip_encoding.build_mip_fold_table); these tests pin value
and gradient equality on a small F so the TPU measurement
(scripts/bench_fold_pallas.py) is a pure performance question."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.ops.pallas.fold_build import fold_build_pallas

F = 8
CD = 16


def _xla_fold(V, F, Cd):
    """build_mip_fold_table's slice-stack on a raw volume."""
    V4 = V.reshape(F + 1, F + 1, F + 1, Cd)
    bits = [(k & 1, (k >> 1) & 1, (k >> 2) & 1) for k in range(8)]
    corners = [V4[bx:bx + F, by:by + F, bz:bz + F] for bx, by, bz in bits]
    return jnp.stack(corners, axis=3).reshape(F ** 3, 8 * Cd)


@pytest.fixture(scope="module")
def V():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=((F + 1) ** 3, CD)), jnp.float32)


def test_forward_matches_slice_stack(V):
    got = fold_build_pallas(V, F, CD)
    want = _xla_fold(V, F, CD)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vjp_matches_autodiff(V):
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=(F ** 3, 8 * CD)), jnp.float32)

    _, vjp_p = jax.vjp(lambda v: fold_build_pallas(v, F, CD), V)
    _, vjp_x = jax.vjp(lambda v: _xla_fold(v, F, CD), V)
    (dp,) = vjp_p(ct)
    (dx,) = vjp_x(ct)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                               rtol=1e-6, atol=1e-6)


def test_bf16_round_trip(V):
    """The training path runs the fold in bf16; value equality must hold
    there too (pure copies — no arithmetic in the forward)."""
    Vb = V.astype(jnp.bfloat16)
    got = fold_build_pallas(Vb, F, CD)
    want = _xla_fold(Vb, F, CD)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got.astype(np.float32)),
        np.asarray(want.astype(np.float32)))


def test_grad_through_sum(V):
    """End-to-end grad through a scalar loss (the shape the trainer
    uses: fold -> gather -> loss)."""
    rows = jnp.asarray([0, 3, F ** 3 - 1, 17], jnp.int32)

    def loss_p(v):
        t = fold_build_pallas(v, F, CD)
        return jnp.sum(jnp.take(t, rows, axis=0) ** 2)

    def loss_x(v):
        t = _xla_fold(v, F, CD)
        return jnp.sum(jnp.take(t, rows, axis=0) ** 2)

    gp = jax.grad(loss_p)(V)
    gx = jax.grad(loss_x)(V)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-6, atol=1e-6)
