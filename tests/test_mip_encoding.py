"""Mip-fold encoder (flagship TPU backbone) correctness tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.ops.mip_encoding import (
    MipFoldSpec, mip_fold_init, mip_fold_encode, build_mip_fold_table,
    materialize_dense, _upsample_axis)


@pytest.fixture(scope="module")
def small_spec():
    return MipFoldSpec(pyramid_scales=(4, 8, 16), pyramid_channels=2,
                       mip_scales=(32, 64), mip_channels=2,
                       log2_hashmap_size=10)


def _trilinear_ref(grid, s, u):
    """Brute-force trilinear of grid [(s+1)^3, c] at u [N, 3] in [0,1]."""
    pos = u * s
    cell = np.clip(np.floor(pos), 0, s - 1)
    frac = pos - cell
    out = 0.0
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                c = cell + [bx, by, bz]
                idx = ((c[:, 0] * (s + 1) + c[:, 1]) * (s + 1)
                       + c[:, 2]).astype(int)
                w = (np.where(bx, frac[:, 0], 1 - frac[:, 0])
                     * np.where(by, frac[:, 1], 1 - frac[:, 1])
                     * np.where(bz, frac[:, 2], 1 - frac[:, 2]))
                out = out + w[:, None] * np.asarray(grid)[idx]
    return out


def test_upsample_is_exact_interpolation(small_spec):
    """Upsampled grid points must equal the coarse trilinear interpolant."""
    rng = np.random.default_rng(0)
    s, f = 4, 4
    g = jnp.asarray(rng.normal(size=((s + 1) ** 3, 2)), dtype=jnp.float32)
    v = g.reshape(s + 1, s + 1, s + 1, 2)
    up = _upsample_axis(_upsample_axis(_upsample_axis(v, f, 0), f, 1), f, 2)
    F = s * f
    pts = np.stack(np.meshgrid(*[np.arange(F + 1)] * 3, indexing="ij"),
                   -1).reshape(-1, 3) / F
    ref = _trilinear_ref(g, s, pts)
    np.testing.assert_allclose(np.asarray(up).reshape(-1, 2), ref,
                               rtol=1e-5, atol=1e-6)


def test_dense_part_matches_pyramid_interpolation(small_spec):
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec, std=0.5)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    u = (x + 1) / 2
    out = np.asarray(mip_fold_encode(params, jnp.asarray(x), spec))
    # dense channels = concat of each pyramid level's trilinear field
    col = 0
    for g, s in zip(params["encoder"]["pyramid"]
                    if "pyramid" not in params else params["pyramid"],
                    spec.pyramid_scales):
        ref = _trilinear_ref(g, s, u)
        np.testing.assert_allclose(out[:, col:col + 2], ref, rtol=1e-4,
                                   atol=1e-5)
        col += 2


def test_folded_inference_exact(small_spec):
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec, std=0.5)
    fold = build_mip_fold_table(params, spec, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (512, 3)), dtype=jnp.float32)
    x = jnp.concatenate([x, jnp.asarray([[1.0, 1.0, 1.0],
                                         [-1.0, -1.0, -1.0]])])
    a = mip_fold_encode(params, x, spec)
    b = mip_fold_encode(params, x, spec, fold_table=fold)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_mip_levels_share_row_but_interpolate_per_level(small_spec):
    """Within one key cell the mip output must be continuous and vary with
    position (per-level fracs), and OOB points are zeroed."""
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(1), spec, std=0.5)
    # two nearby points in the same finest cell
    base = np.asarray([0.1234, -0.3, 0.42], dtype=np.float32)
    eps = 0.4 / spec.mip_scales[-1]
    x = jnp.asarray([base, base + eps])
    out = np.asarray(mip_fold_encode(params, x, spec))
    dc = spec.dense_channels
    assert not np.allclose(out[0, dc:], out[1, dc:])  # frac actually used
    oob = mip_fold_encode(params, jnp.asarray([[1.2, 0, 0]]), spec)
    assert np.all(np.asarray(oob) == 0)


def test_gradients_reach_all_pyramid_levels(small_spec):
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (64, 3)),
                    dtype=jnp.float32)

    def loss(p):
        return jnp.sum(mip_fold_encode(p, x, spec) ** 2)

    g = jax.grad(loss)(params)
    for gl in g["pyramid"]:
        assert float(jnp.abs(gl).max()) > 0
    assert float(jnp.abs(g["hash"]).max()) > 0


def test_network_mip_density_and_fold():
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import make_network

    cfg = NetworkConfig(encoding="mipfold", bound=1.0, num_levels=5,
                        level_dim=2, base_resolution=4, fold_max_scale=16,
                        log2_hashmap_size=10)
    net = make_network(cfg)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (128, 3)),
                    dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 128)
    sigma, rgb = net.apply(params, x, d)
    assert sigma.shape == (128,) and rgb.shape == (128, 3)
    folded = net.to_folded(params)
    s2, r2 = net.apply(folded, x, d)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(r2),
                               rtol=1e-4, atol=1e-5)

@pytest.mark.parametrize("mode", ["pair", "quad", "cube", "foldrow",
                                  "foldrow_pallas"])
def test_train_gather_modes_match_corner8(small_spec, mode):
    """Every corner-fetch strategy (config.train_gather) must reproduce the
    corner8 baseline's outputs AND parameter gradients — they differ only
    in how many gather rows are issued per sample."""
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec, std=0.5)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 3)), dtype=jnp.float32)
    x = jnp.concatenate([x, jnp.asarray([[1.0, 1.0, 1.0],
                                         [-1.0, -1.0, -1.0],
                                         [1.2, 0.0, 0.0]])])   # edges + OOB

    ref = mip_fold_encode(params, x, spec, train_gather="corner8")
    out = mip_fold_encode(params, x, spec, train_gather=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    w = jnp.asarray(rng.normal(size=ref.shape), dtype=jnp.float32)

    def loss(p, m):
        return jnp.sum(mip_fold_encode(p, x, spec, train_gather=m) * w)

    g_ref = jax.grad(lambda p: loss(p, "corner8"))(params)
    g = jax.grad(lambda p: loss(p, mode))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_foldrow_input_gradients(small_spec):
    """foldrow's custom VJP (ops/mip_encoding.foldrow_dense_blend) must
    return exact position gradients too — the planner differentiates
    density w.r.t. positions, so the w8 cotangent cannot be dropped.
    Checked against corner8 autodiff and central finite differences."""
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec, std=0.5)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-0.95, 0.95, (64, 3)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, spec.output_dim)),
                    dtype=jnp.float32)

    def loss(xx, mode):
        return jnp.sum(mip_fold_encode(params, xx, spec,
                                       train_gather=mode) * w)

    gx = jax.grad(lambda xx: loss(xx, "foldrow"))(x)
    gx_ref = jax.grad(lambda xx: loss(xx, "corner8"))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    eps = 1e-4
    for d in range(3):
        xp = x.at[3, d].add(eps)
        xm = x.at[3, d].add(-eps)
        fd = (loss(xp, "foldrow") - loss(xm, "foldrow")) / (2 * eps)
        np.testing.assert_allclose(float(gx[3, d]), float(fd),
                                   rtol=5e-3, atol=1e-3)


def test_fold_scale_reduced_resolution(small_spec):
    """fold_scale (progressive fold resolution, trainer warmup knob):
    the dense part is materialized/encoded at the reduced scale — exact
    strided grid-point sampling of the finer pyramid grids — with the
    SAME parameter pytree, and at fold_scale == native F it is exactly
    the native encode."""
    from dataclasses import replace
    spec = small_spec
    params = mip_fold_init(jax.random.PRNGKey(0), spec, std=0.5)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 3)), dtype=jnp.float32)

    # fold_scale = native F is a no-op
    spec_same = replace(spec, fold_scale=spec.F_native)
    out_native = mip_fold_encode(params, x, spec)
    np.testing.assert_allclose(
        np.asarray(mip_fold_encode(params, x, spec_same)),
        np.asarray(out_native), rtol=1e-6, atol=1e-7)

    # reduced scale: dense part equals brute-force trilinear of the
    # STRIDED volume at that scale; hash part is untouched
    spec_red = replace(spec, fold_scale=8)
    out_red = mip_fold_encode(params, x, spec_red)
    assert out_red.shape == out_native.shape
    n_mip = len(spec.mip_scales) * spec.mip_channels
    np.testing.assert_allclose(
        np.asarray(out_red[:, -n_mip:]), np.asarray(out_native[:, -n_mip:]),
        rtol=1e-6, atol=1e-7)
    P = np.asarray(materialize_dense(params, spec_red))
    u = (np.asarray(x) + 1.0) / 2.0
    want = _trilinear_ref(P, 8, u)
    np.testing.assert_allclose(
        np.asarray(out_red[:, :spec.dense_channels]), want,
        rtol=1e-4, atol=1e-5)

    # grads flow to every pyramid grid (incl. the strided finest one)
    g = jax.grad(lambda p: jnp.sum(
        mip_fold_encode(p, x, spec_red) ** 2))(params)
    for gr in g["pyramid"]:
        assert np.isfinite(np.asarray(gr)).all()
    assert any(float(jnp.abs(gr).sum()) > 0 for gr in g["pyramid"])
