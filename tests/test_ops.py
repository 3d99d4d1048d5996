"""Golden/property tests for the core ops (reference L0/L1 replacements)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsafetyvalidation_tpu.ops import (
    trunc_exp, freq_encode, freq_output_dim, sh_encode, sh_output_dim,
    HashGridSpec, hash_grid_init, hash_grid_encode,
    near_far_from_aabb, sph_from_ray, morton3d, morton3d_invert, packbits,
    composite_weights, composite_rays, sample_pdf,
    mape_loss, huber_loss, eff_distloss,
)
from nerfsafetyvalidation_tpu.ops.ray_ops import bitfield_lookup


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.array([-20.0, -1.0, 0.0, 2.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_freq_encode_layout():
    # independent numpy re-derivation of freqencoder.cu:30-58 layout
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    deg = 4
    out = np.asarray(freq_encode(jnp.asarray(x), deg))
    D = 3
    assert out.shape == (5, freq_output_dim(D, deg))
    np.testing.assert_allclose(out[:, :D], x, rtol=1e-6)
    for col in range(2 * deg):
        freq = 2.0 ** (col // 2)
        phase = (col % 2) * np.pi / 2
        for d in range(D):
            expected = np.sin(x[:, d] * freq + phase)
            np.testing.assert_allclose(
                out[:, D + col * D + d], expected, rtol=1e-5, atol=1e-6)


def _sh_ref_deg3(x, y, z):
    # independent transcription of the standard real SH basis (degree 3)
    return np.stack([
        0.28209479177387814 * np.ones_like(x),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.94617469575755997 * z ** 2 - 0.31539156525251999,
        -1.0925484305920792 * x * z,
        0.54627421529603959 * (x ** 2 - y ** 2),
    ], axis=-1)


def test_sh_encode_matches_reference_basis():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d, dtype=jnp.float32), 3))
    assert out.shape == (64, sh_output_dim(3))
    np.testing.assert_allclose(
        out, _sh_ref_deg3(d[:, 0], d[:, 1], d[:, 2]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("degree", list(range(1, 9)))
def test_sh_encode_shapes_and_grad(degree):
    d = jnp.asarray(np.random.default_rng(2).normal(size=(8, 3)), dtype=jnp.float32)
    out = sh_encode(d, degree)
    assert out.shape == (8, degree ** 2)
    g = jax.grad(lambda v: jnp.sum(sh_encode(v, degree) ** 2))(d)
    assert np.isfinite(np.asarray(g)).all()


class TestHashGrid:
    def test_spec_offsets_match_reference_table_layout(self):
        # grid.py:112-124 with defaults + desired_resolution=2048
        spec = HashGridSpec.make(desired_resolution=2048)
        assert spec.num_levels == 16
        assert spec.output_dim == 32
        res = np.asarray(spec.resolutions)
        assert res[0] == 16
        # resolutions grow ~per_level_scale per level up to ~2048
        assert 1500 <= res[-1] <= 2600
        # early levels are dense ((res+1)^3 rounded to 8), later hashed at 2^19
        assert spec.sizes[0] == int(np.ceil(17 ** 3 / 8) * 8)
        assert spec.sizes[-1] == 2 ** 19
        assert spec.use_hash[-1] and not spec.use_hash[0]

    def test_dense_level_is_exact_trilinear(self):
        # a single dense 'tiled' level must reproduce numpy trilerp exactly
        spec = HashGridSpec.make(num_levels=1, level_dim=2, base_resolution=8,
                                 per_level_scale=1.0, gridtype="tiled")
        key = jax.random.PRNGKey(0)
        emb = jax.random.normal(key, (spec.offsets[-1], 2))
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.99, 0.99, size=(32, 3)).astype(np.float32)
        out = np.asarray(hash_grid_encode(emb, jnp.asarray(x), spec, bound=1.0))

        # numpy reference
        emb_np = np.asarray(emb)
        scale = spec.scales[0]
        res = spec.resolutions[0]
        u = (x + 1.0) / 2.0
        pos = u * scale + 0.5
        pg = np.floor(pos).astype(np.uint64)
        frac = pos - np.floor(pos)
        expected = np.zeros((32, 2))
        for corner in range(8):
            bits = [(corner >> d) & 1 for d in range(3)]
            w = np.ones(32)
            idx = np.zeros(32, dtype=np.uint64)
            stride = 1
            for d in range(3):
                w *= frac[:, d] if bits[d] else (1 - frac[:, d])
                c = pg[:, d] + bits[d]
                if stride <= spec.sizes[0]:
                    idx += c * stride
                stride *= res + 1
            idx = idx % spec.sizes[0]
            expected += w[:, None] * emb_np[idx.astype(np.int64)]
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)

    def test_oob_zeroed(self):
        spec = HashGridSpec.make(num_levels=4, desired_resolution=64)
        emb = hash_grid_init(jax.random.PRNGKey(1), spec) + 1.0
        x = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        out = np.asarray(hash_grid_encode(emb, x, spec, bound=1.0))
        assert np.abs(out[0]).max() > 0
        np.testing.assert_array_equal(out[1], 0.0)

    def test_embedding_gradient_is_scatter_of_weights(self):
        spec = HashGridSpec.make(num_levels=2, base_resolution=4,
                                 per_level_scale=2.0, gridtype="tiled")
        emb = hash_grid_init(jax.random.PRNGKey(2), spec)
        x = jnp.asarray(np.random.default_rng(4).uniform(-0.9, 0.9, (16, 3)),
                        dtype=jnp.float32)
        g = jax.grad(lambda e: jnp.sum(hash_grid_encode(e, x, spec)))(emb)
        # total gradient mass = (#points) * (#levels): trilinear weights sum to 1
        np.testing.assert_allclose(np.asarray(g).sum(), 16 * 2 * 2, rtol=1e-4)

    def test_hash_level_deterministic(self):
        spec = HashGridSpec.make(num_levels=16, desired_resolution=2048)
        emb = hash_grid_init(jax.random.PRNGKey(3), spec)
        x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (8, 3)),
                        dtype=jnp.float32)
        a = hash_grid_encode(emb, x, spec)
        b = hash_grid_encode(emb, x, spec)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -3.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(far[0], 4.0, rtol=1e-6)
    fmax = np.finfo(np.float32).max
    assert near[1] == fmax and far[1] == fmax  # parallel miss
    assert near[2] == fmax  # origin outside, pointing away


def test_near_far_min_near_clamp():
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside the box -> near would be < 0
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 0.2, rtol=1e-6)
    np.testing.assert_allclose(far[0], 1.0, rtol=1e-6)


def test_sph_from_ray_on_sphere():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])  # straight up (y axis)
    sph = np.asarray(sph_from_ray(o, d, 2.0))
    np.testing.assert_allclose(sph[0, 0], -1.0, atol=1e-6)  # theta = 0 -> -1


def test_morton_roundtrip():
    rng = np.random.default_rng(6)
    coords = rng.integers(0, 128, size=(100, 3))
    codes = morton3d(jnp.asarray(coords))
    back = np.asarray(morton3d_invert(codes))
    np.testing.assert_array_equal(back, coords)
    # known value: (1,1,1) -> 0b111 = 7
    assert int(np.asarray(morton3d(jnp.asarray([[1, 1, 1]])))) == 7


def test_packbits_roundtrip():
    rng = np.random.default_rng(7)
    grid = rng.normal(size=(2, 64)).astype(np.float32)
    bf = packbits(jnp.asarray(grid), 0.0)
    assert bf.shape == (16,) and bf.dtype == jnp.uint8
    idx = jnp.arange(128)
    bits = np.asarray(bitfield_lookup(bf, idx))
    np.testing.assert_array_equal(bits, (grid.reshape(-1) > 0.0))


def test_composite_weights_matches_naive():
    rng = np.random.default_rng(8)
    sig = rng.uniform(0, 5, size=(4, 16)).astype(np.float32)
    dt = rng.uniform(0.01, 0.1, size=(4, 16)).astype(np.float32)
    w, _ = composite_weights(jnp.asarray(sig), jnp.asarray(dt), 1.0)
    w = np.asarray(w)
    alphas = 1 - np.exp(-dt * sig)
    T = np.ones(4)
    for i in range(16):
        np.testing.assert_allclose(w[:, i], alphas[:, i] * T, rtol=1e-4, atol=1e-6)
        T = T * (1 - alphas[:, i] + 1e-15)
    assert (w.sum(-1) <= 1.0 + 1e-5).all()


def test_composite_rays_outputs():
    rng = np.random.default_rng(9)
    N, T = 4, 16
    sig = jnp.asarray(rng.uniform(0, 5, size=(N, T)), dtype=jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, size=(N, T, 3)), dtype=jnp.float32)
    dt = jnp.full((N, T), 0.05)
    z = jnp.cumsum(dt, axis=-1) + 1.0
    res = composite_rays(sig, rgb, dt, z, jnp.full((N,), 1.0), jnp.full((N,), 2.0))
    assert res["image"].shape == (N, 3)
    assert res["depth"].shape == (N,)
    assert res["aggregated_density"].shape == (N,)
    np.testing.assert_allclose(
        np.asarray(res["aggregated_density"]),
        np.asarray(jnp.sum(res["weights"] * sig, -1)), rtol=1e-6)


def test_sample_pdf_deterministic():
    bins = jnp.linspace(0.0, 1.0, 16)[None].repeat(3, axis=0)
    weights = jnp.ones((3, 15))
    s = np.asarray(sample_pdf(bins, weights, 8, det=True))
    assert s.shape == (3, 8)
    assert (np.diff(s, axis=-1) > 0).all()
    assert (s >= 0).all() and (s <= 1).all()


def test_sample_pdf_concentrates_mass():
    bins = jnp.linspace(0.0, 1.0, 11)[None]
    weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)
    s = np.asarray(sample_pdf(bins, weights, 16, det=True))
    assert (np.abs(s - 0.55) < 0.1).mean() > 0.8


def test_losses():
    pred = jnp.asarray([1.0, 2.0, 3.0])
    tgt = jnp.asarray([1.5, 2.0, 2.0])
    np.testing.assert_allclose(
        float(huber_loss(pred, tgt, delta=0.1)),
        np.mean([0.5 - 0.05, 0.0, 1.0 - 0.05]), rtol=1e-6)
    assert float(mape_loss(pred, tgt)) > 0
    w = jnp.ones((2, 8)) / 8
    m = jnp.linspace(0, 1, 8)[None].repeat(2, axis=0)
    assert float(eff_distloss(w, m, 1.0 / 8)) > 0


class TestCellLayout:
    def test_dense_cell_encode_matches_corner(self):
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            build_cell_table, hash_grid_encode_cell)
        spec = HashGridSpec.make(num_levels=3, base_resolution=4,
                                 per_level_scale=2.0, gridtype="tiled")
        emb = hash_grid_init(jax.random.PRNGKey(0), spec, std=1.0)
        cell = build_cell_table(emb, spec)
        x = jnp.asarray(np.random.default_rng(0).uniform(-0.95, 0.95, (64, 3)),
                        dtype=jnp.float32)
        a = np.asarray(hash_grid_encode(emb, x, spec))
        b = np.asarray(hash_grid_encode_cell(cell, x, spec))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_hashed_cell_encode_shapes_and_grad(self):
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            build_cell_table, hash_grid_encode_cell, cell_sizes)
        spec = HashGridSpec.make(num_levels=6, desired_resolution=128,
                                 log2_hashmap_size=10)
        emb = hash_grid_init(jax.random.PRNGKey(1), spec)
        cell = build_cell_table(emb, spec)
        sizes, offsets, _ = cell_sizes(spec)
        assert cell.shape == (offsets[-1], 8 * spec.level_dim)
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (32, 3)),
                        dtype=jnp.float32)
        out = hash_grid_encode_cell(cell, x, spec)
        assert out.shape == (32, spec.output_dim)
        g = jax.grad(lambda c: jnp.sum(hash_grid_encode_cell(c, x, spec) ** 2))(cell)
        assert np.isfinite(np.asarray(g)).all()

    def test_network_to_cell_roundtrip_dense(self):
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
        cfg = NetworkConfig(encoding="tiledgrid", num_levels=2,
                            base_resolution=4, desired_resolution=8)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        cparams = net.to_cell(params)
        x = jnp.asarray(np.random.default_rng(2).uniform(-0.9, 0.9, (16, 3)),
                        dtype=jnp.float32)
        a = np.asarray(net.density(params, x)["sigma"])
        b = np.asarray(net.density(cparams, x)["sigma"])
        np.testing.assert_allclose(a, b, rtol=1e-4)


class TestFoldedEncode:
    """Aligned-spec folded-table encode (the round-2 gather-wall breaker):
    ONE row gather must reproduce every folded level exactly."""

    def _spec(self):
        from nerfsafetyvalidation_tpu.ops.hash_encoding import HashGridSpec
        return HashGridSpec.make(num_levels=5, level_dim=2,
                                 base_resolution=4, log2_hashmap_size=10,
                                 aligned=True)  # scales 4,8,16,32,64

    def test_aligned_spec_scales_nest(self):
        spec = self._spec()
        assert spec.aligned and spec.align_corners
        assert spec.scales == (4.0, 8.0, 16.0, 32.0, 64.0)
        assert spec.resolutions == (5, 9, 17, 33, 65)
        # 4,8 dense ((scale+1)^3 <= 1024); 16+ hashed
        assert spec.use_hash == (False, False, True, True, True)

    def test_folded_matches_reference_semantics(self):
        import jax
        import jax.numpy as jnp
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            hash_grid_init, hash_grid_encode, hash_grid_encode_cell,
            hash_grid_encode_folded, build_folded_table,
            build_hashed_cell_table, build_cell_table, default_fold_levels)

        spec = self._spec()
        emb = hash_grid_init(jax.random.PRNGKey(0), spec, std=0.5)
        n_fold = default_fold_levels(spec, max_fold_scale=16)
        assert n_fold == 3  # folds the two dense levels AND hashed 16

        fold = build_folded_table(emb, spec, n_fold)
        hcell = build_hashed_cell_table(emb, spec, n_fold)
        assert fold.shape == (16 ** 3, n_fold * 8 * 2)

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (512, 3)), dtype=jnp.float32)
        # include exact boundary points
        x = jnp.concatenate([x, jnp.asarray([[1.0, 1.0, 1.0],
                                             [-1.0, -1.0, -1.0],
                                             [0.0, 0.0, 0.0]])])
        out_fold = hash_grid_encode_folded(fold, hcell, x, spec, n_fold)
        out_corner = hash_grid_encode(emb, x, spec)
        cell = build_cell_table(emb, spec)
        out_cell = hash_grid_encode_cell(cell, x, spec)

        C = spec.level_dim
        # folded levels reproduce the reference corner-layout semantics
        np.testing.assert_allclose(np.asarray(out_fold[:, :n_fold * C]),
                                   np.asarray(out_corner[:, :n_fold * C]),
                                   rtol=1e-5, atol=1e-6)
        # finer levels match the cell-layout path bit for bit
        np.testing.assert_allclose(np.asarray(out_fold[:, n_fold * C:]),
                                   np.asarray(out_cell[:, n_fold * C:]),
                                   rtol=1e-6, atol=1e-7)

    def test_oob_zeroed(self):
        import jax
        import jax.numpy as jnp
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            hash_grid_init, hash_grid_encode_folded, build_folded_table,
            build_hashed_cell_table, default_fold_levels)
        spec = self._spec()
        emb = hash_grid_init(jax.random.PRNGKey(0), spec, std=0.5)
        n_fold = default_fold_levels(spec, max_fold_scale=8)
        fold = build_folded_table(emb, spec, n_fold)
        hcell = build_hashed_cell_table(emb, spec, n_fold)
        x = jnp.asarray([[1.5, 0.0, 0.0], [0.0, -1.01, 0.0]])
        out = hash_grid_encode_folded(fold, hcell, x, spec, n_fold)
        assert np.all(np.asarray(out) == 0.0)

    def test_network_to_folded_density_matches(self):
        import jax
        import jax.numpy as jnp
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network import NeRFNetwork

        cfg = NetworkConfig(bound=1.0, aligned_levels=True, num_levels=4,
                            level_dim=2, base_resolution=4,
                            log2_hashmap_size=10, fold_max_scale=8)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        folded = net.to_folded(params)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (128, 3)), dtype=jnp.float32)
        a = net.density(params, x)
        b = net.density(folded, x)
        np.testing.assert_allclose(np.asarray(a["sigma"]),
                                   np.asarray(b["sigma"]), rtol=2e-4,
                                   atol=1e-5)


class TestLevelMask:
    """Static max_level masking (ROADMAP #5 / VERDICT r3 item 7): levels
    >= max_level contribute exactly-zero features in every layout, and the
    unmasked prefix is bit-identical to the full encode."""

    def _setup(self, aligned=False):
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            HashGridSpec, hash_grid_init)
        if aligned:
            spec = HashGridSpec.make(num_levels=5, level_dim=2,
                                     base_resolution=4,
                                     log2_hashmap_size=10, aligned=True)
        else:
            spec = HashGridSpec.make(num_levels=8, level_dim=2,
                                     desired_resolution=256)
        emb = hash_grid_init(jax.random.PRNGKey(2), spec)
        x = jnp.asarray(np.random.default_rng(9).uniform(-0.9, 0.9, (64, 3)),
                        dtype=jnp.float32)
        return spec, emb, x

    def _check(self, full, masked, spec, max_level):
        full = np.asarray(full).reshape(-1, spec.num_levels, spec.level_dim)
        masked = np.asarray(masked).reshape(-1, spec.num_levels,
                                            spec.level_dim)
        np.testing.assert_array_equal(masked[:, :max_level],
                                      full[:, :max_level])
        np.testing.assert_array_equal(
            masked[:, max_level:], np.zeros_like(masked[:, max_level:]))

    @pytest.mark.parametrize("max_level", [1, 3, 6])
    def test_corner_layout(self, max_level):
        spec, emb, x = self._setup()
        full = hash_grid_encode(emb, x, spec)
        masked = hash_grid_encode(emb, x, spec, max_level=max_level)
        self._check(full, masked, spec, max_level)

    @pytest.mark.parametrize("max_level", [2, 5])
    def test_cell_layout(self, max_level):
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            build_cell_table, hash_grid_encode_cell)
        spec, emb, x = self._setup()
        tbl = build_cell_table(emb, spec)
        full = hash_grid_encode_cell(tbl, x, spec)
        masked = hash_grid_encode_cell(tbl, x, spec, max_level=max_level)
        self._check(full, masked, spec, max_level)

    @pytest.mark.parametrize("max_level", [1, 3, 4])
    def test_folded_layout(self, max_level):
        # aligned 5-level spec folds 4,8,16,32 at fold_max_scale=32 ->
        # max_level=1/3 masks inside the fold, 4 drops the fine cell row
        from nerfsafetyvalidation_tpu.ops.hash_encoding import (
            build_folded_table, build_hashed_cell_table,
            hash_grid_encode_folded, default_fold_levels)
        spec, emb, x = self._setup(aligned=True)
        n_fold = default_fold_levels(spec, 32)
        ft = build_folded_table(emb, spec, n_fold)
        ht = build_hashed_cell_table(emb, spec, n_fold)
        full = hash_grid_encode_folded(ft, ht, x, spec, n_fold)
        masked = hash_grid_encode_folded(ft, ht, x, spec, n_fold,
                                         max_level=max_level)
        self._check(full, masked, spec, max_level)

    def test_network_config_threads_max_level(self):
        from nerfsafetyvalidation_tpu.config import NetworkConfig
        from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
        cfg = NetworkConfig(num_levels=4, desired_resolution=64, bound=1.0)
        net = NeRFNetwork(cfg)
        params = net.init(jax.random.PRNGKey(0))
        from dataclasses import replace
        net_m = NeRFNetwork(replace(cfg, max_level=2))
        x = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (16, 3)),
                        dtype=jnp.float32)
        full = np.asarray(net.encode_pos(params, x))
        masked = np.asarray(net_m.encode_pos(params, x))
        L, C = cfg.num_levels, cfg.level_dim
        np.testing.assert_array_equal(masked.reshape(-1, L, C)[:, 2:], 0.0)
        np.testing.assert_array_equal(masked.reshape(-1, L, C)[:, :2],
                                      full.reshape(-1, L, C)[:, :2])
