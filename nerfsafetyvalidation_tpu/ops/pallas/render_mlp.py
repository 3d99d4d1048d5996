"""Fused sigma+color render kernel — the encode->MLP->activation megakernel.

Parity target: reference ffmlp/src/ffmlp.cu kernel_mlp_fused (:332-409),
whose point is keeping every intermediate activation on chip across the
whole per-sample shading pipeline. This kernel chains BOTH NeRF MLPs —
sigma net, trunc_exp, geo-feature handoff, color net, sigmoid — in one
pallas_call per row tile, with two structural tricks:

  * the color net's `concat([sh_dir, geo_feat])` input never materializes:
    the concat of two linear inputs into a linear layer equals the SUM of
    two smaller matmuls (sh @ C1[:sh_dim] + geo @ C1[sh_dim:]), so the
    kernel runs five small MXU matmuls with zero lane shuffling;
  * inputs stay at their true lane widths (32 / 16) and the output is a
    compact [N, 8] (sigma, rgb, pad) float32 block — HBM traffic is the
    unpadded payload, unlike a 128-lane padded pipeline.

Backward: jax.custom_vjp recomputes through the mathematically identical
XLA path (the reference computes weight grads via CUTLASS split-k GEMMs;
XLA's fused GEMMs play that role). Non-TPU backends run in interpret mode.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

def _auto_interpret():
    """Run the kernel for real on TPU-class backends; interpret elsewhere.

    The tunneled chip registers as platform "axon", not "tpu" — comparing
    against "tpu" alone silently put every kernel in interpret mode on the
    REAL chip (interpret lowers the kernel body to plain XLA ops, which is
    why round-2 pallas timings sat exactly at XLA parity).
    NSV_PALLAS_INTERPRET=0/1 overrides."""
    env = os.environ.get("NSV_PALLAS_INTERPRET")
    if env is not None:
        return env == "1"
    return jax.default_backend() not in ("tpu", "axon")


ROW_BLOCK = 2048


def _kernel(enc_ref, sh_ref, w1_ref, w2_ref, c1s_ref, c1g_ref, c2_ref,
            c3_ref, out_ref):
    f32 = jnp.float32
    enc = enc_ref[:]
    sh = sh_ref[:]
    # sigma net: enc -> hidden -> (sigma, geo)
    h = jnp.dot(enc, w1_ref[:], preferred_element_type=f32)
    h = jax.nn.relu(h).astype(enc.dtype)
    s = jnp.dot(h, w2_ref[:], preferred_element_type=f32)      # [R, 16]
    sigma = jnp.exp(jnp.clip(s[:, :1], -15.0, 15.0))           # trunc_exp
    # c1g's row 0 is zeroed so the full s feeds it without lane slicing
    geo = jax.nn.relu(jnp.dot(sh, c1s_ref[:], preferred_element_type=f32)
                      + jnp.dot(s.astype(enc.dtype), c1g_ref[:],
                                preferred_element_type=f32)).astype(enc.dtype)
    g2 = jax.nn.relu(jnp.dot(geo, c2_ref[:],
                             preferred_element_type=f32)).astype(enc.dtype)
    rgbh = jnp.dot(g2, c3_ref[:], preferred_element_type=f32)  # [R, 8]
    rgb = jax.nn.sigmoid(rgbh[:, :3])
    out_ref[:] = jnp.concatenate(
        [sigma, rgb, jnp.zeros_like(rgbh[:, :4])], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def _forward(enc, sh, mats, interpret=False):
    B = enc.shape[0]
    w1, w2, c1s, c1g, c2, c3 = mats
    grid = (B // ROW_BLOCK,)
    in_specs = [
        pl.BlockSpec((ROW_BLOCK, enc.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, sh.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for m in mats]
    return pl.pallas_call(
        _kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        interpret=interpret,
    )(enc, sh, *mats)


def _prep_mats(sigma_net, color_net, sh_dim, dtype):
    """Split the color net's first layer into the (sh, geo) pair and pad the
    final layer's lanes to 8."""
    w1, w2 = sigma_net
    c1, c2, c3 = color_net
    c1s = c1[:sh_dim]
    # geo feats are sigma-net outputs 1..15; prepend a zero row so the
    # kernel can feed the WHOLE sigma output (no lane slicing)
    c1g = jnp.zeros((w2.shape[1], c1.shape[1]), dtype=c1.dtype)
    c1g = c1g.at[1:1 + c1.shape[0] - sh_dim].set(c1[sh_dim:])
    c3p = jnp.zeros((c3.shape[0], 8), dtype=c3.dtype).at[:, :3].set(c3)
    return tuple(m.astype(dtype) for m in (w1, w2, c1s, c1g, c2, c3p))


def _xla_ref(enc, sh, sigma_net, color_net, dtype):
    """Identical math through XLA (backward path + fallback)."""
    w1, w2 = sigma_net
    c1, c2, c3 = color_net
    h = jax.nn.relu(jnp.dot(enc.astype(dtype), w1.astype(dtype),
                            preferred_element_type=jnp.float32))
    s = jnp.dot(h.astype(dtype), w2.astype(dtype),
                preferred_element_type=jnp.float32)
    sigma = jnp.exp(jnp.clip(s[..., 0], -15.0, 15.0))
    hin = jnp.concatenate([sh.astype(dtype),
                           s[..., 1:].astype(dtype)], axis=-1)
    g = jax.nn.relu(jnp.dot(hin, c1.astype(dtype),
                            preferred_element_type=jnp.float32))
    g = jax.nn.relu(jnp.dot(g.astype(dtype), c2.astype(dtype),
                            preferred_element_type=jnp.float32))
    rgbh = jnp.dot(g.astype(dtype), c3.astype(dtype),
                   preferred_element_type=jnp.float32)
    return sigma, jax.nn.sigmoid(rgbh)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(enc, sh, sigma_net, color_net, sh_dim, dtype_str, interpret):
    dtype = jnp.dtype(dtype_str)
    N = enc.shape[0]
    Np = (N + ROW_BLOCK - 1) // ROW_BLOCK * ROW_BLOCK
    encp = jnp.zeros((Np, enc.shape[1]), dtype=dtype).at[:N].set(
        enc.astype(dtype))
    shp = jnp.zeros((Np, sh.shape[1]), dtype=dtype).at[:N].set(
        sh.astype(dtype))
    mats = _prep_mats(tuple(sigma_net), tuple(color_net), sh_dim, dtype)
    out = _forward(encp, shp, mats, interpret=interpret)
    return out[:N, 0], out[:N, 1:4]


def _fused_fwd(enc, sh, sigma_net, color_net, sh_dim, dtype_str, interpret):
    return (_fused(enc, sh, sigma_net, color_net, sh_dim, dtype_str,
                   interpret),
            (enc, sh, tuple(sigma_net), tuple(color_net)))


def _fused_bwd(sh_dim, dtype_str, interpret, res, g):
    enc, sh, sigma_net, color_net = res

    def ref(enc, sh, sigma_net, color_net):
        return _xla_ref(enc, sh, sigma_net, color_net, jnp.dtype(dtype_str))

    _, vjp = jax.vjp(ref, enc, sh, sigma_net, color_net)
    d_enc, d_sh, d_sn, d_cn = vjp(g)
    return d_enc, d_sh, d_sn, d_cn


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_sigma_color(enc, sh, sigma_net, color_net,
                      compute_dtype=jnp.bfloat16, interpret=None):
    """enc: [N, D_enc]; sh: [N, D_sh]; sigma_net: (W1, W2); color_net:
    (C1, C2, C3) with C1 rows ordered [sh | geo]. Returns
    (sigma [N] f32, rgb [N, 3] f32). Differentiable."""
    if not _HAS_PALLAS:
        return _xla_ref(enc, sh, tuple(sigma_net), tuple(color_net),
                        jnp.dtype(compute_dtype))
    if interpret is None:
        interpret = _auto_interpret()
    return _fused(enc, sh, tuple(sigma_net), tuple(color_net),
                  sh.shape[1], str(jnp.dtype(compute_dtype)), interpret)


# --------------------------------------------------------------------------
# arbitrary-depth variant — the distilled-student megakernel
# --------------------------------------------------------------------------
# The 256-wide x 6-layer student (models/bake.py) moves ~2 bytes x N x 256
# per layer BOUNDARY through HBM when each GEMM is its own XLA op — at the
# baked frame's ~10M samples that is ~60 GB/frame of activation traffic,
# on the order of the MXU time itself. One pallas_call per row tile keeps
# the whole chain's activations in VMEM: HBM sees only enc, sh and the
# [N, 8] output (~2 GB/frame).

def _make_deep_kernel(n_sig, n_col):
    def kernel(enc_ref, sh_ref, *refs):
        out_ref = refs[-1]
        mats = refs[:-1]
        f32 = jnp.float32
        dt = enc_ref.dtype
        h = enc_ref[:]
        for i in range(n_sig):
            h = jnp.dot(h, mats[i][:], preferred_element_type=f32)
            if i != n_sig - 1:
                h = jax.nn.relu(h).astype(dt)
        sigma = jnp.exp(jnp.clip(h[:, :1], -15.0, 15.0))        # trunc_exp
        c1s, c1g = mats[n_sig], mats[n_sig + 1]
        g = jax.nn.relu(
            jnp.dot(sh_ref[:], c1s[:], preferred_element_type=f32)
            + jnp.dot(h.astype(dt), c1g[:],
                      preferred_element_type=f32)).astype(dt)
        rest = mats[n_sig + 2:]
        for i in range(len(rest)):
            g = jnp.dot(g, rest[i][:], preferred_element_type=f32)
            if i != len(rest) - 1:
                g = jax.nn.relu(g).astype(dt)
        rgb = jax.nn.sigmoid(g[:, :3])
        out_ref[:] = jnp.concatenate(
            [sigma, rgb, jnp.zeros_like(g[:, :4])], axis=1)
    return kernel


@partial(jax.jit, static_argnames=("n_sig", "n_col", "interpret"))
def _forward_deep(enc, sh, mats, n_sig, n_col, interpret=False):
    B = enc.shape[0]
    grid = (B // ROW_BLOCK,)
    in_specs = [
        pl.BlockSpec((ROW_BLOCK, enc.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROW_BLOCK, sh.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for m in mats]
    return pl.pallas_call(
        _make_deep_kernel(n_sig, n_col), grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        interpret=interpret,
    )(enc, sh, *mats)


def _xla_ref_deep(enc, sh, sigma_net, color_net, dtype):
    """Identical math through XLA (backward path + fallback)."""
    h = enc.astype(dtype)
    for i, w in enumerate(sigma_net):
        h = jnp.dot(h, w.astype(dtype), preferred_element_type=jnp.float32)
        if i != len(sigma_net) - 1:
            h = jax.nn.relu(h).astype(dtype)
    sigma = jnp.exp(jnp.clip(h[..., 0], -15.0, 15.0))
    g = jnp.concatenate([sh.astype(dtype), h[..., 1:].astype(dtype)],
                        axis=-1)
    for i, w in enumerate(color_net):
        g = jnp.dot(g, w.astype(dtype), preferred_element_type=jnp.float32)
        if i != len(color_net) - 1:
            g = jax.nn.relu(g).astype(dtype)
    return sigma, jax.nn.sigmoid(g[..., :3])


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_deep(enc, sh, sigma_net, color_net, sh_dim, dtype_str, interpret):
    dtype = jnp.dtype(dtype_str)
    N = enc.shape[0]
    Np = (N + ROW_BLOCK - 1) // ROW_BLOCK * ROW_BLOCK
    encp = jnp.zeros((Np, enc.shape[1]), dtype=dtype).at[:N].set(
        enc.astype(dtype))
    shp = jnp.zeros((Np, sh.shape[1]), dtype=dtype).at[:N].set(
        sh.astype(dtype))
    sn = tuple(sigma_net)
    cn = tuple(color_net)
    c1, rest = cn[0], cn[1:]
    c1s = c1[:sh_dim]
    geo_w = sn[-1].shape[1]                     # 1 + geo_feat lanes
    c1g = jnp.zeros((geo_w, c1.shape[1]), dtype=c1.dtype)
    c1g = c1g.at[1:1 + c1.shape[0] - sh_dim].set(c1[sh_dim:])
    c_last = rest[-1]
    c_lastp = jnp.zeros((c_last.shape[0], 8),
                        dtype=c_last.dtype).at[:, :c_last.shape[1]].set(
        c_last)
    mats = tuple(m.astype(dtype) for m in
                 sn + (c1s, c1g) + rest[:-1] + (c_lastp,))
    out = _forward_deep(encp, shp, mats, len(sn), len(cn),
                        interpret=interpret)
    return out[:N, 0], out[:N, 1:4]


def _fused_deep_fwd(enc, sh, sigma_net, color_net, sh_dim, dtype_str,
                    interpret):
    return (_fused_deep(enc, sh, sigma_net, color_net, sh_dim, dtype_str,
                        interpret),
            (enc, sh, tuple(sigma_net), tuple(color_net)))


def _fused_deep_bwd(sh_dim, dtype_str, interpret, res, g):
    enc, sh, sigma_net, color_net = res

    def ref(enc, sh, sigma_net, color_net):
        return _xla_ref_deep(enc, sh, sigma_net, color_net,
                             jnp.dtype(dtype_str))

    _, vjp = jax.vjp(ref, enc, sh, sigma_net, color_net)
    d_enc, d_sh, d_sn, d_cn = vjp(g)
    return d_enc, d_sh, d_sn, d_cn


_fused_deep.defvjp(_fused_deep_fwd, _fused_deep_bwd)


def fused_sigma_color_deep(enc, sh, sigma_net, color_net,
                           compute_dtype=jnp.bfloat16, interpret=None):
    """Arbitrary-depth fused sigma+color chain. enc: [N, D_enc];
    sh: [N, D_sh]; sigma_net: >=2 bias-free mats (last outputs
    [sigma | geo]); color_net: >=2 mats with C1 rows ordered [sh | geo].
    Returns (sigma [N] f32, rgb [N, 3] f32). Differentiable (bwd through
    the identical-math XLA chain)."""
    if not _HAS_PALLAS:
        return _xla_ref_deep(enc, sh, tuple(sigma_net), tuple(color_net),
                             jnp.dtype(compute_dtype))
    if interpret is None:
        interpret = _auto_interpret()
    return _fused_deep(enc, sh, tuple(sigma_net), tuple(color_net),
                       sh.shape[1], str(jnp.dtype(compute_dtype)),
                       interpret)


# --------------------------------------------------------------------------
# points-in megakernel — in-kernel frequency encoding + full chain
# --------------------------------------------------------------------------
# fused_sigma_color_deep still materializes the [N, 75] frequency encoding
# in HBM (XLA computes it, the kernel reads it back: ~0.6 kB/sample of
# traffic at multires 12) and pays a pad-copy of it per call. This variant
# takes the raw sample positions instead and builds the encoding INSIDE the
# kernel with two lane-parallel tricks, so HBM sees only x [N,3], sh
# [N,16] and the [N,8] output (~90 B/sample):
#
#   * broadcast-by-matmul: X_b = x @ S with a constant 0/1 selector
#     S [3, 128] replicates each coordinate into the lanes of every
#     encoding column that needs it — one tiny MXU matmul instead of a
#     lane-gather;
#   * the whole CUDA-layout encoding [x, sin(2^0 x), cos(2^0 x), ...]
#     (freqencoder.cu:30-58) is then ONE vectorized expression
#     sin(X_b*A + B)*M_trig + X_b*M_id with per-lane constants A (the
#     2^k frequency), B (0 or pi/2: cos as shifted sin) and masks.
#
# The sin argument is computed in f32: at 2^11 * x the bf16 mantissa (8
# bits) would carry ~8 rad of phase error. Lanes [enc_dim, 128) are zero
# and the first weight matrix is row-padded to 128 to match, so the main
# chain starts from a native K=128 matmul.

_PTS_ROW_BLOCK = int(os.environ.get("NSV_PALLAS_PTS_ROWS", "4096"))


def _freq_consts(multires: int):
    """Selector + per-lane constants for the in-kernel encoding, CUDA
    column order: [x0,x1,x2, then per freq k: sin(2^k x)*3, cos(2^k x)*3]."""
    D = 3 + 6 * multires
    assert D <= 128, "multires too large for one 128-lane encode block"
    S = np.zeros((3, 128), np.float32)
    A = np.zeros((1, 128), np.float32)
    B = np.zeros((1, 128), np.float32)
    Mt = np.zeros((1, 128), np.float32)
    Mi = np.zeros((1, 128), np.float32)
    for j in range(3):                       # identity columns
        S[j, j] = 1.0
        Mi[0, j] = 1.0
    for k in range(multires):
        for j in range(6):                   # sin block then cos block
            col = 3 + 6 * k + j
            S[j % 3, col] = 1.0
            A[0, col] = float(2 ** k)
            B[0, col] = 0.0 if j < 3 else np.pi / 2
            Mt[0, col] = 1.0
    return S, A, B, Mt, Mi


def _make_points_kernel(n_sig, n_rest):
    def kernel(x_ref, sh_ref, s_ref, a_ref, b_ref, mt_ref, mi_ref, *refs):
        out_ref = refs[-1]
        mats = refs[:-1]
        f32 = jnp.float32
        dt = sh_ref.dtype
        xb = jnp.dot(x_ref[:], s_ref[:], preferred_element_type=f32)
        enc = (jnp.sin(xb * a_ref[:] + b_ref[:]) * mt_ref[:]
               + xb * mi_ref[:]).astype(dt)                  # [R, 128]
        h = enc
        for i in range(n_sig):
            h = jnp.dot(h, mats[i][:], preferred_element_type=f32)
            if i != n_sig - 1:
                h = jax.nn.relu(h).astype(dt)
        sigma = jnp.exp(jnp.clip(h[:, :1], -15.0, 15.0))     # trunc_exp
        c1s, c1g = mats[n_sig], mats[n_sig + 1]
        g = jax.nn.relu(
            jnp.dot(sh_ref[:], c1s[:], preferred_element_type=f32)
            + jnp.dot(h.astype(dt), c1g[:],
                      preferred_element_type=f32)).astype(dt)
        rest = mats[n_sig + 2:]
        for i in range(len(rest)):
            g = jnp.dot(g, rest[i][:], preferred_element_type=f32)
            if i != len(rest) - 1:
                g = jax.nn.relu(g).astype(dt)
        rgb = jax.nn.sigmoid(g[:, :3])
        out_ref[:] = jnp.concatenate(
            [sigma, rgb, jnp.zeros_like(g[:, :4])], axis=1)
    return kernel


@partial(jax.jit, static_argnames=("n_sig", "n_rest", "interpret"))
def _forward_points(x, sh, consts, mats, n_sig, n_rest, interpret=False):
    B = x.shape[0]
    R = _PTS_ROW_BLOCK
    grid = (B // R,)
    in_specs = [
        pl.BlockSpec((R, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, sh.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for c in consts] \
      + [pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for m in mats]
    return pl.pallas_call(
        _make_points_kernel(n_sig, n_rest), grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((R, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        interpret=interpret,
    )(x, sh, *consts, *mats)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_points(x, sh, sigma_net, color_net, multires, sh_dim, dtype_str,
                  interpret):
    dtype = jnp.dtype(dtype_str)
    N = x.shape[0]
    R = _PTS_ROW_BLOCK
    Np = (N + R - 1) // R * R
    xp = jnp.zeros((Np, x.shape[1]), jnp.float32).at[:N].set(
        x.astype(jnp.float32))
    shp = jnp.zeros((Np, sh.shape[1]), dtype=dtype).at[:N].set(
        sh.astype(dtype))
    sn = tuple(sigma_net)
    cn = tuple(color_net)
    # first sigma mat: rows are the encoding columns — pad to the 128-lane
    # encode block
    w1 = sn[0]
    w1p = jnp.zeros((128, w1.shape[1]), dtype=w1.dtype).at[:w1.shape[0]].set(
        w1)
    c1, rest = cn[0], cn[1:]
    c1s = c1[:sh_dim]
    geo_w = sn[-1].shape[1]
    c1g = jnp.zeros((geo_w, c1.shape[1]), dtype=c1.dtype)
    c1g = c1g.at[1:1 + c1.shape[0] - sh_dim].set(c1[sh_dim:])
    c_last = rest[-1]
    c_lastp = jnp.zeros((c_last.shape[0], 8),
                        dtype=c_last.dtype).at[:, :c_last.shape[1]].set(
        c_last)
    mats = tuple(m.astype(dtype) for m in
                 (w1p,) + sn[1:] + (c1s, c1g) + rest[:-1] + (c_lastp,))
    consts = tuple(jnp.asarray(c) for c in _freq_consts(multires))
    out = _forward_points(xp, shp, consts, mats, len(sn), len(rest),
                          interpret=interpret)
    return out[:N, 0], out[:N, 1:4]


def _fused_points_fwd(x, sh, sigma_net, color_net, multires, sh_dim,
                      dtype_str, interpret):
    return (_fused_points(x, sh, sigma_net, color_net, multires, sh_dim,
                          dtype_str, interpret),
            (x, sh, tuple(sigma_net), tuple(color_net)))


def _fused_points_bwd(multires, sh_dim, dtype_str, interpret, res, g):
    x, sh, sigma_net, color_net = res
    from ..freq_encoding import freq_encode

    def ref(x, sh, sigma_net, color_net):
        return _xla_ref_deep(freq_encode(x, multires), sh, sigma_net,
                             color_net, jnp.dtype(dtype_str))

    _, vjp = jax.vjp(ref, x, sh, sigma_net, color_net)
    return vjp(g)


_fused_points.defvjp(_fused_points_fwd, _fused_points_bwd)


def fused_points_sigma_color(x, sh, sigma_net, color_net, multires,
                             compute_dtype=jnp.bfloat16, interpret=None):
    """Points-in fused chain: x [N, 3] raw positions (frequency-encoded
    INSIDE the kernel), sh [N, D_sh] encoded directions; nets as in
    fused_sigma_color_deep. Returns (sigma [N] f32, rgb [N, 3] f32).
    Differentiable (bwd through the identical-math XLA chain)."""
    if not _HAS_PALLAS:
        from ..freq_encoding import freq_encode
        return _xla_ref_deep(freq_encode(x, multires), sh,
                             tuple(sigma_net), tuple(color_net),
                             jnp.dtype(compute_dtype))
    if interpret is None:
        interpret = _auto_interpret()
    return _fused_points(x, sh, tuple(sigma_net), tuple(color_net),
                         multires, sh.shape[1],
                         str(jnp.dtype(compute_dtype)), interpret)
