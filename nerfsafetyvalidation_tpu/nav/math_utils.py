"""Rotation / SE(3) math.

Parity target: reference nav/math_utils.py — vec_to_rot_matrix (:152),
rot_matrix_to_vec (:111) with the acos-safe linearized tail (:116-127),
mahalanobis (:17), nerf_matrix_to_ngp_torch (:21-33), nearestPD/isPD
(:35-81), SE(3) error metrics (:83-97), skew matrices (:99-109, :169-178),
rot_x (:12), next_rotation (quad_helpers.py:186-199).

All jnp functions are batched, differentiable and jit/vmap-safe: the
reference's boolean-mask writes become jnp.where selects (identical math,
no data-dependent control flow).
"""

import numpy as np
import jax
import jax.numpy as jnp
import numpy.linalg as la


def rot_x(phi):
    """Rotation about x by phi (math_utils.py:12-15)."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    return jnp.asarray([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


rot_x_np = lambda phi: np.array([  # noqa: E731 (host-side twin)
    [1.0, 0.0, 0.0],
    [0.0, np.cos(phi), -np.sin(phi)],
    [0.0, np.sin(phi), np.cos(phi)]], dtype=np.float32)


def mahalanobis(u, v, cov):
    delta = u - v
    return delta @ jnp.linalg.inv(cov) @ delta


def nerf_matrix_to_ngp_jax(pose, trans):
    """(flip_yz @ pose @ neg_yz, flip_yz @ trans) (math_utils.py:21-33)."""
    neg_yz = jnp.asarray([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    flip_yz = jnp.asarray([[0.0, 1, 0], [0, 0, 1], [1, 0, 0]])
    return flip_yz @ pose @ neg_yz, flip_yz @ trans


def skew_matrix(vec):
    """[..., 3] -> [..., 3, 3] (math_utils.py:169-178)."""
    zeros = jnp.zeros_like(vec[..., 0])
    rows = [
        jnp.stack([zeros, -vec[..., 2], vec[..., 1]], axis=-1),
        jnp.stack([vec[..., 2], zeros, -vec[..., 0]], axis=-1),
        jnp.stack([-vec[..., 1], vec[..., 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _acos_safe(x, eps=1e-7):
    """acos with linear extrapolation near |x|=1 (math_utils.py:116-127)."""
    slope = np.arccos(1 - eps) / eps
    good = jnp.abs(x) <= 1 - eps
    sign = jnp.sign(x)
    clipped = jnp.clip(x, -(1 - eps), 1 - eps)
    safe = jnp.arccos(clipped)
    bad = jnp.arccos(sign * (1 - eps)) - slope * sign * (jnp.abs(x) - 1 + eps)
    return jnp.where(good, safe, bad)


def rot_matrix_to_vec(R):
    """[..., 3, 3] -> [..., 3] axis-angle (math_utils.py:111-150).

    vec = angle / (2 sin angle) * (R - R^T)^vee, with the smooth factor
    c(angle) = angle / (2 sin angle) Taylor-guarded near angle = 0
    (c -> 1/2 + angle^2/12): the reference's 1/(2 sin(angle + 1e-10))
    form has ~1e10-scale gradients at the identity, which NaN the
    estimator's dynamics Jacobian / measurement Hessian
    (estimator_helpers.py:271-319) whenever the rotation passes through
    zero. Values match the reference to ~1e-10 away from the guard."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    angle = _acos_safe((trace - 1) / 2)[..., None]
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    small = jnp.abs(angle) < 1e-4
    denom = jnp.where(small, 1.0, 2.0 * jnp.sin(angle))   # safe div
    c = jnp.where(small, 0.5 + angle ** 2 / 12.0, angle / denom)
    return c * w


def vec_to_rot_matrix(rot_vec):
    """[..., 3] axis-angle -> [..., 3, 3] via Rodrigues (math_utils.py:152-167).

    R = I + a(t) S + b(t) S^2 with S = skew(rot_vec) (UN-normalized),
    a = sin t / t, b = (1 - cos t) / t^2, both Taylor-guarded at t = 0 —
    this removes the axis = v/|v| division whose autodiff is 0/0 at the
    origin (the torch reference shares that NaN; the estimator needs the
    Jacobian of the dynamics at rot_vec = 0, see rot_matrix_to_vec)."""
    t2 = jnp.sum(rot_vec ** 2, axis=-1)[..., None, None]
    small = t2 < 1e-12
    t2s = jnp.where(small, 1.0, t2)                       # safe sqrt/div
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    S = skew_matrix(rot_vec)
    eye = jnp.broadcast_to(jnp.eye(3), S.shape)
    return eye + a * S + b * (S @ S)


def next_rotation(R, omega, dt):
    """SO(3) exponential step (quad_helpers.py:186-199) via the
    Taylor-guarded Rodrigues form (finite gradients at omega = 0)."""
    return R @ vec_to_rot_matrix(omega * dt)


# ---------------------------------------------------------------- host-side
def isPD(B) -> bool:
    try:
        la.cholesky(np.asarray(B))
        return True
    except la.LinAlgError:
        return False


def nearestPD(A):
    """Nearest positive-definite matrix (Higham 1988; math_utils.py:35-73)."""
    A = np.asarray(A)
    B = (A + A.T) / 2
    _, s, V = la.svd(B)
    H = V.T @ np.diag(s) @ V
    A2 = (B + H) / 2
    A3 = (A2 + A2.T) / 2
    if isPD(A3):
        return A3
    spacing = np.spacing(la.norm(A))
    I = np.eye(A.shape[0])
    k = 1
    while not isPD(A3):
        mineig = np.min(np.real(la.eigvals(A3)))
        A3 += I * (-mineig * k ** 2 + spacing)
        k += 1
    return A3


def calcSO3Err(R_gt, R_est):
    """Angle between two rotations in degrees (math_utils.py:83-91)."""
    rotDiff = np.dot(R_gt, np.transpose(R_est))
    trace = np.trace(rotDiff)
    if trace < -1 and (-1 - trace) < 1e-4:
        return np.rad2deg(np.arccos(-1))
    if trace > 3 and (trace - 3) < 1e-4:
        return np.rad2deg(np.arccos(1))
    return np.rad2deg(np.arccos((trace - 1.0) / 2.0))


def calcSE3Err(T_gt, T_est):
    ang = calcSO3Err(T_gt[0:3, 0:3], T_est[0:3, 0:3])
    t_err = np.linalg.norm(T_gt[0:3, 3] - T_est[0:3, 3])
    return t_err, ang
