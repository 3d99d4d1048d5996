"""Vision-based state estimator (EKF-style filter with photometric update).

Parity target: reference nav/estimator_helpers.py (`Estimator`):
  * find_POI — SIFT keypoints on the observation (:10-36, host cv2)
  * estimate_relative_pose — N_iter x Adam steps minimizing measurement_fn
    on `batch_size` rays sampled from dilated interest regions (:77-189)
  * measurement_fn — masked-ray NeRF-render MSE + Mahalanobis dynamics
    prior (:191-225), with the camera-frame correction rot_x(pi/2) and the
    NGP axis remap (nerf_matrix_to_ngp_torch)
  * estimate_state — dynamics Jacobian (12x12) covariance propagation, then
    Hessian of the measurement at the optimum for the posterior covariance
    (:261-319)

TPU design: the Jacobian is jax.jacfwd of the jnp dynamics, the Hessian is
jax.hessian of the jnp measurement, and the entire N_iter Adam loop runs as
one jitted lax.fori_loop — the reference pays a python/torch round-trip per
iteration, here it is one device program. SIFT stays host-side cv2; when cv2
is unavailable a gradient-magnitude detector provides the interest points.
"""

import json
import pathlib
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .math_utils import (vec_to_rot_matrix, mahalanobis, rot_x,
                         nerf_matrix_to_ngp_jax, calcSE3Err)


def find_POI(img_rgb, render=False):
    """SIFT interest points -> unique integer pixel coords [N, 2]
    (estimator_helpers.py:10-36). Falls back to a sobel-magnitude detector
    when cv2/SIFT is unavailable."""
    img = np.copy(np.asarray(img_rgb))
    feat_img = None
    try:
        import cv2
        img_gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        sift = cv2.SIFT_create()
        keypoints = sift.detect(img, None)
        if render:
            feat_img = cv2.drawKeypoints(img_gray, keypoints, img)
        xy = np.array([kp.pt for kp in keypoints]).astype(int)
    except Exception:
        gray = img.mean(-1) if img.ndim == 3 else img
        gy, gx = np.gradient(gray.astype(np.float32))
        mag = np.hypot(gx, gy)
        thresh = np.percentile(mag, 95)
        ys, xs = np.nonzero(mag > thresh)
        xy = np.stack([xs, ys], axis=-1)
    if xy.size == 0:
        return np.zeros((0,), dtype=int), {"features": feat_img}
    xy_set = set(tuple(p) for p in xy)
    xy = np.array([list(p) for p in xy_set]).astype(int)
    return xy, {"features": feat_img}


class Estimator:
    def __init__(self, filter_cfg, agent, start_state, filter=True,
                 get_rays_fn=None, render_fn=None, render_batch_fn=None,
                 render_params=None):
        self.batch_size = filter_cfg["batch_size"]
        self.kernel_size = filter_cfg["kernel_size"]
        self.dil_iter = filter_cfg["dil_iter"]
        self.lrate = filter_cfg["lrate"]
        self.agent = agent
        self.is_filter = filter
        self.render_viz = filter_cfg.get("render_viz", False)
        self.show_rate = filter_cfg.get("show_rate", [20, 100])
        self.error_print_rate, self.render_rate = self.show_rate

        # fixed interest-pixel override ([B, 2] (row, col) int): bypasses
        # find_POI + dilation + RNG batch sampling with a deterministic
        # pixel set. This is the cross-check hook for the in-scan
        # closed-loop engine (validation/closed_loop.py), whose canned
        # interest mask must match the sequential estimator bit-for-bit.
        fc = filter_cfg.get("fixed_coords")
        self.fixed_coords = None if fc is None else np.asarray(fc, dtype=int)

        self.xt = jnp.asarray(start_state, dtype=jnp.float32)
        self.sig = jnp.asarray(filter_cfg["sig0"], dtype=jnp.float32)
        self.Q = jnp.asarray(filter_cfg["Q"], dtype=jnp.float32)
        self.iter = filter_cfg["N_iter"]

        self.get_rays = get_rays_fn
        self.render_fn = render_fn
        # measurement_fn runs INSIDE jit (the N_iter Adam fori_loop), so it
        # needs a traceable renderer; full-frame render_from_pose can stay
        # host-staged. Defaults to render_fn for API compatibility.
        self.render_batch_fn = render_batch_fn or render_fn
        # Optional network-params pytree. When given, render_batch_fn is
        # called as fn(params, rays_o, rays_d) and the pytree rides the
        # jitted Adam fit as an ARGUMENT: closure-capturing a big trained
        # table (e.g. the flagship's 537 MB folded volume) bakes it into
        # the HLO as constants, which exceeds the tunneled remote-compile
        # request limit (HTTP 413) — same contract as
        # validation/closed_loop.py render_params.
        self.render_params = render_params

        self.losses = None
        self.covariance = None
        self.state_estimate = None
        self.states = None
        self.action = None
        self.iteration = 0
        self.basefolder = None
        self._fit = None  # jitted inner optimizer, built lazily

    # ------------------------------------------------------------- rendering
    def _pose_from_state(self, state):
        """12-state -> NGP camera pose [4,4] (estimator_helpers.py:199-208)."""
        R = vec_to_rot_matrix(state[6:9])
        rot = rot_x(jnp.pi / 2) @ R[:3, :3]
        pose, trans = nerf_matrix_to_ngp_jax(rot, state[:3])
        new_pose = jnp.eye(4)
        new_pose = new_pose.at[:3, :3].set(pose)
        new_pose = new_pose.at[:3, 3].set(trans)
        return new_pose

    def measurement_fn(self, state, start_state, sig, target, batch,
                       rp=None):
        """Photometric + dynamics-prior loss (estimator_helpers.py:191-225).
        target: [H, W, 3] float; batch: [B, 2] integer pixel coords;
        rp: the render_params pytree when configured (see __init__)."""
        loss_dyn = mahalanobis(state, start_state, sig)
        H, W = target.shape[0], target.shape[1]
        new_pose = self._pose_from_state(state)
        rays = self.get_rays(new_pose.reshape((1, 4, 4)))
        rays_o = rays["rays_o"].reshape((H, W, -1))[batch[:, 0], batch[:, 1]]
        rays_d = rays["rays_d"].reshape((H, W, -1))[batch[:, 0], batch[:, 1]]
        if self.render_params is None:
            output = self.render_batch_fn(rays_o.reshape((1, -1, 3)),
                                          rays_d.reshape((1, -1, 3)))
        else:
            output = self.render_batch_fn(rp, rays_o.reshape((1, -1, 3)),
                                          rays_d.reshape((1, -1, 3)))
        rgb = output["image"].reshape((-1, 3))
        tgt = target[batch[:, 0], batch[:, 1]]
        loss_rgb = jnp.mean((rgb - tgt) ** 2)
        return loss_rgb + loss_dyn

    def render_from_pose(self, pose):
        """estimator_helpers.py:227-243."""
        pose = jnp.asarray(pose, dtype=jnp.float32)
        rot = rot_x(jnp.pi / 2) @ pose[:3, :3]
        trans = pose[:3, 3]
        p, t = nerf_matrix_to_ngp_jax(rot, trans)
        new_pose = jnp.eye(4).at[:3, :3].set(p).at[:3, 3].set(t)
        rays = self.get_rays(new_pose.reshape((1, 4, 4)))
        output = self.render_fn(rays["rays_o"], rays["rays_d"])
        return jnp.squeeze(output["image"])

    def render_for_uncertainty(self, pose):
        """estimator_helpers.py:245-259: returns (output dict, rays_o, rays_d)."""
        pose = jnp.asarray(pose, dtype=jnp.float32)
        rot = rot_x(jnp.pi / 2) @ pose[:3, :3]
        trans = pose[:3, 3]
        p, t = nerf_matrix_to_ngp_jax(rot, trans)
        new_pose = jnp.eye(4).at[:3, :3].set(p).at[:3, 3].set(t)
        rays = self.get_rays(new_pose.reshape((1, 4, 4)))
        output = self.render_fn(rays["rays_o"], rays["rays_d"])
        return output, rays["rays_o"], rays["rays_d"]

    # ----------------------------------------------------------- pose update
    def _build_fit(self):
        tx = optax.adam(self.lrate, b1=0.9, b2=0.999)
        n_iter = self.iter

        @jax.jit
        def fit(state0, start_state, sig, target, batch, rp):
            opt_state = tx.init(state0)

            def body(i, carry):
                state, opt_state, losses = carry
                loss, grads = jax.value_and_grad(self.measurement_fn)(
                    state, start_state, sig, target, batch, rp)
                updates, opt_state = tx.update(grads, opt_state, state)
                state = optax.apply_updates(state, updates)
                losses = losses.at[i].set(loss)
                return state, opt_state, losses

            losses = jnp.zeros((n_iter,))
            state, opt_state, losses = jax.lax.fori_loop(
                0, n_iter, body, (state0, opt_state, losses))
            return state, losses

        return fit

    def estimate_relative_pose(self, sensor_image, start_state, sig,
                               obs_img_pose=None):
        """estimator_helpers.py:77-189. sensor_image: uint8 [H, W, 3]."""
        obs_img = np.asarray(sensor_image)
        W_obs, H_obs = obs_img.shape[0], obs_img.shape[1]

        if self.fixed_coords is not None:
            target = jnp.asarray(obs_img.astype(np.float32) / 255.0)
            batch = jnp.asarray(self.fixed_coords, dtype=jnp.int32)
            optimized0 = jnp.asarray(start_state) + 1e-6
            if self._fit is None:
                self._fit = self._build_fit()
            optimized, losses = self._fit(optimized0,
                                          jnp.asarray(start_state),
                                          sig, target, batch,
                                          self.render_params)
            self.target = target
            self.batch = batch
            self.losses = np.asarray(losses).tolist()
            self.states = [np.asarray(optimized).tolist()]
            return optimized, True

        POI, extras = find_POI(obs_img, render=self.render_viz)
        print(f"Found {POI.shape[0]} features")
        if len(POI.shape) == 1 or POI.shape[0] == 0:
            self.losses = []
            self.states = []
            print("Feature Detection Failed.".center(20, "."))
            return jnp.asarray(start_state), False

        target = jnp.asarray(obs_img.astype(np.float32) / 255.0)

        # dilated interest-region mask (estimator_helpers.py:100-108)
        interest = np.zeros((H_obs, W_obs), dtype=np.uint8)
        POI = POI[(POI[:, 0] < H_obs) & (POI[:, 1] < W_obs)]
        interest[POI[:, 0], POI[:, 1]] = 1
        try:
            import cv2
            interest = cv2.dilate(
                interest, np.ones((self.kernel_size, self.kernel_size),
                                  np.uint8), iterations=self.dil_iter)
        except Exception:
            from scipy import ndimage
            interest = ndimage.binary_dilation(
                interest, np.ones((self.kernel_size, self.kernel_size)),
                iterations=self.dil_iter).astype(np.uint8)
        coords = np.argwhere(interest.astype(bool))  # [M, 2] (row, col)

        # fixed-size batch (static shape for jit); sample w/ replacement when
        # the region is smaller than batch_size
        rng = np.random.default_rng(self.iteration)
        take = self.batch_size
        replace = coords.shape[0] < take
        idx = rng.choice(coords.shape[0], size=take, replace=replace)
        batch = jnp.asarray(coords[idx], dtype=jnp.int32)

        optimized0 = jnp.asarray(start_state) + 1e-6
        if self._fit is None:
            self._fit = self._build_fit()
        optimized, losses = self._fit(optimized0, jnp.asarray(start_state),
                                      sig, target, batch,
                                      self.render_params)

        if obs_img_pose is not None:
            pose = np.eye(4)
            pose[:3, :3] = np.asarray(vec_to_rot_matrix(optimized[6:9]))
            pose[:3, 3] = np.asarray(optimized[:3])
            print("final error", calcSE3Err(pose, np.asarray(obs_img_pose)))

        self.target = target
        self.batch = batch
        self.losses = np.asarray(losses).tolist()
        self.states = [np.asarray(optimized).tolist()]
        print("Done with main relative_pose_estimation loop")
        return optimized, True

    def estimate_state(self, sensor_img, obs_img_pose, action):
        """estimator_helpers.py:261-319."""
        action = jnp.asarray(action, dtype=jnp.float32).reshape(-1)
        self.xt = self.agent.drone_dynamics(self.xt, action)
        self.action = np.asarray(action).tolist()

        # 12x12 dynamics Jacobian (reference: autograd.functional.jacobian)
        A = jax.jacfwd(lambda x: self.agent.drone_dynamics(x, action))(self.xt)
        sig_prop = A @ self.sig @ A.T + self.Q

        xt, success = self.estimate_relative_pose(
            sensor_img, jnp.asarray(self.xt), sig_prop,
            obs_img_pose=obs_img_pose)

        if self.is_filter and success:
            hess = jax.hessian(
                lambda x: self.measurement_fn(x, jnp.asarray(self.xt),
                                              sig_prop, self.target,
                                              self.batch,
                                              self.render_params))(
                jnp.asarray(xt))
            self.sig = jnp.linalg.inv(hess)

        self.xt = xt
        self.covariance = np.asarray(self.sig).tolist()
        self.state_estimate = np.asarray(self.xt).tolist()

        if self.basefolder is not None:
            save_path = pathlib.Path(self.basefolder) / "estimator_data" / \
                f"step{self.iteration}.json"
            save_path.parent.mkdir(parents=True, exist_ok=True)
            self.save_data(save_path)
        self.iteration += 1
        return jnp.asarray(self.xt)

    def save_data(self, filename):
        with open(filename, "w+") as f:
            json.dump({
                "loss": self.losses,
                "covariance": self.covariance,
                "state_estimate": self.state_estimate,
                "grad_states": self.states,
                "action": self.action,
            }, f, indent=4)
