"""Closed-loop batched rollout engine — the filtered-MPC validation loop
inside one jitted program.

The open-loop `FullBatchedRolloutEngine` (batched.py) precomputes the
planner's action sequence and excludes the estimator/replan from the jit
boundary. This engine closes the loop: per (sim, step), INSIDE `vmap(scan)`,

  1. the next action is read off the sim's CURRENT plan
     (quad_plot.py:211-214 `get_next_action`),
  2. the true state evolves through the disturbed dynamics
     (agent_helpers.py:43-77),
  3. the measurement target is rendered from the true pose along the
     estimator's observation chain (estimator_helpers.py:227-243
     `render_from_pose`: rot_x(pi/2) @ R then the NGP axis remap) at a
     FIXED interest-pixel set — the traceable stand-in for SIFT find_POI +
     dilation + RNG batch sampling (estimator_helpers.py:10-36, 100-125;
     SIFT stays a sequential-mode, host-cv2 luxury). The sequential
     `Estimator` accepts the same pixel set via filter_cfg["fixed_coords"],
     which is what the cross-check test uses,
  4. the estimator runs: dynamics-propagated mean, jacfwd 12x12 covariance
     propagation (estimator_helpers.py:261-285), the N_iter Adam pose fit on
     the photometric + Mahalanobis measurement (:77-225), and the posterior
     covariance from the measurement Hessian at the optimum (:286-319),
  5. the planner replans: `update_state` horizon shift in fixed-horizon
     form (constant knot count — quad_plot.py:302-308 drops a knot per
     step; the fixed-horizon delta is documented in COMPONENTS.md) and an
     `epochs_update`-step Adam block on the exact planner cost
     (quad_plot.py:223-300 via nav.planner.planner_cost_terms),
  6. the 4-point interpolated SDF collision check freezes collided sims
     (NerfSimulator.py:93-98, 142-155).

Everything is fixed-shape and fixed-iteration, so the whole population of
closed-loop simulations compiles once and runs as one device program —
the TPU-native form of validation/simulators/NerfSimulator.py:66-155.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..nav.agent import drone_dynamics
from ..nav.planner import calc_everything, planner_cost_terms
from ..nav.math_utils import (vec_to_rot_matrix, mahalanobis, rot_x,
                              nerf_matrix_to_ngp_jax)
from ..data.rays import rays_for_pixels
from .batched import BatchedRolloutEngine, FullBatchedRolloutEngine


def _finite_risks(risks):
    """Divergence bailout for CEM elite selection: a rollout whose
    dynamics escape the workspace produces non-finite states and a
    non-finite risk; treat it as +inf (maximally uninteresting) so it can
    never enter the elite set and corrupt the proposal update. Mirrors
    the reference's out-of-bounds convention (SDF IndexError -> "not
    collided", NerfSimulator.py:142-144) and its zero-weight bailout
    (CrossEntropyMethod.py:264-274). Observed live: an obs-800^2 sweep
    had 3 rollouts fly out of bounds (sdf ~ -72) and NaN their UQ chain."""
    risks = np.asarray(risks, dtype=np.float64)
    return np.where(np.isfinite(risks), risks, np.inf)


def state12_to_18(x):
    """12-state (rotvec) -> 18-state (rot matrix) (NerfSimulator.py:135-138)."""
    return jnp.concatenate([x[:6], vec_to_rot_matrix(x[6:9]).reshape(-1),
                            x[9:]], axis=-1)


class ClosedLoopBatchedEngine(BatchedRolloutEngine):
    """Population of independent closed-loop (estimate + replan) simulations
    as one `vmap(scan)` program."""

    _sdf_check_interp = FullBatchedRolloutEngine._sdf_check_interp

    def __init__(self, *, steps, dt, g, mass, I, sdf, sdf_start, granularity,
                 noise_mean, noise_std, start_state,
                 # estimator (filter_cfg analog)
                 fixed_coords, intrinsics, obs_hw, render_rays_fn,
                 n_iter=20, est_lr=1e-3, sig0=None, Q=None, filter=True,
                 # planner (planner_cfg analog)
                 end_state, knots0, initial_accel0, epochs_update=2,
                 planner_lr=1e-3, density_fn, robot_body,
                 fade_out_epoch=0, fade_out_sharpness=10.0,
                 quantize_target=True, obs_render="pixels", mesh=None,
                 render_params=None, uq_engine=None, sim_group=None):
        """start_state: [12] true start (rotvec form); end_state: [18]
        planner goal; knots0: [S, 4] initial plan knots (from a host-side
        `Planner.a_star_init` + `learn_init`, exactly as NerfSimulator.reset
        does, NerfSimulator.py:183-223); initial_accel0: [2];
        fixed_coords: [B, 2] integer (row, col) interest pixels;
        render_rays_fn(rays_o [N,3], rays_d [N,3]) -> {"image": [N, 3]}, a
        traceable per-ray renderer (the estimator's render_batch_fn);
        density_fn: [..., 3] -> [...] planner collision density;
        quantize_target: floor(img*255)/255 on the measurement target,
        matching the sequential loop's uint8 camera round-trip
        (NerfSimulator.py:115 -> estimator_helpers.py:85);
        render_params: optional pytree of network/render parameters. When
        given, render_rays_fn and density_fn are called as fn(params, ...)
        and the pytree is threaded through the jit as an ARGUMENT instead
        of being closure-captured — required for real checkpoints: a
        captured fold/hash table becomes a baked HLO constant, which blows
        past the remote-compile request limit on the tunneled TPU (the
        same fix as FullBatchedRolloutEngine's run_impl(params, ...),
        batched.py:601);
        uq_engine: optional FullBatchedRolloutEngine. When given, every
        closed-loop step ALSO renders the observation through the UQ
        engine's obs chain and computes the uncertainty-masked reward
        (Gaussian or Laplace per uq_engine.uq_method) — the reference's
        COMPLETE NerfSimulator.step semantics (NerfSimulator.py:66-181:
        estimate + replan + UQ reward per step), previously split between
        the two engines. Outputs gain "sigma_d" and "reward" columns and
        `cem()` applies the reference's reward-scaled risk adjustment
        (CEM.py:110-122). The UQ engine's params/renderer_state ride the
        jit as arguments (same 413 discipline);
        obs_render: "pixels" (default) renders ONLY the fixed interest
        pixels as the measurement target — the TPU-native zero-waste form;
        "frame" renders the FULL obs_hw observation in-scan (the
        reference camera produces a whole image every step,
        NerfSimulator.py:113-115) and gathers the interest pixels from it
        — the like-for-like configuration for obs-size scaling tables
        (the per-iteration estimator candidates render the pixel batch in
        both modes, exactly as the sequential estimator does);
        sim_group: run() vmaps at most this many simulations per device
        program and loops the population in chunks (the closed-loop
        sibling of FullBatchedRolloutEngine's obs_group) — required for
        obs_render="frame" at the reference 800^2 observation size, where
        one sim's in-scan frame intermediates are ~GBs and a full
        population vmap exceeds HBM."""
        self.fixed_coords = jnp.asarray(np.asarray(fixed_coords), jnp.int32)
        self.intrinsics = tuple(float(v) for v in intrinsics)
        self.obs_hw = (int(obs_hw[0]), int(obs_hw[1]))
        self.render_rays_fn = render_rays_fn
        self.n_iter = int(n_iter)
        self.est_lr = float(est_lr)
        self.sig0 = (jnp.eye(12) if sig0 is None
                     else jnp.asarray(sig0, jnp.float32))
        self.Q = jnp.eye(12) if Q is None else jnp.asarray(Q, jnp.float32)
        self.filter = bool(filter)
        self.end_state18 = jnp.asarray(end_state, jnp.float32)
        self.knots0 = jnp.asarray(knots0, jnp.float32)
        self.initial_accel0 = jnp.asarray(initial_accel0, jnp.float32)
        self.epochs_update = int(epochs_update)
        self.planner_lr = float(planner_lr)
        self.density_fn = density_fn
        self.robot_body = jnp.asarray(robot_body, jnp.float32)
        self.fade_out_epoch = float(fade_out_epoch)
        self.fade_out_sharpness = float(fade_out_sharpness)
        self.quantize_target = bool(quantize_target)
        if obs_render not in ("pixels", "frame"):
            raise ValueError(f"unknown obs_render {obs_render!r}")
        self.obs_render = obs_render
        self.sim_group = None if sim_group is None else int(sim_group)
        self.render_params = render_params
        self.uq_engine = uq_engine
        actions = jnp.zeros((int(steps), 4), jnp.float32)  # computed in-scan
        super().__init__(actions, dt, g, mass, I, sdf, sdf_start, granularity,
                         noise_mean, noise_std, start_state, mesh=mesh)

    # ------------------------------------------------------------- rendering
    def _obs_pose(self, state12):
        """Observation camera pose at the true state, along the estimator's
        render_from_pose chain (estimator_helpers.py:227-243): the agent
        reports the body-frame pose (agent_helpers.py:75) and
        render_from_pose applies rot_x(pi/2) before the NGP remap."""
        R = vec_to_rot_matrix(state12[6:9])
        rot = rot_x(jnp.pi / 2) @ R
        p, t = nerf_matrix_to_ngp_jax(rot, state12[:3])
        return jnp.eye(4).at[:3, :3].set(p).at[:3, 3].set(t)

    def _obs_rays(self, state12):
        """Measurement-target rays at the true state (interest pixels)."""
        return rays_for_pixels(self._obs_pose(state12), self.intrinsics,
                               self.fixed_coords)

    def _render(self, rp, rays_o, rays_d):
        """render_rays_fn dispatch: with render_params configured the
        params pytree rides the jit as an argument (see __init__)."""
        if self.render_params is None:
            return self.render_rays_fn(rays_o, rays_d)
        return self.render_rays_fn(rp, rays_o, rays_d)

    def _density(self, rp, x):
        if self.render_params is None:
            return self.density_fn(x)
        return self.density_fn(rp, x)

    def _target_pixels(self, state12, rp):
        """Measurement target values at the interest pixels. "pixels"
        renders only those rays; "frame" renders the whole obs_hw image
        (the reference camera's full capture, NerfSimulator.py:113-115),
        quantizes it, and gathers the pixels — identical values when
        quantize_target matches, but the frame render is what an obs-size
        scaling table must pay for."""
        if self.obs_render == "frame":
            from ..data.rays import get_rays
            H, W = self.obs_hw
            pose = self._obs_pose(state12)
            rays = get_rays(pose[None], self.intrinsics, H, W)
            img = self._render(rp, rays["rays_o"].reshape(1, -1, 3),
                               rays["rays_d"].reshape(1, -1, 3))
            img = img["image"].reshape(H, W, 3)
            if self.quantize_target:
                img = jnp.floor(jnp.clip(img, 0.0, 1.0) * 255.0) / 255.0
            return img[self.fixed_coords[:, 0], self.fixed_coords[:, 1]]
        ro, rd = self._obs_rays(state12)
        img = self._render(rp, ro.reshape(1, -1, 3),
                           rd.reshape(1, -1, 3))["image"]
        target_vals = img.reshape(-1, 3)
        if self.quantize_target:
            target_vals = jnp.floor(
                jnp.clip(target_vals, 0.0, 1.0) * 255.0) / 255.0
        return target_vals

    def _est_rays(self, state12):
        """Candidate-pose rays inside the measurement (Estimator.
        _pose_from_state, estimator_helpers.py:199-208): same chain."""
        return self._obs_rays(state12)

    def _measurement(self, state, prop_mean, sig_prop, target_vals, rp):
        """Photometric + dynamics-prior loss on the fixed pixel batch
        (estimator_helpers.py:191-225)."""
        loss_dyn = mahalanobis(state, prop_mean, sig_prop)
        ro, rd = self._est_rays(state)
        out = self._render(rp, ro.reshape(1, -1, 3), rd.reshape(1, -1, 3))
        rgb = out["image"].reshape(-1, 3)
        return jnp.mean((rgb - target_vals) ** 2) + loss_dyn

    # -------------------------------------------------------------- one step
    def _estimate(self, xt, sig, action, target_vals, rp):
        """Propagate + N_iter Adam fit + Hessian posterior — the jitted form
        of Estimator.estimate_state (estimator_helpers.py:261-319)."""
        dyn = lambda x: drone_dynamics(x, action, self.dt, self.g, self.mass,
                                       self.I, self.invI)
        xt_prop = dyn(xt)
        # the Jacobian is evaluated at the PROPAGATED state, as the
        # sequential estimator does (estimator_helpers.py:271-277)
        A = jax.jacfwd(dyn)(xt_prop)
        sig_prop = A @ sig @ A.T + self.Q

        meas = lambda s: self._measurement(s, xt_prop, sig_prop,
                                           target_vals, rp)
        tx = optax.adam(self.est_lr, b1=0.9, b2=0.999)
        state0 = xt_prop + 1e-6                 # estimator_helpers.py:126

        def body(i, carry):
            s, opt_state = carry
            loss, grads = jax.value_and_grad(meas)(s)
            updates, opt_state = tx.update(grads, opt_state, s)
            return optax.apply_updates(s, updates), opt_state

        opt, _ = jax.lax.fori_loop(0, self.n_iter, body,
                                   (state0, tx.init(state0)))
        if self.filter:
            hess = jax.hessian(meas)(opt)
            sig_new = jnp.linalg.inv(hess)
        else:
            sig_new = sig_prop
        return opt, sig_new

    def _replan(self, knots, ia, start18, rp):
        """Fresh-optimizer Adam block on the exact planner cost — the jitted
        learn_update (quad_plot.py:278-300 / nav/planner.py:_learn; the
        optimizer state is re-initialized per replan exactly as _learn
        does)."""
        params = {"states": knots, "initial_accel": ia}
        tx = optax.adam(self.planner_lr)

        def body(i, carry):
            params, opt_state = carry

            def loss_fn(p):
                total, _ = planner_cost_terms(
                    p["states"], p["initial_accel"], start18,
                    self.end_state18, i,
                    density_fn=lambda x: self._density(rp, x),
                    dt=self.dt, g_vec=jnp.asarray([0.0, 0.0, -self.g]),
                    J=self.I, mass=self.mass, robot_body=self.robot_body,
                    fade_out_epoch=self.fade_out_epoch,
                    fade_out_sharpness=self.fade_out_sharpness)
                return jnp.mean(total)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, self.epochs_update, body,
                                      (params, tx.init(params)))
        return params["states"], params["initial_accel"]

    # ------------------------------------------------------------------ build
    def _uq_reward(self, true_next, loglik, key_sim, t):
        """Observation UQ + safety-masked reward through the composed
        FullBatchedRolloutEngine (NerfSimulator.py:159-181). Called inside
        the traced step with the UQ engine's params already swapped to the
        jit arguments (see run_impl)."""
        uq = self.uq_engine
        key_t = jax.random.fold_in(key_sim, t)
        obs = uq._render_obs(true_next)
        if uq.uq_method == "laplace":
            trace_v, rmv = uq._laplace_uq(key_t, obs["rays_o"],
                                          obs["rays_d"], obs["agg"])
            return rmv, uq._reward_laplace(loglik, rmv, trace_v)
        if "moments" in obs:
            n_samp = obs["rays_o"].shape[0] * obs["K"]
            _, sigma_d = uq._gaussian_uq_from_moments(
                obs["moments"], obs["image"], float(n_samp))
        else:
            _, sigma_d = uq._gaussian_uq(obs["rgbs"], obs["sigmas"],
                                         obs["image"])
        return sigma_d, uq._reward(loglik, sigma_d)

    def _build(self):

        def sim_step(rp, key_sim, carry, noise_t_and_t):
            noise, t = noise_t_and_t
            true, xt, sig, knots, ia, done = carry

            # 1. action off the current plan (quad_plot.py:211-214); the
            #    plan's start state is the last ESTIMATE (update_state)
            start18 = state12_to_18(xt)
            _, _, _, _, _, _, actions = calc_everything(
                knots, ia, start18, self.end_state18, self.dt,
                jnp.asarray([0.0, 0.0, -self.g]), self.I, self.mass)
            action = actions[0]

            # 2. disturbed true dynamics (agent_helpers.py:43-77)
            true_next = drone_dynamics(true, action, self.dt, self.g,
                                       self.mass, self.I, self.invI) + noise

            # 3. measurement target at the true pose (NerfSimulator.py:113-115)
            target_vals = self._target_pixels(true_next, rp)

            # 4. estimator (estimator_helpers.py:261-319)
            xt_new, sig_new = self._estimate(xt, sig, action, target_vals,
                                             rp)

            # 5. planner update_state + learn_update (quad_plot.py:278-308):
            #    initial_accel from the OLD plan's actions[1:3, 0], then the
            #    fixed-horizon knot shift, then the replan block
            ia_new = actions[1:3, 0]
            knots_shift = jnp.concatenate([knots[1:], knots[-1:]], axis=0)
            start18_new = state12_to_18(xt_new)
            knots_new, ia_new = self._replan(knots_shift, ia_new,
                                             start18_new, rp)

            # 6. 4-point interpolated SDF check (NerfSimulator.py:93-155)
            hit, sdf_val, pos = self._sdf_check_interp(true, true_next, t)
            collided_now = hit & ~done

            # freeze everything once collided (the sequential loop breaks)
            keep = lambda new, old: jnp.where(done, old, new)
            true_next = keep(true_next, true)
            xt_new = keep(xt_new, xt)
            sig_new = keep(sig_new, sig)
            knots_new = keep(knots_new, knots)
            ia_new = keep(ia_new, ia)

            loglik = self._log_likelihood(noise)
            if self.uq_engine is not None:
                sigma_d, reward = self._uq_reward(true_next, loglik,
                                                  key_sim, t)
            else:
                sigma_d = jnp.asarray(0.0)
                reward = jnp.asarray(0.0)
            out = (true_next, xt_new, action, pos, sdf_val, collided_now,
                   loglik, sigma_d, reward)
            return ((true_next, xt_new, sig_new, knots_new, ia_new,
                     done | collided_now), out)

        def rollout(noises, rp, key_sim):
            """noises: [T, 12] -> one closed-loop simulation."""
            init = (self.start_state, self.start_state, self.sig0,
                    self.knots0, self.initial_accel0, jnp.asarray(False))
            ts = jnp.arange(self.steps)
            (_, _, _, _, _, ever), outs = jax.lax.scan(
                lambda c, x: sim_step(rp, key_sim, c, x), init,
                (noises, ts))
            (true_states, est_states, actions, positions, sdf_vals,
             collided, logliks, sigmas, rewards) = outs
            return {
                "true_states": true_states,      # [T, 12]
                "est_states": est_states,        # [T, 12]
                "actions": actions,              # [T, 4]
                "positions": positions,          # [T, 3] (SDF check points)
                "sdf_vals": sdf_vals,            # [T]
                "collided": collided,            # [T]
                "ever_collided": ever,           # []
                "log_likelihoods": logliks,      # [T]
                "sigma_d": sigmas,               # [T] (0 without uq_engine)
                "reward": rewards,               # [T] (0 without uq_engine)
                "risk": jnp.min(sdf_vals),
            }

        batched = jax.vmap(rollout, in_axes=(0, None, 0))
        uq = self.uq_engine

        def run_impl(noises, rp, uqp, uqst, keys):
            if uq is None:
                return batched(noises, rp, keys)
            # swap the UQ engine's tables for the traced arguments so its
            # _render_obs/_laplace_uq see arrays, not baked HLO constants
            old = uq.params, uq.renderer_state
            uq.params, uq.renderer_state = uqp, uqst
            try:
                return batched(noises, rp, keys)
            finally:
                uq.params, uq.renderer_state = old

        return jax.jit(run_impl)

    def run(self, noises, uq_key=None):
        """noises: [n_sims, T, 12] -> dict of batched rollout outputs.
        render_params / the UQ engine's tables ride as jit arguments —
        swapping checkpoints between runs costs no recompile. uq_key seeds
        the Laplace branch's per-(sim, step) random inits."""
        noises = jnp.asarray(noises, dtype=jnp.float32)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            noises = shard_batch(noises, self.mesh, batch_axis=0)
        n = noises.shape[0]
        key = jax.random.PRNGKey(0) if uq_key is None else uq_key
        keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(n))
        uqp = self.uq_engine.params if self.uq_engine is not None else None
        uqst = self.uq_engine.renderer_state \
            if self.uq_engine is not None else None
        g = self.sim_group
        if g is None or g >= n or self.mesh is not None:
            return self._run(noises, self.render_params, uqp, uqst, keys)
        # population chunking: one compiled program of g sims, looped.
        # The last chunk is padded to g (one compile total) and trimmed.
        chunks = []
        for i in range(0, n, g):
            nz, kz = noises[i:i + g], keys[i:i + g]
            pad = g - nz.shape[0]
            if pad:
                nz = jnp.concatenate([nz, jnp.repeat(nz[:1], pad, 0)], 0)
                kz = jnp.concatenate([kz, jnp.repeat(kz[:1], pad, 0)], 0)
            out = self._run(nz, self.render_params, uqp, uqst, kz)
            if pad:
                out = jax.tree_util.tree_map(lambda a, p=pad: a[:-p], out)
            chunks.append(out)
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    def cem(self, key, m: int, m_elite: int, kmax: int, csv_path=None):
        """CLOSED-LOOP CEM: the reference's CEM semantics end to end —
        every rollout steps the full simulator (estimate + replan + UQ
        reward) and the risk carries the reward-scaled adjustment
        (CEM.py:110-122) when a uq_engine is composed. Proposals are
        full-covariance Cholesky with the exact sequential update;
        csv_path appends the 27-column reference schema
        (CrossEntropyMethod.py:173-189)."""
        import csv
        from .batched import _cem_proposal_update
        means = np.broadcast_to(np.asarray(self.noise_mean),
                                (self.steps, 12)).copy()
        covs = np.broadcast_to(np.diag(np.asarray(self.noise_std) ** 2),
                               (self.steps, 12, 12)).copy()
        p_mean, p_cov = means.copy(), covs.copy()
        history = []
        for k in range(kmax):
            key, sub, kuq = jax.random.split(key, 3)
            noises = self.sample_noises(sub, m, jnp.asarray(means),
                                        covs=jnp.asarray(covs))
            out = {kk: np.asarray(v)
                   for kk, v in self.run(noises, uq_key=kuq).items()}
            nz = np.asarray(noises)
            # reward-scaled collision value (CEM.py:110-122); without a
            # uq_engine reward is 0 and adj == sdf (plain min-SDF risk)
            adj = out["sdf_vals"] - out["reward"] * 0.01 * out["sdf_vals"]
            risks = np.empty(m)
            for i in range(m):
                T_i = self.steps
                if out["collided"][i].any():
                    T_i = int(np.argmax(out["collided"][i])) + 1
                risks[i] = adj[i, :T_i].min()
            risks = _finite_risks(risks)

            if csv_path is not None:
                os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
                lp_steps = np.stack([self._mvn_logpdf(
                    nz[:, t], p_mean[t], p_cov[t])
                    for t in range(self.steps)], axis=1)
                lq_steps = np.stack([self._mvn_logpdf(
                    nz[:, t], means[t], covs[t])
                    for t in range(self.steps)], axis=1)
                lp_cum = np.cumsum(lp_steps, axis=1)
                lq_cum = np.cumsum(lq_steps, axis=1)
                # reward_prev = previous step's reward (CSV semantics)
                r_prev = np.concatenate(
                    [np.zeros((m, 1)), out["reward"][:, :-1]], axis=1)
                with open(csv_path, "a", newline="") as f:
                    w = csv.writer(f)
                    for i in range(m):
                        ever = bool(out["collided"][i].any())
                        for t in range(self.steps):
                            row = [k, i, t]
                            row.extend(nz[i, t].tolist())
                            row.append(float(r_prev[i, t]))
                            row.append(float(out["sigma_d"][i, t]))
                            row.append(float(adj[i, t]))
                            row.extend(out["positions"][i, t].tolist())
                            row.append(float(lp_steps[i, t]))
                            row.append(float(lq_steps[i, t]))
                            row.append(float(lp_cum[i, t]))
                            row.append(float(lq_cum[i, t]))
                            row.append(bool(out["collided"][i, t]))
                            row.append(ever)
                            w.writerow(row)
                            if out["collided"][i, t]:
                                break

            elite_idx = np.argsort(risks)[:m_elite]
            means, covs = _cem_proposal_update(nz[elite_idx], means, covs,
                                               p_mean, p_cov)
            finite = risks[np.isfinite(risks)]
            history.append({
                "mean_risk": float(finite.mean()) if finite.size
                else float("nan"),
                "elite_risk": float(risks[elite_idx].mean()),
                "collision_rate": float(out["collided"].any(1).mean()),
                "n_diverged": int(m - finite.size),
            })
        return {"means": means, "covs": covs,
                "vars": np.stack([np.diag(c) for c in covs]),
                "history": history}

    # ------------------------------------------------------------------- API
    def monte_carlo(self, key, n_sims: int):
        """Batched closed-loop MC sweep (the NerfSimulator MC configuration,
        MonteCarlo.py:38-93 with the estimate/replan loop live)."""
        key, kuq = jax.random.split(key)
        noises = self.sample_noises(key, n_sims)
        out = self.run(noises, uq_key=kuq)
        ever = np.asarray(out["ever_collided"])
        return {
            "noises": np.asarray(noises),
            "collision_rate": float(ever.mean()),
            "ever_collided": ever,
            "true_states": np.asarray(out["true_states"]),
            "est_states": np.asarray(out["est_states"]),
            "risk": np.asarray(out["risk"]),
            "positions": np.asarray(out["positions"]),
            "log_likelihoods": np.asarray(out["log_likelihoods"]),
        }
