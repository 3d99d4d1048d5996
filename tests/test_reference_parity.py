"""Numerical parity vs the reference's pure-PyTorch components.

The reference repo (mounted read-only at /root/reference) has CPU-runnable
torch implementations of the rotation math, quadrotor dynamics and the
planner's trajectory reconstruction. These tests feed identical inputs
through both stacks and require matching outputs — the strongest available
fidelity check without CUDA. Skipped when the reference mount is absent.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not __import__("os").path.isdir(REF),
                                reason="reference repo not mounted")

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_math():
    from nav import math_utils as ref_math_utils
    return ref_math_utils


class TestRotationParity:
    def test_vec_to_rot_matrix(self, ref_math):
        from nerfsafetyvalidation_tpu.nav.math_utils import vec_to_rot_matrix
        rng = np.random.default_rng(0)
        for _ in range(10):
            v = rng.normal(size=3).astype(np.float32)
            ours = np.asarray(vec_to_rot_matrix(jnp.asarray(v)))
            ref = ref_math.vec_to_rot_matrix(torch.from_numpy(v)).numpy()
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_rot_matrix_to_vec(self, ref_math):
        from nerfsafetyvalidation_tpu.nav.math_utils import (
            vec_to_rot_matrix, rot_matrix_to_vec)
        rng = np.random.default_rng(1)
        for _ in range(10):
            v = (rng.normal(size=3) * 0.8).astype(np.float32)
            R = np.asarray(vec_to_rot_matrix(jnp.asarray(v)))
            ours = np.asarray(rot_matrix_to_vec(jnp.asarray(R[None])))[0]
            ref = ref_math.rot_matrix_to_vec(
                torch.from_numpy(R[None])).numpy()[0]
            np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_nerf_matrix_to_ngp_torch(self, ref_math):
        from nerfsafetyvalidation_tpu.nav.math_utils import nerf_matrix_to_ngp_jax
        rng = np.random.default_rng(2)
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        p_ours, t_ours = nerf_matrix_to_ngp_jax(jnp.asarray(R), jnp.asarray(t))
        p_ref, t_ref = ref_math.nerf_matrix_to_ngp_torch(
            torch.from_numpy(R), torch.from_numpy(t))
        np.testing.assert_allclose(np.asarray(p_ours), p_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_ours), t_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestDynamicsParity:
    def test_drone_dynamics(self):
        """agent_helpers.drone_dynamics vs ours on identical states."""
        import importlib
        agent_helpers = importlib.import_module("nav.agent_helpers")
        from nerfsafetyvalidation_tpu.nav.agent import drone_dynamics

        class Shim:
            dt = 0.1
            g = 10.0
            mass = 1.0
            I = torch.eye(3)
            invI = torch.eye(3)
        shim = Shim()

        rng = np.random.default_rng(3)
        for _ in range(5):
            state = (rng.normal(size=12) * 0.3).astype(np.float32)
            action = np.asarray([10.0 + rng.normal() * 0.5,
                                 *rng.normal(size=3) * 0.05],
                                dtype=np.float32)
            ref = agent_helpers.Agent.drone_dynamics(
                shim, torch.from_numpy(state),
                torch.from_numpy(action)).numpy()
            ours = np.asarray(drone_dynamics(
                jnp.asarray(state), jnp.asarray(action), 0.1, 10.0, 1.0,
                jnp.eye(3), jnp.eye(3)))
            np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestPlannerParity:
    def test_calc_everything(self):
        """quad_plot.Planner.calc_everything vs ours on identical states."""
        import importlib
        quad_plot = importlib.import_module("nav.quad_plot")
        from nerfsafetyvalidation_tpu.ops import trunc_exp  # noqa: F401
        from nerfsafetyvalidation_tpu.nav.planner import calc_everything

        rng = np.random.default_rng(4)
        steps = 6
        start = np.zeros(18, dtype=np.float32)
        start[:3] = [-0.7, -0.7, 0.1]
        start[6:15] = np.eye(3).reshape(-1)
        end = np.zeros(18, dtype=np.float32)
        end[:3] = [0.7, 0.7, 0.2]
        end[6:15] = np.eye(3).reshape(-1)

        cfg = {"T_final": 2.0, "steps": steps, "lr": 1e-3, "epochs_init": 1,
               "epochs_update": 1, "fade_out_epoch": 0,
               "fade_out_sharpness": 10, "mass": 1.0, "I": torch.eye(3),
               "g": 10.0, "body": torch.tensor([[-0.05, 0.05], [-0.05, 0.05],
                                                [-0.02, 0.02]]),
               "nbins": [2, 2, 2]}
        planner = quad_plot.Planner(torch.from_numpy(start),
                                    torch.from_numpy(end), cfg,
                                    lambda x: torch.zeros(x.shape[:-1]))
        states = (rng.normal(size=(steps - 2, 4)) * 0.1).astype(np.float32)
        states[:, :3] += np.linspace(start[:3], end[:3], steps)[1:-1]
        ia = np.asarray([10.0, 10.0], dtype=np.float32)
        planner.states = torch.from_numpy(states)
        planner.initial_accel = torch.from_numpy(ia)
        ref_out = planner.calc_everything()

        ours = calc_everything(jnp.asarray(states), jnp.asarray(ia),
                               jnp.asarray(start), jnp.asarray(end),
                               2.0 / steps, jnp.asarray([0.0, 0.0, -10.0]),
                               jnp.eye(3), 1.0)
        names = ["pos", "vel", "accel", "rot", "omega", "ang_accel", "actions"]
        for name, a, b in zip(names, ours, ref_out):
            np.testing.assert_allclose(
                np.asarray(a), b.detach().numpy(), rtol=2e-3, atol=2e-4,
                err_msg=f"calc_everything mismatch in {name}")


class TestEncoderTableParity:
    def test_grid_encoder_offsets(self):
        """Our table layout vs the reference GridEncoder's offsets buffer."""
        sys.modules.pop("gridencoder", None)
        try:
            import importlib
            grid_mod = importlib.import_module("gridencoder.grid")
        except Exception:
            pytest.skip("reference gridencoder python wrapper unimportable "
                        "(CUDA build required)")
        from nerfsafetyvalidation_tpu.ops.hash_encoding import HashGridSpec
        spec = HashGridSpec.make(desired_resolution=2048)
        enc = grid_mod.GridEncoder(desired_resolution=2048)
        np.testing.assert_array_equal(np.asarray(spec.offsets),
                                      enc.offsets.numpy())
