"""Single nerf-nav MPC simulation (plan -> act -> estimate loop).

Parity target: reference simulate.py:17-100 (+CLI :104-355): A* + learn_init,
then per step: planner action (open-loop for the last 5 steps), agent step
under sampled MPC noise, state estimation, horizon shift + 250-epoch replan,
finishing with the Blender trajectory visualization.
"""

import pathlib
import shutil
import subprocess

import numpy as np
import jax
import jax.numpy as jnp

from nerfsafetyvalidation_tpu.cli import (build_parser, apply_O_flag,
                                           enable_compile_cache)
from nerfsafetyvalidation_tpu.config import network_config_from_opt, EnvConfig
from nerfsafetyvalidation_tpu.models import make_network
from nerfsafetyvalidation_tpu.models import renderer as R
from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
from nerfsafetyvalidation_tpu.data.rays import get_rays
from nerfsafetyvalidation_tpu.train.trainer import Trainer
from nerfsafetyvalidation_tpu.utils.seeding import seed_everything, KeyChain
from nerfsafetyvalidation_tpu.nav import (Estimator, Agent, Planner,
                                          vec_to_rot_matrix,
                                          rot_matrix_to_vec)
from nerfsafetyvalidation_tpu.nav.camera import CannedCamera, NerfCamera


def simulate(planner_cfg, agent_cfg, camera_cfg, blender_cfg, filter_cfg,
             extra_cfg, density_fn, render_fn, get_rays_fn, camera=None,
             seed=0, interactive=True):
    """simulate.py:17-100."""
    start_state = planner_cfg["start_state"]
    end_state = planner_cfg["end_state"]

    basefolder = "paths" / pathlib.Path(planner_cfg["exp_name"])
    if basefolder.exists():
        print(basefolder, "already exists!")
        clear = "y"
        if interactive:
            clear = input("Clear it before continuing? [y/N]:").lower()
        if clear == "y":
            shutil.rmtree(basefolder)
    basefolder.mkdir(parents=True, exist_ok=True)
    for sub in ("init_poses", "init_costs", "replan_poses", "replan_costs",
                "estimator_data"):
        (basefolder / sub).mkdir(exist_ok=True)
    print("created", basefolder)

    traj = Planner(start_state, end_state, planner_cfg, density_fn)
    traj.basefolder = basefolder
    traj.a_star_init()
    traj.learn_init()

    start12 = jnp.concatenate([
        start_state[:6], rot_matrix_to_vec(start_state[6:15].reshape((3, 3))),
        start_state[15:]], axis=-1)
    agent_cfg = dict(agent_cfg)
    agent_cfg["x0"] = start12
    agent = Agent(agent_cfg, camera_cfg, blender_cfg, camera=camera)
    filter = Estimator(filter_cfg, agent, start12, get_rays_fn=get_rays_fn,
                       render_fn=render_fn,
                       render_batch_fn=extra_cfg.get("render_batch_fn"))
    filter.basefolder = basefolder

    true_states = np.asarray(start12)
    steps = int(traj.get_actions().shape[0])
    noise_std = jnp.asarray(extra_cfg["mpc_noise_std"], dtype=jnp.float32)
    noise_mean = jnp.asarray(extra_cfg["mpc_noise_mean"], dtype=jnp.float32)
    kc = KeyChain(seed)

    for it in range(steps):
        if it < steps - 5:
            action = traj.get_next_action()
        else:
            action = traj.get_actions()[it - steps + 5, :]

        noise = noise_mean + noise_std * jax.random.normal(kc(), noise_mean.shape)
        true_pose, true_state, gt_img = agent.step(action, noise=noise)
        true_states = np.vstack((true_states, true_state))

        state_est = filter.estimate_state(np.asarray(gt_img)[..., :3],
                                          true_pose, action)
        if it < steps - 5:
            state_est = jnp.concatenate([
                state_est[:6], vec_to_rot_matrix(state_est[6:9]).reshape(-1),
                state_est[9:]], axis=-1)
            traj.update_state(state_est)
            traj.learn_update(it)
    return true_states


def main():
    opt = build_parser("simulate").parse_args()
    opt = apply_O_flag(opt, "simulate")
    enable_compile_cache()
    env = EnvConfig.load("envConfig.json")

    seed_everything(opt.seed)
    cfg = network_config_from_opt(opt)
    net = make_network(cfg, opt)
    trainer = Trainer("ngp", opt, net, workspace=opt.workspace,
                      use_checkpoint=opt.ckpt, fp16=opt.fp16)
    params = trainer.params
    dataset = NeRFDataset(opt, type="test")

    agent_cfg = dict(env.agent_cfg)
    pcfg = env.planner_cfg
    init_rates = jnp.zeros(3)
    sp = jnp.asarray(pcfg["start_pos"], dtype=jnp.float32)
    ep = jnp.asarray(pcfg["end_pos"], dtype=jnp.float32)
    sR = vec_to_rot_matrix(jnp.asarray(pcfg["start_R"], dtype=jnp.float32))
    eR = vec_to_rot_matrix(jnp.asarray(pcfg["end_R"], dtype=jnp.float32))
    start_state = jnp.concatenate([sp, init_rates, sR.reshape(-1), init_rates])
    end_state = jnp.concatenate([ep, init_rates, eR.reshape(-1), init_rates])

    planner_cfg = {
        "T_final": pcfg["T_final"], "steps": pcfg["steps"],
        "lr": pcfg["planner_lr"], "epochs_init": pcfg["epochs_init"],
        "fade_out_epoch": pcfg["fade_out_epoch"],
        "fade_out_sharpness": pcfg["fade_out_sharpness"],
        "epochs_update": pcfg["epochs_update"],
        "start_state": start_state, "end_state": end_state,
        # basename only: the reference passes opt.workspace verbatim
        # (reference validate.py:252), but "paths" / Path(abs_workspace)
        # resolves to the ABSOLUTE path itself, and the simulator's
        # clear_workspace would then rmtree the checkpoint workspace
        "exp_name": os.path.basename(os.path.normpath(opt.workspace)),
        "fixed_horizon": getattr(opt, "fixed_horizon", False),
        "I": jnp.asarray(agent_cfg["I"], dtype=jnp.float32),
        "g": agent_cfg["g"], "mass": agent_cfg["mass"],
        "body": np.asarray(agent_cfg["body_lims"]),
        "nbins": agent_cfg["body_nbins"],
    }
    camera_cfg = dict(env.camera_cfg)
    camera_cfg["path"] = agent_cfg["path"]
    blender_cfg = {"blend_path": agent_cfg["blend_file"],
                   "script_path": "scripts/blender/viz_func.py"}
    filter_cfg = dict(env.estimator_cfg)
    filter_cfg["sig0"] = jnp.eye(12)
    filter_cfg["Q"] = jnp.eye(12)
    extra_cfg = {"mpc_noise_std": env.mpc_cfg["mpc_noise_std"],
                 "mpc_noise_mean": env.mpc_cfg["mpc_noise_mean"],
                 "render_batch_fn": lambda ro, rd: R.render(
                     net, params, ro, rd, staged=False, bg_color=1.0,
                     perturb=False, num_steps=opt.num_steps,
                     upsample_steps=opt.upsample_steps)}

    rot = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    density_fn = lambda x: net.density(params, x.reshape((-1, 3)) @ rot)[
        "sigma"].reshape(x.shape[:-1])
    render_fn = lambda ro, rd: R.render(net, params, ro, rd, staged=True,
                                        bg_color=1.0, perturb=False,
                                        num_steps=opt.num_steps,
                                        upsample_steps=opt.upsample_steps,
                                        max_ray_batch=opt.max_ray_batch)
    get_rays_fn = lambda pose: get_rays(pose, dataset.intrinsics, dataset.H,
                                        dataset.W)

    camera = None
    if opt.camera == "canned":
        camera = CannedCamera(res_x=camera_cfg["res_x"],
                              res_y=camera_cfg["res_y"])
    elif opt.camera == "nerf":
        def _rfp(pose):
            rays = get_rays_fn(jnp.asarray(pose, dtype=jnp.float32)[None])
            return R.render(net, params, rays["rays_o"], rays["rays_d"],
                            staged=True, bg_color=1.0,
                            num_steps=opt.num_steps,
                            max_ray_batch=opt.max_ray_batch)["image"]
        camera = NerfCamera(_rfp, res_x=camera_cfg["res_x"],
                            res_y=camera_cfg["res_y"])

    simulate(planner_cfg, agent_cfg, camera_cfg, blender_cfg, filter_cfg,
             extra_cfg, density_fn, render_fn, get_rays_fn, camera=camera,
             seed=opt.seed, interactive=False)

    if agent_cfg["blend_file"]:
        import shutil as _sh
        if _sh.which("blender"):
            subprocess.run(["blender", agent_cfg["blend_file"], "-P",
                            "scripts/blender/viz_data_blend.py",
                            "--background", "--", opt.workspace, "0.02"],
                           check=False)


if __name__ == "__main__":
    main()
