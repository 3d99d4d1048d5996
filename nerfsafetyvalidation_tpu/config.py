"""Configuration tree for the whole framework.

Replaces the reference's three config mechanisms (per-entry-point argparse
with ~35 flags duplicated across main_nerf.py/validate.py/uncertain.py/
simulate.py, envConfig.json, and scattered hard-coded constants) with one
dataclass tree + a JSON overlay loader that keeps `envConfig.json`
compatibility (validate.py:131-133).
"""

from dataclasses import dataclass, field, asdict, replace
import json
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class NetworkConfig:
    """Mirrors nerf/network.py:11-24 constructor + encoder settings."""
    encoding: str = "hashgrid"          # 'hashgrid' | 'tiledgrid' | 'frequency' | 'None'
    encoding_dir: str = "sphere_harmonics"
    encoding_bg: str = "hashgrid"
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bound: float = 1.0
    # encoder hyper-params (encoding.py:45-49 defaults)
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = None   # None -> 2048 * bound (network.py:31)
    sh_degree: int = 4
    multires: int = 6                          # frequency encoding degree
    align_corners: bool = False
    # TPU-aligned grid: power-of-two level scales that nest exactly, enabling
    # the folded-table inference encode (ops/hash_encoding.build_folded_table
    # — 1 HBM row for all levels with scale <= fold_max_scale). The flagship
    # TPU config pairs this with num_levels=8, level_dim=4.
    aligned_levels: bool = False
    fold_max_scale: int = 128
    # renderer knobs (renderer.py:62-78)
    density_scale: float = 1.0
    min_near: float = 0.2
    density_thresh: float = 0.01
    bg_radius: float = -1.0
    grid_ray: bool = False      # occupancy-grid marching path (reference cuda_ray)
    grid_size: int = 128
    # precision: 'float32' or 'bfloat16' for the MLP/encoder matmul path
    compute_dtype: str = "float32"
    # fused pallas inference kernel (network_ff analog); falls back if unavailable
    fused: bool = False
    # mipfold TRAINING corner-fetch strategy (ops/mip_encoding.
    # _dense_corner_fetch): 'corner8' | 'pair' | 'quad' | 'cube' | 'foldrow'
    # | 'foldrow_pallas' — numerically identical; selects how many gather
    # rows the HBM gather engine is issued per sample (bench_gather.py
    # section H decides; foldrow_pallas builds the fold with the
    # copy-shaped kernel, ops/pallas/fold_build.py)
    train_gather: str = "corner8"
    # mipfold reduced fold resolution (MipFoldSpec.fold_scale): materialize/
    # fold/encode the dense part at this scale instead of the native finest
    # pyramid scale — the O(F^3) in-graph fold-build term shrinks
    # cubically. 0 = native. Used by the trainer's progressive-fold warmup
    # (opt.fold_warmup_scale); params are identical across scales.
    fold_scale: int = 0
    # static level mask (ROADMAP #5, mip-style): encode only levels
    # < max_level — masked levels contribute zero features AND issue no
    # gather rows (the row count is what bounds the reference-layout
    # encoders on TPU, gridencoder.cu:54-72 costs L*2^D rows/sample).
    # None keeps every level (exact reference semantics).
    max_level: Optional[int] = None

    @property
    def cascade(self) -> int:
        import math
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    @property
    def grid_resolution(self) -> int:
        return int(2048 * self.bound) if self.desired_resolution is None \
            else self.desired_resolution


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors main_nerf.py argparse defaults (:10-59)."""
    lr: float = 1e-2
    iters: int = 30000
    num_rays: int = 4096
    num_steps: int = 512
    upsample_steps: int = 0
    max_steps: int = 1024
    update_extra_interval: int = 16
    # >1 fuses that many training steps (collate+step) into one jitted
    # lax.scan dispatch — identical trajectory, fewer host round-trips
    steps_per_dispatch: int = 1
    max_ray_batch: int = 4096
    fp16: bool = False              # on TPU this selects bfloat16 compute
    preload: bool = True
    error_map: bool = False
    ema_decay: float = 0.95
    eval_interval: int = 50
    max_keep_ckpt: int = 2
    workspace: str = "workspace"
    ckpt: str = "latest"
    seed: int = 0
    data_parallel: bool = False     # shard the ray batch over a device mesh


@dataclass(frozen=True)
class DataConfig:
    path: str = "data/nerf_synthetic/lego"
    color_space: str = "srgb"
    scale: float = 0.33
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rand_pose: int = -1
    downscale: int = 1


@dataclass
class EnvConfig:
    """The validation-job config (envConfig.json:1-56)."""
    simulator: str = "NerfSimulator"
    stress_test: str = "Monte Carlo"
    uq_method: str = "Gaussian Approximation"
    n_simulations: int = 100
    estimator_cfg: dict = field(default_factory=lambda: {
        "dil_iter": 3, "kernel_size": 5, "batch_size": 1024, "lrate": 1e-3,
        "N_iter": 100, "render_viz": False, "show_rate": [20, 100]})
    agent_cfg: dict = field(default_factory=lambda: {
        "body_lims": [[-0.05, 0.05], [-0.05, 0.05], [-0.02, 0.02]],
        "body_nbins": [10, 10, 5], "mass": 1.0, "g": 10.0,
        "I": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "path": "./sim_img_cache", "blend_file": "stonehenge.blend"})
    planner_cfg: dict = field(default_factory=lambda: {
        "x_range": [-1.15, 0.8], "y_range": [-1.2, 0.9], "z_range": [0.05, 0.45],
        "start_pos": [-0.75, -0.235, 0.25], "end_pos": [0.2, -0.74, 0.3],
        "start_R": [0.0, 0.0, 0.0], "end_R": [0.0, 0.0, 0.0],
        "T_final": 2.0, "steps": 12, "planner_lr": 0.001, "epochs_init": 1000,
        "fade_out_epoch": 0, "fade_out_sharpness": 10, "epochs_update": 250})
    mpc_cfg: dict = field(default_factory=lambda: {
        "mpc_noise_mean": [0.0] * 12,
        "mpc_noise_std": [2e-2] * 3 + [1e-2] * 3 + [2e-2] * 3 + [1e-2] * 3})
    camera_cfg: dict = field(default_factory=lambda: {
        "half_res": False, "white_bg": True, "res_x": 800, "res_y": 800,
        "trans": True, "mode": "RGBA"})

    @staticmethod
    def load(path: str = "envConfig.json") -> "EnvConfig":
        with open(path) as f:
            raw = json.load(f)
        cfg = EnvConfig()
        for k, v in raw.items():
            if k == "stress_test":
                cfg.stress_test = v
            elif hasattr(cfg, k):
                setattr(cfg, k, v)
        return cfg

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2)


def network_config_from_opt(opt) -> NetworkConfig:
    """Build a NetworkConfig from an argparse-style namespace with the
    reference CLI flags (main_nerf.py:10-59)."""
    extra = {}
    if getattr(opt, "encoding", "hashgrid") == "mipfold":
        # flagship TPU backbone defaults (models/network_mip.py):
        # 8 power-of-two scales 16..2048, 4 channels each
        extra = dict(num_levels=8, level_dim=4, aligned_levels=True)
    return NetworkConfig(
        encoding=getattr(opt, "encoding", "hashgrid"),
        bound=opt.bound,
        **extra,
        density_scale=1.0,
        min_near=opt.min_near,
        density_thresh=opt.density_thresh,
        bg_radius=opt.bg_radius,
        grid_ray=getattr(opt, "cuda_ray", False),
        compute_dtype="bfloat16" if getattr(opt, "fp16", False) else "float32",
        fused=getattr(opt, "ff", False) or getattr(opt, "tcnn", False),
    )


__all__ = ["NetworkConfig", "TrainConfig", "DataConfig", "EnvConfig",
           "network_config_from_opt", "replace"]
