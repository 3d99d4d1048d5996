"""Headline benchmark: render throughput (rays/sec/chip) on the validation
workload — an 800x800 view (640k rays, reference envConfig.json:51-52,
validate.py:72-75) — through a TRAINED flagship mip-fold NGP.

The full train -> grid -> render loop (VERDICT r1 item 5): the first run
trains the flagship TPU backbone (models/network_mip.py) on the analytic
synthetic scenes (data/synthetic.py), refreshes the occupancy grid from the
trained density field, and caches checkpoints under .bench_cache/; the
benchmark then renders HELD-OUT poses and reports rays/s plus the PSNR of
those renders against the analytic ground truth.

Round-4 gate (VERDICT r3 items 1+5): every candidate render mode is scored
on TWO scenes — the smooth "spheres" scene and the hard "gauntlet" scene
(thin pillars + occlusion stack + high-frequency texture) — across 4
held-out poses each. A mode clears the gate only if its 4-pose mean PSNR
passes BOTH scenes' thresholds; rays/s is then measured for EVERY
gate-clearing mode (pipelined batched timing, see _time_render) and the
headline is the fastest gate-clearing mode. This kills modes that merely
memorize the smooth scene (the round-3 scout bug class) and makes
regressions in non-headline modes visible in the driver artifact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"modes": per-mode per-scene psnr + rays/s}.
The reference publishes no numbers (BASELINE.md); vs_baseline measures
against the BASELINE.json north-star target of 50M rays/sec/chip.

Timing note: on the tunneled TPU platform block_until_ready() does not
synchronize; completion is forced by fetching one element. Dispatch+fetch
round-trips cost 10s of ms of tunnel latency, so frames are timed in
back-to-back batches (one fetch per batch — TPU executes programs in
order, so the final fetch bounds the whole batch) and the per-frame time
is the median over batches. This is what closed the round-3 capture gap
(driver 2.89M vs tunnel 4.10M on the identical path).
"""

import json
import os
import time

import numpy as np

NORTH_STAR_RAYS_PER_SEC = 50e6
MAX_SAMPLES = 16          # per-ray sample slots (mean demand ~12 on the scene)
TILE = 131072
BENCH_ITERS = int(os.environ.get("BENCH_ITERS", "1920"))
TRAIN_RES = int(os.environ.get("BENCH_TRAIN_RES", "200"))
N_TRAIN_VIEWS = 48

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".bench_cache")
# committed trained artifacts (scripts/freeze_bench_assets.py): hosts are
# wiped between rounds, so the cold-run training/distill cost (~40 min on
# the tunnel PER SCENE) is paid once and shipped in-repo; the bench seeds
# its cache from here and goes straight to the render measurement
_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_assets")

# per-scene bench plumbing: cache/workspace/asset names and the PSNR gate.
# "spheres" keeps the round-1..3 names so committed assets stay valid.
# Gate rationale: spheres 28 dB = the round-2 bar (teacher fidelity).
# gauntlet is intrinsically harder (thin structures at the training res):
# the exact marched path itself measures ~23.2 dB on the trained field, so
# an absolute bar would fail every mode and gate nothing. Its job is to
# catch APPROXIMATION collapse (the round-3 scout-bug class: a mode that
# holds the smooth scene but falls apart on thin structures), so the bar
# is RELATIVE: a mode passes gauntlet if it is within `rel_margin` dB of
# the exact marched path's measured 4-pose mean on the same trained field
# (capped by the absolute env default). Margin rationale: the baked
# student's approximation cost is scene-consistent ~1.0-1.3 dB (spheres
# 31.08->30.10, gauntlet 23.18->21.84, 2026-08-19 capture); collapse modes
# lose 3+ dB MORE on gauntlet than on spheres (baked8: -2.9 vs -4.5).
SCENE_SPECS = {
    "spheres": dict(dir="scene", ws="ws", asset="flagship.ckpt",
                    student="bench_student.pkl",
                    gate=("BENCH_GATE_DB", 28.0)),
    "gauntlet": dict(dir="scene_gauntlet", ws="ws_gauntlet",
                     asset="flagship_gauntlet.ckpt",
                     student="bench_student_gauntlet.pkl",
                     gate=("BENCH_GATE_GAUNTLET_DB", 24.0),
                     rel_margin=("BENCH_GATE_GAUNTLET_REL_DB", 1.5),
                     rel_anchor="fast"),
}
BENCH_SCENES = [s for s in os.environ.get(
    "BENCH_SCENES", "spheres,gauntlet").split(",") if s]


def _upcast_asset(src, dst):
    """Materialize a committed slim asset (optimizer dropped, float32
    stored as bfloat16 — scripts/freeze_bench_assets.py) as a regular
    float32 cache checkpoint. bf16 storage is bit-identical for the
    render path, which computes in bfloat16 anyway."""
    import dataclasses
    import pickle
    import ml_dtypes

    def up(x):
        if isinstance(x, dict):
            return {k: up(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(up(v) for v in x)
        if dataclasses.is_dataclass(x) and not isinstance(x, type):
            return dataclasses.replace(x, **{
                f.name: up(getattr(x, f.name))
                for f in dataclasses.fields(x)})
        if isinstance(x, np.ndarray) and x.dtype == ml_dtypes.bfloat16:
            return x.astype(np.float32)
        return x

    with open(src, "rb") as f:
        state = pickle.load(f)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(up(state), f)
    os.replace(tmp, dst)


def _seed_cache_from_assets():
    """Materialize committed checkpoints/students into .bench_cache (no
    overwrite: a freshly trained cache always wins). BENCH_NO_ASSETS=1
    forces the full cold train."""
    import shutil
    if os.environ.get("BENCH_NO_ASSETS", "0") == "1":
        return
    if not os.path.isdir(_ASSETS):
        return
    pairs = [("ws_ref", "refbb.ckpt"), ("ws_ref_gauntlet",
                                        "refbb_gauntlet.ckpt")]
    pairs += [(spec["ws"], spec["asset"]) for spec in SCENE_SPECS.values()]
    for ws, asset in pairs:
        src = os.path.join(_ASSETS, asset)
        name = os.path.splitext(asset)[0]
        dst_dir = os.path.join(_CACHE, ws, "checkpoints")
        if os.path.exists(src) and not (
                os.path.isdir(dst_dir) and os.listdir(dst_dir)):
            os.makedirs(dst_dir, exist_ok=True)
            _upcast_asset(src, os.path.join(dst_dir,
                                            f"{name}_ep9999.ckpt"))
    # students: the base per-scene pkl plus any K/capacity variants
    # (bench_student*_k12.pkl etc — _get_student cache names)
    import glob as _glob
    for src in _glob.glob(os.path.join(_ASSETS, "bench_student*.pkl")):
        dst = os.path.join(_CACHE, os.path.basename(src))
        if not os.path.exists(dst):
            shutil.copy(src, dst)


def _fetch1(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def _train_flagship(scene="spheres"):
    """Train (or reload) the flagship on the given analytic scene; returns
    (net, trained params, renderer state)."""
    import jax
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
    from nerfsafetyvalidation_tpu.data.synthetic import generate_dataset
    from nerfsafetyvalidation_tpu.train.trainer import Trainer

    spec = SCENE_SPECS[scene]
    _seed_cache_from_assets()
    scene_dir = os.path.join(_CACHE, spec["dir"])
    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        generate_dataset(scene_dir, n_train=N_TRAIN_VIEWS, n_val=2, n_test=4,
                         H=TRAIN_RES, W=TRAIN_RES, scene=scene)

    # density_thresh=10 is the torch-ngp TRAIN default (main_nerf.py):
    # threshold = min(mean_density, 10) adapts while the field is still
    # foggy, so the occupancy grid carves from the first updates
    # train_gather="foldrow": the 2026-08-18 sweep (scripts/bench_train.py,
    # BENCH_NOTES "Training throughput") measured the in-graph fold +
    # one-wide-row fetch at 50-53 ms/step vs corner8's 60-70 — the fold
    # rebuild is dense compute, the 8 corner gathers are not. Same
    # function value (the fold is exact piecewise-trilinear), same bf16
    # compute dtype either way.
    cfg = NetworkConfig(encoding="mipfold", bound=1.0,
                        compute_dtype="bfloat16", num_levels=8, level_dim=4,
                        base_resolution=16, fold_max_scale=128,
                        grid_ray=True, density_thresh=10.0,
                        train_gather="foldrow")
    net = make_network(cfg)

    # provider + trainer knobs (argparse-style attributes)
    class O:
        path = scene_dir
        color_space = "srgb"
        scale = 1.0
        offset = (0.0, 0.0, 0.0)
        bound = 1.0
        fp16 = True
        preload = True
        rand_pose = -1
        downscale = 1
        num_rays = 4096
        error_map = False
        lr = 1e-2
        iters = BENCH_ITERS
        num_steps = 128
        upsample_steps = 0
        max_ray_batch = 4096
        # training-time marching: enough paired-emission slots with dt
        # growth to span the whole [near, far] segment even while the
        # occupancy grid is still dense (epoch 0: everything occupied)
        grid_max_samples = 96
        grid_samples_per_hit = 2
        grid_sample_budget_per_ray = 48
        # once the grid carves (~300 steps) real demand is ~8-16
        # samples/ray; the phased budget cuts the dominant fwd/bwd hash
        # rows (trainer._budget_per_ray) -> ~12.7 steps/s steady state
        grid_warmup_steps = 512
        grid_budget_after_warmup = 16
        grid_max_samples_after_warmup = 32
        max_steps = 1024
        dt_gamma = 1.0 / 64
        seed = 0

    train_ds = NeRFDataset(O, type="train")
    train_loader = train_ds.dataloader()
    valid_loader = NeRFDataset(O, type="val").dataloader()
    max_epoch = int(np.ceil(BENCH_ITERS / len(train_loader)))

    name = os.path.splitext(spec["asset"])[0]
    trainer = Trainer(name, O, net,
                      workspace=os.path.join(_CACHE, spec["ws"]),
                      use_checkpoint="latest", fp16=True, mute=True,
                      eval_interval=10 ** 9, ckpt_interval=25)
    if trainer.epoch < max_epoch:
        trainer.train(train_loader, valid_loader, max_epoch)
        trainer.save_checkpoint(full=True)
    # refresh grid + skip table from the trained density field (folded probe)
    from nerfsafetyvalidation_tpu.models import renderer as R
    probe_params = net.to_folded(trainer.params)
    state = trainer.renderer_state
    for i in range(4):
        state = R.update_extra_state(net, probe_params, state,
                                     jax.random.PRNGKey(100 + i),
                                     grid_size=cfg.grid_size)
    return net, trainer.params, state


# per-variant distill/fine-tune schedules, keyed (hidden_dim, num_layers).
# The half-FLOPs 192x6 student needs the LONGER 16k-distill / 8k-fine-tune
# schedule to clear the gauntlet relative gate (measured 2026-08-20,
# scripts/bench_student_capacity_gate.py: 8k/4k -> 21.52 dB FAIL by 0.16,
# 16k/8k -> 21.8 dB PASS); the full-width 256x6 passes at the default.
# A cold-host rebuild therefore trains each variant at ITS schedule.
# Round-5 candidates (smaller students need still longer schedules —
# capacity per FLOP falls with width, so training compensates):
# h160/h128 measured via scripts/bench_student_capacity_gate.py.
STUDENT_SCHEDULES = {(192, 6): (16000, 8000),
                     (160, 6): (24000, 12000),
                     (128, 6): (32000, 16000)}
DEFAULT_SCHEDULE = (8000, 4000)


def _student_schedule(hidden_dim, num_layers):
    """(distill_steps, ft_steps) for a student variant: the variant's
    encoded schedule, overridable via BENCH_DISTILL_STEPS/BENCH_FT_STEPS."""
    d, f = STUDENT_SCHEDULES.get((hidden_dim, num_layers), DEFAULT_SCHEDULE)
    return (int(os.environ.get("BENCH_DISTILL_STEPS", str(d))),
            int(os.environ.get("BENCH_FT_STEPS", str(f))))


def _get_student(net, fparams, state, key, scene="spheres",
                 K=MAX_SAMPLES, hidden_dim=256, num_layers=6):
    """Distill (or reload) the gather-free student for the baked render
    path (models/bake.py); cached in .bench_cache/<student>.pkl.

    K / hidden_dim / num_layers select a VARIANT student (its pixel
    fine-tune runs at the deployed window sample count — a K=12 window
    couples alpha to a different dtw than K=16, so each K gets its own
    fine-tune; VERDICT r3 item 1b) cached under a tagged name. The cache
    name also carries the training schedule when it differs from the
    variant's encoded default (_student_schedule), and new pkls store the
    schedule inside and are validated on load — a default-schedule
    artifact can no longer shadow a longer-schedule winner under the
    same filename (ADVICE r4)."""
    import pickle
    import jax
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.models.bake import (distill, student_config,
                                                     finetune_render)
    from nerfsafetyvalidation_tpu.data.synthetic import orbit_pose
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)
    import jax.numpy as jnp

    scfg = student_config(net.cfg, multires=12, hidden_dim=hidden_dim,
                          num_layers=num_layers)
    distill_steps, ft_steps = _student_schedule(hidden_dim, num_layers)
    tag = ""
    if K != MAX_SAMPLES:
        tag += f"_k{K}"
    if (hidden_dim, num_layers) != (256, 6):
        tag += f"_h{hidden_dim}x{num_layers}"
    if (distill_steps, ft_steps) != STUDENT_SCHEDULES.get(
            (hidden_dim, num_layers), DEFAULT_SCHEDULE):
        tag += f"_d{distill_steps}f{ft_steps}"
    base = SCENE_SPECS[scene]["student"]
    cache_f = os.path.join(_CACHE, base.replace(".pkl", tag + ".pkl"))
    student = make_network(scfg)
    if os.path.exists(cache_f):
        with open(cache_f, "rb") as f:
            blob = pickle.load(f)
        # device_put up front: pkl params are host numpy, and a numpy
        # pytree passed to jit re-uploads ~1.3 MB through the tunnel on
        # EVERY dispatch (~25 ms/frame measured — scripts/bench_mxu.py
        # chain rows, round 5); resident params pay it once
        if isinstance(blob, dict) and "params" in blob and "schedule" in blob:
            if tuple(blob["schedule"]) == (distill_steps, ft_steps):
                return student, jax.device_put(blob["params"])
            # schedule mismatch: the cached artifact was trained at a
            # different schedule than this run requires — retrain rather
            # than silently reusing it
        else:
            # legacy raw-params pkl (rounds 1-4 frozen assets): accept
            return student, jax.device_put(blob)

    k1, k2 = jax.random.split(key)
    student, sparams, _ = distill(net, fparams, state, k1,
                                  steps=distill_steps, cfg=scfg)
    # pixel-space fine-tune on a random-orbit ray pool
    rng = np.random.default_rng(11)
    fov_x = 0.6911
    pool_res = 128
    pool_o, pool_d = [], []
    for _ in range(64):
        p = orbit_pose(rng.uniform(0, 2 * np.pi), rng.uniform(0.15, 1.2),
                       rng.uniform(2.2, 2.6))
        p_ngp = nerf_matrix_to_ngp(p, scale=1.0, offset=(0.0, 0.0, 0.0))
        fxp = 0.5 * pool_res / np.tan(0.5 * fov_x)
        r = get_rays(jnp.asarray(p_ngp[None]),
                     (fxp, fxp, pool_res / 2, pool_res / 2),
                     pool_res, pool_res)
        pool_o.append(np.asarray(r["rays_o"]).reshape(-1, 3))
        pool_d.append(np.asarray(r["rays_d"]).reshape(-1, 3))
    sparams, _ = finetune_render(
        student, sparams, net, fparams, state,
        jnp.asarray(np.concatenate(pool_o)),
        jnp.asarray(np.concatenate(pool_d)), k2, steps=ft_steps,
        K=K)
    with open(cache_f, "wb") as f:
        import jax as _jax
        pickle.dump({"params": _jax.device_get(sparams),
                     "schedule": (distill_steps, ft_steps),
                     "K": K, "hidden_dim": hidden_dim,
                     "num_layers": num_layers}, f)
    return student, sparams


def _train_ref_backbone(scene="spheres"):
    """Reference-semantics NeRFNetwork (hashgrid corner layout) through the
    SAME training loop — the second fidelity line the bench reports.
    This line checks exact reference semantics, not the approximation
    gate; round 5 trains it on BOTH scenes (VERDICT r4 item 5b) so the
    hard-scene fidelity of the exact-parity path is on record too."""
    import jax
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models import make_network
    from nerfsafetyvalidation_tpu.data.provider import NeRFDataset
    from nerfsafetyvalidation_tpu.train.trainer import Trainer
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.synthetic import generate_dataset

    _seed_cache_from_assets()
    scene_dir = os.path.join(_CACHE, SCENE_SPECS[scene]["dir"])
    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        generate_dataset(scene_dir, n_train=N_TRAIN_VIEWS, n_val=2, n_test=4,
                         H=TRAIN_RES, W=TRAIN_RES, scene=scene)
    ws = "ws_ref" if scene == "spheres" else f"ws_ref_{scene}"
    name = "refbb" if scene == "spheres" else f"refbb_{scene}"
    cfg = NetworkConfig(encoding="hashgrid", bound=1.0,
                        compute_dtype="bfloat16", grid_ray=True,
                        density_thresh=10.0)
    net = make_network(cfg)

    class O:
        path = scene_dir
        color_space = "srgb"
        scale = 1.0
        offset = (0.0, 0.0, 0.0)
        bound = 1.0
        fp16 = True
        preload = True
        rand_pose = -1
        downscale = 1
        num_rays = 4096
        error_map = False
        lr = 1e-2
        # the ref line is a FIDELITY check, not a throughput line: the
        # corner layout pays 128 fwd + 128 bwd rows/sample, so the warmup
        # budget is trimmed vs the flagship (48/ray for 512 steps would
        # cost ~4 s/step) and the run stops at 960 iters
        iters = min(BENCH_ITERS, 960)
        num_steps = 128
        upsample_steps = 0
        max_ray_batch = 4096
        grid_max_samples = 48
        grid_samples_per_hit = 2
        grid_sample_budget_per_ray = 24
        grid_warmup_steps = 128
        grid_budget_after_warmup = 16
        grid_max_samples_after_warmup = 32
        max_steps = 1024
        dt_gamma = 1.0 / 64
        seed = 0

    train_loader = NeRFDataset(O, type="train").dataloader()
    valid_loader = NeRFDataset(O, type="val").dataloader()
    max_epoch = int(np.ceil(O.iters / len(train_loader)))
    trainer = Trainer(name, O, net,
                      workspace=os.path.join(_CACHE, ws),
                      use_checkpoint="latest", fp16=True, mute=True,
                      eval_interval=10 ** 9, ckpt_interval=25)
    if trainer.epoch < max_epoch:
        trainer.train(train_loader, valid_loader, max_epoch)
        trainer.save_checkpoint(full=True)
    state = trainer.renderer_state
    for i in range(4):
        state = R.update_extra_state(net, trainer.params, state,
                                     jax.random.PRNGKey(100 + i),
                                     grid_size=cfg.grid_size)
    return net, trainer.params, state


# four held-out orbit poses (none in any training/val/test split —
# scene_views draws from different seeds); shared by both scenes
HOLDOUT = [(0.77, 0.52), (2.31, 0.30), (3.85, 0.65), (5.40, 0.42)]


def _time_render(render, views, n_rays, warmup_frames=3, batches=5,
                 batch=4):
    """Median per-frame seconds: `batches` batches of `batch` back-to-back
    dispatches, ONE completion fetch per batch (the TPU executes enqueued
    programs in order, so fetching the last frame's first element bounds
    the whole batch). Cycling over the held-out poses keeps the number
    honest across view-dependent occupancy. The batch structure amortizes
    the tunnel's per-round-trip latency (10s of ms) that made single-frame
    timing under-report by ~30% (VERDICT r3 weak #1)."""
    for i in range(warmup_frames):
        _fetch1(render(*views[i % len(views)][:2]))
    ts = []
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        img = None
        for i in range(batch):
            img = render(*views[(k + i) % len(views)][:2])
        k += batch
        _fetch1(img)
        ts.append((time.perf_counter() - t0) / batch)
    return float(np.median(ts))


def main():
    os.makedirs(_CACHE, exist_ok=True)
    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.synthetic import (orbit_pose,
                                                         camera_rays,
                                                         trace_scene)
    from nerfsafetyvalidation_tpu.data.rays import (get_rays,
                                                    nerf_matrix_to_ngp)
    from dataclasses import replace as _replace
    from nerfsafetyvalidation_tpu.models import make_network

    # BENCH_FUSED=1 routes the MLP chains through the one-kernel pallas
    # megakernel (ops/pallas/render_mlp.py). Default is OFF: the 2026-08-18
    # A/B on the live tunnel (scripts/bench_fused_ab.py,
    # scripts/bench_student_breakdown.py) measured the real Mosaic kernels
    # LOSING to XLA — student frame 397 ms fused vs 205 ms XLA, guided
    # teacher 330 vs 303, fast tied — so XLA's own fusion is the shipped
    # fast path and the pallas route stays a capability demonstration.
    use_fused = os.environ.get("BENCH_FUSED", "0") == "1"

    H = W = int(os.environ.get("BENCH_RES", "800"))
    fov_x = 0.6911
    fx = 0.5 * W / np.tan(0.5 * fov_x)
    intr = (fx, fx, W / 2, H / 2)
    dt_gamma = float(os.environ.get("BENCH_DT_GAMMA", str(1.0 / 64)))

    # ---- per-scene assets: trained teacher, folded params, student,
    # held-out views (ground truth ray-traced in the RAW world frame; the
    # model lives in the provider's NGP frame, provider.py:19-27, so
    # render rays come from the converted pose — pixel-for-pixel the same
    # physical camera the training pipeline used)
    scenes = {}
    for scene in BENCH_SCENES:
        net, params, state = _train_flagship(scene)
        fparams = net.to_folded(params)
        student, sparams = _get_student(net, fparams, state,
                                        jax.random.PRNGKey(7), scene)
        net_r = make_network(_replace(net.cfg, fused=True)) if use_fused \
            else net
        student_r = make_network(_replace(student.cfg, fused=True)) \
            if use_fused else student
        views = []
        for th, ph in HOLDOUT:
            pose = orbit_pose(th, ph, 2.4)
            o_np, d_np = camera_rays(pose, intr, H, W)
            gt_rgb, gt_alpha, _ = trace_scene(o_np, d_np, scene=scene)
            gt = gt_rgb * gt_alpha[..., None] + (1.0 - gt_alpha[..., None])
            pose_ngp = nerf_matrix_to_ngp(pose, scale=1.0,
                                          offset=(0.0, 0.0, 0.0))
            rays = get_rays(jnp.asarray(pose_ngp[None]), intr, H, W)
            views.append((rays["rays_o"].reshape(-1, 3),
                          rays["rays_d"].reshape(-1, 3), gt))
        gate_env, gate_default = SCENE_SPECS[scene]["gate"]
        scenes[scene] = dict(
            net=net_r, net_raw=net, fparams=fparams, state=state,
            student=student_r, sparams=sparams, views=views,
            students={(MAX_SAMPLES, 256, 6): (student_r, sparams)},
            gate_db=float(os.environ.get(gate_env, str(gate_default))))
        rel = SCENE_SPECS[scene].get("rel_margin")
        if rel is not None:
            scenes[scene]["rel_margin"] = float(
                os.environ.get(rel[0], str(rel[1])))
            scenes[scene]["rel_anchor"] = SCENE_SPECS[scene]["rel_anchor"]

    n_rays = scenes[BENCH_SCENES[0]]["views"][0][0].shape[0]
    n_tiles = (n_rays + TILE - 1) // TILE
    pad = n_tiles * TILE - n_rays

    def padded(ro, rd):
        if pad:
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3))])
            rd = jnp.concatenate(
                [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                      (pad, 3))])
        return ro, rd

    def psnr_of(img, gt):
        pred = np.asarray(img[:n_rays]).reshape(H, W, 3)
        mse = float(np.mean((pred - gt) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    # ---- candidate render modes; each builder takes a scene dict and
    # returns a frame-render closure
    def _student_k(sc, scene, k, hidden_dim=256, num_layers=6):
        """Student variant fine-tuned at the deployed window count K
        and sized hidden_dim x num_layers (cached via _get_student's
        tagged pkl; committed via freeze_bench_assets so driver runs
        never retrain)."""
        key = (k, hidden_dim, num_layers)
        if key not in sc["students"]:
            student, sparams = _get_student(
                sc["net_raw"], sc["fparams"], sc["state"],
                jax.random.PRNGKey(7 + k), scene, K=k,
                hidden_dim=hidden_dim, num_layers=num_layers)
            student_r = make_network(_replace(student.cfg, fused=True)) \
                if use_fused else student
            sc["students"][key] = (student_r, sparams)
        return sc["students"][key]

    # fine-pass tile: 16384 was the round-4 lax.map knee for the 256x6
    # student with host-numpy params; with device-resident params and the
    # smaller students the knee moved back to 8192 (round-5
    # scripts/bench_frame_anatomy.py: h160 62.6 ms @ 8192 vs 68.6 @
    # 16384). Tile size is PSNR-neutral (bit-exact across sizes,
    # verified on-chip round 4), so this is a pure timing knob.
    baked_tile = int(os.environ.get("BENCH_TILE", "8192"))

    def mode_baked_k(k, scout_samples=64, hidden_dim=256, num_layers=6,
                     prepass_factor=8, adaptive_k=0,
                     adaptive_span_cells=12.5):
        # gather-free end to end: student scout prepass fused into the
        # fine jit (prepass_mode="scout") + raster-order tiles; the
        # sigma+color chain is XLA-fused dense matmuls (BENCH_FUSED=1
        # swaps in the pallas megakernel, measured slower — see above)
        def build(sc):
            scene = next(s for s in BENCH_SCENES if scenes[s] is sc)
            student, sparams = _student_k(sc, scene, k, hidden_dim,
                                          num_layers)
            return lambda ro, rd: R.render_frame_guided(
                student, sparams, sc["state"], ro, rd, H, W,
                prepass_factor=prepass_factor, max_samples=k,
                tile=baked_tile, max_steps=512,
                dt_gamma=dt_gamma, prepass_mode="scout",
                scout_samples=scout_samples,
                natural_tile_cap=baked_tile, adaptive_k=adaptive_k,
                adaptive_span_cells=adaptive_span_cells)["image"]
        return build

    def mode_guided(sc):
        return lambda ro, rd: R.render_frame_guided(
            sc["net"], sc["fparams"], sc["state"], ro, rd, H, W,
            prepass_factor=8, max_samples=MAX_SAMPLES, tile=16384,
            max_steps=512, dt_gamma=dt_gamma,
            natural_tile_cap=16384)["image"]

    def mode_fast(sc):
        return lambda ro, rd: R.render_frame_fast(
            sc["net"], sc["fparams"], sc["state"], *padded(ro, rd),
            tile=TILE, max_samples=MAX_SAMPLES, max_steps=512,
            samples_per_hit=2, dt_gamma=dt_gamma)["image"]

    # default order: the four gate-passing paths, fastest-first. The
    # documented-fail candidates (baked12/baked8/baked_s32 — see
    # BENCH_NOTES, each fails the gauntlet gate) stay runnable via
    # BENCH_MODES but are excluded by default: scoring them costs ~2-4
    # cold-compile minutes each and they never become the headline.
    # baked_h160 (24k/12k schedule) measured PASSING both scene gates
    # 2026-08-20 (scripts/bench_student_capacity_gate.py: spheres
    # 30.17/30.00, gauntlet 21.75/21.44); h128 fails gauntlet at 32k/16k
    # (21.61) — see BENCH_NOTES "capacity gate" for the curve.
    mode_order = os.environ.get(
        "BENCH_MODES",
        "baked_h160_ak8,baked_h160,baked_h192,baked,guided,fast").split(",")
    builders = {"baked": mode_baked_k(MAX_SAMPLES), "guided": mode_guided,
                "fast": mode_fast, "baked8": mode_baked_k(8),
                "baked12": mode_baked_k(12),
                # half-FLOPs student (192x6): its 16k-distill/8k-fine-tune
                # schedule (required to clear the gauntlet relative gate)
                # is encoded in STUDENT_SCHEDULES, so the committed asset
                # and any cold-host retrain both use it
                "baked_h192": mode_baked_k(MAX_SAMPLES, hidden_dim=192,
                                           num_layers=6),
                # round-5 capacity candidates (scripts/
                # bench_student_capacity_gate.py decides which, if any,
                # join the default mode list)
                "baked_h160": mode_baked_k(MAX_SAMPLES, hidden_dim=160,
                                           num_layers=6),
                "baked_h128": mode_baked_k(MAX_SAMPLES, hidden_dim=128,
                                           num_layers=6),
                # round-5 overhead levers on the h160 winner: halved
                # scout (window placement only; -5 ms) and K=12 windows
                # (own fine-tune; -7 ms) — each ships only if gated
                "baked_h160_s32": mode_baked_k(MAX_SAMPLES,
                                               scout_samples=32,
                                               hidden_dim=160,
                                               num_layers=6),
                "baked_h160_k12": mode_baked_k(12, hidden_dim=160,
                                               num_layers=6),
                "baked_h160_f16": mode_baked_k(MAX_SAMPLES, hidden_dim=160,
                                               num_layers=6,
                                               prepass_factor=16),
                # adaptive per-tile K: narrow-window tiles shade with 8
                # samples at >= the full-span K=16 sampling density
                # (renderer._window_shade_tile lax.switch bucketing)
                # adaptive span 24 cells: the measured sweet spot
                # (12.5 -> no tile qualifies; 40 -> gauntlet tiles
                # qualify and FAIL the gate at 21.17 dB — the knob's
                # fidelity cliff is gated like every other lever)
                "baked_h160_ak8": mode_baked_k(MAX_SAMPLES, hidden_dim=160,
                                               num_layers=6, adaptive_k=8,
                                               adaptive_span_cells=float(
                                                   os.environ.get(
                                                       "BENCH_AK_SPAN",
                                                       "24"))),
                # halved scout: +5% in the tile sweep at -0.2 dB — ships
                # only if it clears BOTH scene gates like any other mode
                "baked_s32": mode_baked_k(MAX_SAMPLES, scout_samples=32)}
    labels = {
        "baked": "distilled gather-free student, depth-guided windows",
        "baked_h192": "distilled gather-free student (192x6), depth-guided "
                      "windows",
        "baked_h160": "distilled gather-free student (160x6), depth-guided "
                      "windows",
        "baked_h160_s32": "distilled gather-free student (160x6), "
                          "depth-guided windows, 32-sample scout",
        "baked_h160_k12": "distilled gather-free student (160x6), "
                          "depth-guided windows, K=12",
        "baked_h160_f16": "distilled gather-free student (160x6), "
                          "depth-guided windows, 1/16 scout grid",
        "baked_h160_ak8": "distilled gather-free student (160x6), "
                          "depth-guided windows, adaptive per-tile K 8/16",
        "baked_h128": "distilled gather-free student (128x6), depth-guided "
                      "windows",
        "baked_s32": "distilled gather-free student, depth-guided windows, "
                     "32-sample scout",
        "baked8": "distilled gather-free student, depth-guided windows, K=8",
        "baked12": "distilled gather-free student, depth-guided windows, "
                   "K=12",
        "guided": "mip-fold NGP, depth-guided windowed fine pass",
        "fast": "mip-fold NGP, occupancy-marched sorted shading",
    }

    # ---- PSNR gate: 4 held-out poses PER SCENE; a mode passes only if
    # its per-scene mean clears that scene's threshold on EVERY scene.
    # BENCH_FIRST_GATE=1 restores the round-3 wall-clock discipline (stop
    # at the first gate-clearing mode instead of scoring/timing them all).
    first_gate_only = os.environ.get("BENCH_FIRST_GATE", "0") == "1"
    n_time_batches = int(os.environ.get("BENCH_TIME_BATCHES", "5"))
    n_time_batch = int(os.environ.get("BENCH_TIME_BATCH", "4"))

    _score_cache = {}

    def score(name, scene):
        """(psnr_mean, psnr_min, render_fn) of a mode on a scene's 4
        held-out poses; memoized so the relative-gate anchor render is
        not paid twice."""
        hit = _score_cache.get((name, scene))
        if hit is None:
            sc = scenes[scene]
            render = builders[name](sc)
            psnrs = [psnr_of(render(v[0], v[1]), v[2]) for v in sc["views"]]
            hit = _score_cache[(name, scene)] = (
                float(np.mean(psnrs)), float(np.min(psnrs)), render)
        return hit

    # resolve relative gates first: the anchor (exact marched path) is
    # scored up front and the scene's bar becomes
    # min(absolute default, anchor_mean - rel_margin). The per-pose MIN
    # is gated too (VERDICT r4 item 5a): for relative scenes the min bar
    # is anchor_min - rel_margin (the same approximation-collapse margin
    # applied pose-wise — a mode may not lose more than rel_margin dB vs
    # the exact path's own worst pose); for absolute scenes the min bar
    # is the scene bar itself.
    for scene in BENCH_SCENES:
        sc = scenes[scene]
        sc["gate_min_db"] = sc["gate_db"]
        if "rel_anchor" in sc:
            try:
                anchor_mean, anchor_min, _ = score(sc["rel_anchor"], scene)
                sc["gate_db"] = min(sc["gate_db"],
                                    anchor_mean - sc["rel_margin"])
                sc["gate_min_db"] = min(sc["gate_min_db"],
                                        anchor_min - sc["rel_margin"])
                sc["gate_anchor_db"] = round(anchor_mean, 2)
                sc["gate_anchor_min_db"] = round(anchor_min, 2)
            except Exception as e:                          # noqa: BLE001
                # anchor failed to render: keep the absolute bar
                sc["gate_anchor_error"] = str(e)[:200]

    all_modes = {}
    passing = []
    for name in mode_order:
        entry = {}
        ok = True
        renders = {}
        for scene in BENCH_SCENES:
            sc = scenes[scene]
            try:
                mean_p, min_p, render = score(name, scene)
            except Exception as e:                          # noqa: BLE001
                entry[scene] = {"error": str(e)[:200]}
                ok = False
                break
            renders[scene] = render
            entry[scene] = {"psnr_mean": round(mean_p, 2),
                            "psnr_min": round(min_p, 2)}
            if mean_p < sc["gate_db"] or min_p < sc["gate_min_db"]:
                ok = False
        entry["pass"] = ok
        all_modes[name] = entry
        if ok:
            # rays/s for EVERY gate-clearing mode (VERDICT r3 weak #1):
            # per-scene batched timing + the cross-scene aggregate
            dts = {}
            for scene in BENCH_SCENES:
                dt = _time_render(renders[scene], scenes[scene]["views"],
                                  n_rays, batches=n_time_batches,
                                  batch=n_time_batch)
                dts[scene] = dt
                entry[scene]["rays_per_s"] = round(n_rays / dt)
            agg = len(dts) * n_rays / sum(dts.values())
            entry["rays_per_s"] = round(agg)
            passing.append((name, agg))
            if first_gate_only:
                break

    if passing:
        name, rays_per_sec = max(passing, key=lambda x: x[1])
    else:
        # nothing cleared both gates: fall back to the best worst-scene
        # PSNR mode and report it honestly (pass=false stays in the JSON)
        scored = [m for m in all_modes
                  if all("psnr_mean" in all_modes[m].get(s, {})
                         for s in BENCH_SCENES)]
        if not scored:
            raise SystemExit(json.dumps(
                {"metric": "bench failed", "value": 0, "unit": "rays/s",
                 "vs_baseline": 0.0, "modes": all_modes}))
        name = max(scored, key=lambda m: min(
            all_modes[m][s]["psnr_mean"] for s in BENCH_SCENES))
        dts = {}
        for scene in BENCH_SCENES:
            render = builders[name](scenes[scene])
            dt = _time_render(render, scenes[scene]["views"], n_rays,
                              batches=n_time_batches, batch=n_time_batch)
            dts[scene] = dt
            all_modes[name][scene]["rays_per_s"] = round(n_rays / dt)
        rays_per_sec = len(dts) * n_rays / sum(dts.values())
        all_modes[name]["rays_per_s"] = round(rays_per_sec)

    # headline PSNR fields aggregate over all gated poses (both scenes)
    pose_means = [all_modes[name][s]["psnr_mean"] for s in BENCH_SCENES]
    pose_mins = [all_modes[name][s]["psnr_min"] for s in BENCH_SCENES]

    # ---- second backbone line: reference-semantics hashgrid NeRFNetwork,
    # trained + scored on EVERY bench scene (VERDICT r4 item 5b: the
    # exact-parity path and its level-masked default get a hard-scene
    # fidelity row, not just the smooth one).
    def _ref_line(scene):
        rnet, rparams, rstate = _train_ref_backbone(scene)
        sc = scenes.get(scene) or scenes[BENCH_SCENES[0]]
        ro, rd, gt = sc["views"][0]

        def ref_render(ro, rd):
            return R.render_frame_fast(
                rnet, rparams, rstate, *padded(ro, rd), tile=TILE,
                max_samples=MAX_SAMPLES, max_steps=512,
                samples_per_hit=2, dt_gamma=dt_gamma)["image"]

        rimg = ref_render(ro, rd)
        rdt = _time_render(ref_render, sc["views"], n_rays,
                           warmup_frames=1, batches=3, batch=2)
        line = {"psnr_db": round(psnr_of(rimg, gt), 2),
                "rays_per_s": round(n_rays / rdt)}

        # level-masked variant (VERDICT r3 item 7 / ROADMAP #5): the
        # corner layout costs L*2^D = 128 gather rows/sample
        # (gridencoder.cu:54-72); a static max_level drops the
        # sub-footprint fine levels' rows. Reported alongside so the
        # fidelity cost of the mask is visible in the artifact.
        ml = int(os.environ.get("BENCH_REF_MAX_LEVEL", "8"))
        if 0 < ml < rnet.cfg.num_levels:
            mnet = make_network(_replace(rnet.cfg, max_level=ml))

            def ref_render_masked(ro, rd):
                return R.render_frame_fast(
                    mnet, rparams, rstate, *padded(ro, rd), tile=TILE,
                    max_samples=MAX_SAMPLES, max_steps=512,
                    samples_per_hit=2, dt_gamma=dt_gamma)["image"]

            mimg = ref_render_masked(ro, rd)
            mdt = _time_render(ref_render_masked, sc["views"], n_rays,
                               warmup_frames=1, batches=3, batch=2)
            line["masked"] = {"max_level": ml,
                              "psnr_db": round(psnr_of(mimg, gt), 2),
                              "rays_per_s": round(n_rays / mdt)}
        return line

    ref = None
    if os.environ.get("BENCH_REF", "1") != "0":
        try:
            # spheres keeps its round-1..4 top-level keys; other scenes
            # nest under their name
            ref = _ref_line("spheres" if "spheres" in BENCH_SCENES
                            else BENCH_SCENES[0])
            for scene in BENCH_SCENES:
                if scene == "spheres":
                    continue
                try:
                    ref[scene] = _ref_line(scene)
                except Exception as e:                      # noqa: BLE001
                    ref[scene] = {"error": str(e)[:200]}
        except Exception as e:                              # noqa: BLE001
            ref = {"error": str(e)[:200]}

    out = {
        "metric": f"rays/sec/chip (800^2 held-out render, trained scenes "
                  f"[{'+'.join(BENCH_SCENES)}], {labels[name]}, bf16)",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
        "psnr_db": round(float(np.mean(pose_means)), 2),
        "psnr_mean": round(float(np.mean(pose_means)), 2),
        "psnr_min": round(float(np.min(pose_mins)), 2),
        "mode": name,
        "gate_pass": bool(all_modes[name].get("pass", False)),
        "scenes": BENCH_SCENES,
        "gates": {s: {k: v for k, v in
                      [("gate_db", round(scenes[s]["gate_db"], 2)),
                       ("gate_min_db", round(scenes[s]["gate_min_db"], 2)),
                       ("anchor_db", scenes[s].get("gate_anchor_db")),
                       ("anchor_min_db",
                        scenes[s].get("gate_anchor_min_db")),
                       ("anchor_error",
                        scenes[s].get("gate_anchor_error"))]
                      if v is not None}
                  for s in BENCH_SCENES},
        "modes": all_modes,
    }
    if ref is not None:
        out["ref_backbone"] = ref
    print(json.dumps(out))


if __name__ == "__main__":
    main()
