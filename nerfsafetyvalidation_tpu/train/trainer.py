"""Training / evaluation / checkpoint orchestration.

Parity target: reference nerf/utils.py `Trainer` (:257-1060):
  * ctor wiring optimizer/EMA/console/log-file/ckpt auto-load (:258-385)
  * train_step with pixel-wise random background compositing for RGBA
    datasets, perturbed sampling, error-map EMA update (:404-487)
  * eval/test steps with staged rendering (:489-530)
  * per-epoch loops with density-grid refresh every update_extra_interval
    steps (:754-835), checkpoints per epoch + best-on-eval (:557-581)
  * checkpoint semantics in checkpoint.py

TPU-native rebuild decisions:
  * optax.adam(b1=0.9, b2=0.99, eps=1e-15) with the reference's
    0.1**(step/iters) LambdaLR decay (main_nerf.py:114-121), stepped every
    iteration; bf16 compute replaces torch.cuda.amp fp16 + GradScaler
    (bf16 needs no loss scaling)
  * one jitted train step fuses render + loss + backward + adam update;
    buffers are donated so the param/optimizer memory is updated in place
  * data parallel: ray batch sharded over a 1-D 'data' mesh, params
    replicated — XLA inserts the psum the reference did with DDP/NCCL
    (utils.py:305-307)
"""

import glob
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import renderer as R
from ..data.rays import srgb_to_linear, linear_to_srgb
from .checkpoint import CheckpointManager
from .metrics import PSNRMeter


def default_optimizer(opt):
    """Adam + exponential LR decay (main_nerf.py:114-121)."""
    lr = getattr(opt, "lr", 1e-2)
    iters = max(int(getattr(opt, "iters", 30000)), 1)

    def schedule(step):
        return lr * 0.1 ** jnp.minimum(step / iters, 1.0)

    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.99, eps=1e-15)


class Trainer:
    def __init__(self, name, opt, net, params=None, criterion="mse",
                 optimizer=None, ema_decay=None, metrics=(), workspace="workspace",
                 use_checkpoint="latest", eval_interval=1, max_keep_ckpt=2,
                 use_tensorboardX=False, mute=False, local_rank=0,
                 data_parallel=False, fp16=False, ckpt_interval=1):
        self.name = name
        self.opt = opt
        self.net = net
        self.mute = mute
        self.metrics = list(metrics) or [PSNRMeter()]
        self.workspace = workspace
        self.eval_interval = eval_interval
        # a full checkpoint device_gets ~1 GB of params+opt state — over
        # the tunneled TPU that is tens of seconds per save, so batch jobs
        # (bench.py) save every N epochs; the final epoch always saves
        self.ckpt_interval = max(1, int(ckpt_interval))
        self.use_tensorboardX = use_tensorboardX
        self.local_rank = local_rank
        self.time_stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        self.fp16 = fp16

        self.params = params if params is not None else \
            net.init(jax.random.PRNGKey(getattr(opt, "seed", 0)))
        self.tx = optimizer if optimizer is not None else default_optimizer(opt)
        self.opt_state = self.tx.init(self.params)
        self.ema_decay = ema_decay
        # copy (not alias): params buffers are donated by the jitted step
        self.ema_params = jax.tree_util.tree_map(jnp.array, self.params) \
            if ema_decay is not None else None

        self.renderer_state = None
        if net.cfg.grid_ray:
            self.renderer_state = R.RendererState.create(
                net.cfg.cascade, net.cfg.grid_size)

        self.epoch = 0
        self.global_step = 0
        self.local_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [],
                      "checkpoints": [], "best_result": None}
        self.error_map = None
        self.writer = None
        self.key = jax.random.PRNGKey(getattr(opt, "seed", 0) + 1)

        # mesh for data-parallel ray sharding
        self.mesh = None
        if data_parallel:
            from ..parallel.mesh import get_mesh, replicate_params
            self.mesh = get_mesh()
            self.params = replicate_params(self.params, self.mesh)

        # workspace / logging (utils.py:347-358)
        self.log_ptr = None
        if workspace is not None:
            os.makedirs(workspace, exist_ok=True)
            self.log_path = os.path.join(workspace, f"log_{name}.txt")
            self.log_ptr = open(self.log_path, "a+")
            self.ckpt = CheckpointManager(os.path.join(workspace, "checkpoints"),
                                          name=name, max_keep=max_keep_ckpt)
        else:
            self.ckpt = None

        n_params = sum(int(np.prod(np.shape(x)))
                       for x in jax.tree_util.tree_leaves(self.params))
        self.log(f"[INFO] Trainer: {name} | {self.time_stamp} | "
                 f"{jax.default_backend()} | "
                 f"{'bf16' if fp16 else 'fp32'} | {workspace}")
        self.log(f"[INFO] #parameters: {n_params}")

        if self.ckpt is not None:
            if use_checkpoint == "scratch":
                self.log("[INFO] Training from scratch ...")
            else:
                path = self.ckpt.resolve(use_checkpoint)
                if path is None:
                    self.log(f"[INFO] no checkpoint for {use_checkpoint!r}, "
                             "training from scratch")
                else:
                    self.log(f"[INFO] Loading {path} ...")
                    self.load_checkpoint(
                        path, model_only=(use_checkpoint == "latest_model"))

        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------ log
    def log(self, *args, **kwargs):
        if self.local_rank == 0:
            if not self.mute:
                print(*args)
            if self.log_ptr:
                print(*args, file=self.log_ptr)
                self.log_ptr.flush()

    # ------------------------------------------------------------ train step
    def _build_train_step(self):
        net = self._phase_net()
        opt = self.opt
        tx = self.tx
        num_steps = getattr(opt, "num_steps", 128)
        upsample_steps = getattr(opt, "upsample_steps", 128)
        linear_cs = getattr(opt, "color_space", "srgb") == "linear"

        grid_ray = net.cfg.grid_ray
        grid_max_samples = self._grid_max_samples()
        grid_max_steps = getattr(opt, "max_steps", 1024)
        dt_gamma = getattr(opt, "dt_gamma", 0.0)
        samples_per_hit = getattr(opt, "grid_samples_per_hit", 1)
        budget_per_ray = self._budget_per_ray()

        ema_decay = self.ema_decay

        self._built_budget = (budget_per_ray, grid_max_samples,
                              net is not self.net)

        def step(params, opt_state, ema_params, key, rays_o, rays_d, images,
                 renderer_state=None):
            """rays: [B, N, 3]; images: [B, N, C] (C = 3 or 4)."""
            k_bg, k_render = jax.random.split(key)
            C = images.shape[-1]
            img_rgb = images[..., :3]
            if linear_cs:
                img_rgb = srgb_to_linear(img_rgb)
            if C == 4 and net.cfg.bg_radius <= 0:
                # pixel-wise random background (utils.py:439-442)
                bg_color = jax.random.uniform(k_bg, img_rgb.shape)
                gt_rgb = img_rgb * images[..., 3:] + bg_color * (1 - images[..., 3:])
            else:
                bg_color = jnp.ones_like(img_rgb)
                gt_rgb = img_rgb if C == 3 else \
                    img_rgb * images[..., 3:] + (1 - images[..., 3:])

            flat_o = rays_o.reshape(-1, 3)
            flat_d = rays_d.reshape(-1, 3)
            flat_bg = bg_color.reshape(-1, 3)
            flat_gt = gt_rgb.reshape(-1, 3)

            def loss_fn(p):
                if grid_ray and renderer_state is not None:
                    # occupancy-marched training render (the reference's
                    # cuda_ray train path, renderer.py:286-327); budgeted
                    # compaction keeps the fwd/bwd hash gathers proportional
                    # to REAL samples, not K slots
                    out = R.run_grid(net, p, renderer_state, flat_o, flat_d,
                                     max_samples=grid_max_samples,
                                     max_steps=grid_max_steps,
                                     dt_gamma=dt_gamma, bg_color=flat_bg,
                                     perturb_key=k_render,
                                     samples_per_hit=samples_per_hit,
                                     sample_budget=flat_o.shape[0]
                                     * budget_per_ray)
                else:
                    out = R.run(net, p, flat_o, flat_d, num_steps=num_steps,
                                upsample_steps=upsample_steps,
                                bg_color=flat_bg, perturb=True, key=k_render,
                                training=True)
                pred = out["image"]
                per_ray = jnp.mean((pred - flat_gt) ** 2, axis=-1)
                return jnp.mean(per_ray), (pred, per_ray)

            (loss, (pred, per_ray)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_params is not None:
                # per-STEP EMA like the reference (ema.update() inside the
                # batch loop, utils.py:815), fused into the jitted step
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema_params, params)
            return params, opt_state, ema_params, loss, pred, per_ray

        # the pure step math is shared with the fused multi-step scan
        # (_scan_block_fn); invalidate that cache — it closes over this
        self._step_math = step
        self._scan_cache = {}
        return partial(jax.jit, donate_argnums=(0, 1, 2))(step)

    def _phase_net(self):
        """Network for the CURRENT training phase. With
        opt.fold_warmup_scale set on a mipfold backbone, warmup steps
        train through a reduced-fold-resolution variant of the same
        network (identical params; MipFoldSpec.fold_scale) — the O(F^3)
        fold-build term shrinks cubically while the occupancy grid is
        still carving, then the native-F net takes over (progressive
        fold resolution, VERDICT r4 item 4b)."""
        w = int(getattr(self.opt, "fold_warmup_scale", 0) or 0)
        if not w or self.net.cfg.encoding != "mipfold":
            return self.net
        warmup = getattr(self.opt, "grid_warmup_steps", 0)
        if warmup and self.global_step >= warmup:
            return self.net
        net_warm = getattr(self, "_net_warm", None)
        if net_warm is None or net_warm.cfg.fold_scale != w:
            from dataclasses import replace
            from ..models import make_network
            net_warm = self._net_warm = make_network(
                replace(self.net.cfg, fold_scale=w))
        return net_warm

    def _grid_max_samples(self):
        """Slot count pairs with the budget phase: fewer slots post-carve
        cut the [N, K] compaction scatter rows."""
        warmup = getattr(self.opt, "grid_warmup_steps", 0)
        if warmup and self.global_step >= warmup:
            return getattr(self.opt, "grid_max_samples_after_warmup", 32)
        return getattr(self.opt, "grid_max_samples", 64)

    def _budget_per_ray(self):
        """Per-ray sample budget for the marched training render. While the
        occupancy grid is still uncarved (warmup) every ray needs samples
        across its whole [near, far] span; once it carves, real demand
        drops to ~8-16 and the tighter budget cuts the dominant fwd/bwd
        hash-gather rows — the TPU analog of the reference's mean_count-
        adaptive sample allocation (raymarching.py:196-227)."""
        warmup = getattr(self.opt, "grid_warmup_steps", 0)
        if warmup and self.global_step >= warmup:
            return getattr(self.opt, "grid_budget_after_warmup", 16)
        return getattr(self.opt, "grid_sample_budget_per_ray", 16)

    def _refresh_fn(self, n_blocks: int, block: int):
        """One jitted program for the WHOLE grid refresh: fold-table
        rebuild + density probe + EMA/max merge + packbits + skip grid.
        The eager form paid per-op dispatch on the tunneled platform
        (~500 ms per partial refresh, ~31 ms/step amortized — the
        dominant share of the 81 ms/step round-2 training iteration);
        one program also lets XLA fuse the probe into the fold rebuild.
        Mip-fold nets probe through the folded tables (1+1 rows/point
        instead of 8+1)."""
        cache = getattr(self, "_refresh_cache", None)
        if cache is None:
            cache = self._refresh_cache = {}
        fn = cache.get((n_blocks, block))
        if fn is None:
            net = self.net
            gs = net.cfg.grid_size

            @partial(jax.jit, donate_argnums=(1,))
            def refresh(params, state, key):
                probe = net.to_folded(params) \
                    if net.cfg.encoding == "mipfold" else params
                return R.update_extra_state(net, probe, state, key,
                                            grid_size=gs,
                                            n_blocks=n_blocks, block=block)

            fn = cache[(n_blocks, block)] = refresh
        return fn

    def train_step(self, data):
        """One optimization step on a collated ray batch."""
        if self.net.cfg.grid_ray and \
                (self._budget_per_ray(), self._grid_max_samples(),
                 self._phase_net() is not self.net) != self._built_budget:
            self._train_step = self._build_train_step()
        self.key, sub = jax.random.split(self.key)
        rays_o, rays_d = data["rays_o"], data["rays_d"]
        if "images" not in data:
            # CLIP-guided branch for GT-free random poses (utils.py:409-424).
            # Cross-framework gradient flow (torch CLIP -> jax params) is not
            # possible; a jax-differentiable guidance fn must be supplied.
            if getattr(self, "clip_loss_fn", None) is None:
                raise NotImplementedError(
                    "rand_pose training needs a jax-differentiable "
                    "clip_loss_fn on the Trainer (the torch CLIPLoss in "
                    "train/clip_loss.py is evaluation-only)")
            return self._clip_train_step(data, sub)
        images = data["images"]
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            sharded = shard_batch(
                {"o": rays_o, "d": rays_d, "im": images}, self.mesh,
                batch_axis=1)
            rays_o, rays_d, images = sharded["o"], sharded["d"], sharded["im"]
        (self.params, self.opt_state, self.ema_params, loss, pred,
         per_ray) = self._train_step(
            self.params, self.opt_state, self.ema_params, sub, rays_o,
            rays_d, images, self.renderer_state)

        # error-map EMA update (utils.py:456-478), host side
        if self.error_map is not None and "index" in data:
            index = data["index"]
            inds = np.asarray(data["inds_coarse"])
            err = np.asarray(per_ray).reshape(inds.shape)
            emap = self.error_map[index]
            ema_error = 0.1 * np.take_along_axis(emap, inds, axis=1) + 0.9 * err
            np.put_along_axis(emap, inds, ema_error, axis=1)
            self.error_map[index] = emap
        return pred, loss

    def _clip_train_step(self, data, key):
        """Render the full low-res frame and optimize the guidance loss
        (utils.py:410-424 semantics with a pluggable jax loss)."""
        import optax as _optax
        H, W = data["H"], data["W"]

        def loss_fn(p):
            out = R.run(self.net, p, data["rays_o"].reshape(-1, 3),
                        data["rays_d"].reshape(-1, 3),
                        num_steps=getattr(self.opt, "num_steps", 128),
                        upsample_steps=0, bg_color=1.0, perturb=True,
                        key=key, training=True)
            img = out["image"].reshape(1, H, W, 3).transpose(0, 3, 1, 2)
            return self.clip_loss_fn(img)

        loss, grads = jax.value_and_grad(loss_fn)(self.params)
        updates, self.opt_state = self.tx.update(grads, self.opt_state,
                                                 self.params)
        self.params = _optax.apply_updates(self.params, updates)
        return None, loss

    # ---------------------------------------------------------------- epochs
    def _maybe_refresh(self):
        """Grid refresh on the update_extra_interval schedule (the
        reference's every-16-steps update_extra_state, utils.py:777-779)."""
        if not (self.net.cfg.grid_ray and self.renderer_state is not None and
                self.global_step % getattr(self.opt, "update_extra_interval",
                                           16) == 0):
            return
        self.key, sub = jax.random.split(self.key)
        # full probes while the grid still carves (warmup); after
        # that, rotate strided partial probes (the reference's
        # partial-update path, renderer.py:472-500) at 1/n_blocks
        # the cost per refresh
        warmup = getattr(self.opt, "grid_warmup_steps", 0)
        n_blocks = int(getattr(self.opt, "grid_partial_blocks", 4))
        total = self.net.cfg.grid_size ** 3
        if (self.global_step <= warmup or n_blocks <= 1
                or total % n_blocks != 0):
            n_blocks, block = 1, 0
        else:
            block = getattr(self, "_grid_block", 0)
            self._grid_block = (block + 1) % n_blocks
        self.renderer_state = self._refresh_fn(n_blocks, block)(
            self.params, self.renderer_state, sub)

    def train_one_epoch(self, loader):
        k = int(getattr(self.opt, "steps_per_dispatch", 1))
        if k > 1 and self._fused_eligible(loader):
            return self._train_one_epoch_fused(loader, k)
        self.log(f"==> Start Training Epoch {self.epoch} ...")
        total_loss = 0.0 if self.writer is not None else None
        self.local_step = 0
        for data in loader:
            self._maybe_refresh()
            self.local_step += 1
            self.global_step += 1
            _, loss = self.train_step(data)
            if self.writer is not None:
                # per-step scalar logging needs the value now (one host
                # fetch, ~25 ms floor on the tunneled platform)
                self.writer.add_scalar("train/loss", float(loss),
                                       self.global_step)
                total_loss += float(loss)
            else:
                # keep the loss ON DEVICE: a per-step float(loss) forces a
                # host round-trip that serializes dispatch (the tunnel's
                # ~25 ms fetch floor becomes a per-step tax); accumulating
                # lazily lets XLA pipeline the steps back-to-back
                total_loss = loss if total_loss is None \
                    else total_loss + loss

        if total_loss is None:
            avg = 0.0
        elif isinstance(total_loss, float):
            avg = total_loss / max(self.local_step, 1)
        else:
            avg = float(total_loss) / max(self.local_step, 1)
        self.stats["loss"].append(avg)
        self.log(f"==> Finished Epoch {self.epoch}. avg loss {avg:.6f}")
        return avg

    # -------------------------------------------------- fused multi-step path
    def _fused_eligible(self, loader):
        """The fused scan path covers the common training configuration:
        device-resident preloaded images, no error map, no rand-pose
        interleave, no data-parallel mesh (those fall back to the stepwise
        loop, which stays the exact-semantics reference path)."""
        ds = getattr(loader, "_data", None)
        return (ds is not None and ds.training and ds.error_map is None
                and getattr(ds, "num_rays", 0) > 0
                and isinstance(ds.images, jnp.ndarray)
                and loader.size == len(ds.poses)
                and self.mesh is None)

    def _scan_block_fn(self, ds, blk):
        """One jitted donated program running `blk` training steps:
        lax.scan over (collate + render + loss + backward + adam + EMA).
        Removes the per-step dispatch round-trip the tunneled platform
        charges (~25 ms fetch floor / ~5-10 ms dispatch) and lets XLA
        software-pipeline adjacent steps. The key streams (collate keys
        from the loader, step keys from the carried trainer key) are split
        in the same order as the stepwise loop, so the training trajectory
        is identical."""
        # the stepwise loop increments global_step BEFORE train_step, so
        # budget phases key off the post-increment step count — evaluate
        # them as the block's first step will see them
        saved_gs = self.global_step
        self.global_step += 1
        try:
            budget_key = (self._budget_per_ray(), self._grid_max_samples(),
                          self._phase_net() is not self.net)
            if self.net.cfg.grid_ray and budget_key != self._built_budget:
                # rebuild while bumped so _build_train_step bakes the
                # same phase values
                self._train_step = self._build_train_step()
        finally:
            self.global_step = saved_gs
        cache = self._scan_cache
        key = (blk, ds.H, ds.W, min(ds.num_rays, ds.H * ds.W))
        fn = cache.get(key)
        if fn is not None:
            return fn
        from ..data.provider import fast_collate_math
        step_math = self._step_math
        H, W = ds.H, ds.W
        N = min(ds.num_rays, H * W)
        intr = tuple(float(v) for v in ds.intrinsics)

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def block(params, opt_state, ema_params, tkey, ckeys, idxs,
                  poses_all, images_flat, renderer_state):
            def body(carry, xs):
                params, opt_state, ema_params, tkey = carry
                ckey, idx = xs
                rays_o, rays_d, _, imgs = fast_collate_math(
                    poses_all, images_flat, idx[None], ckey,
                    H=H, W=W, N=N, intrinsics=intr)
                tkey, sub = jax.random.split(tkey)
                params, opt_state, ema_params, loss, _, _ = step_math(
                    params, opt_state, ema_params, sub, rays_o, rays_d,
                    imgs, renderer_state)
                return (params, opt_state, ema_params, tkey), loss

            (params, opt_state, ema_params, tkey), losses = jax.lax.scan(
                body, (params, opt_state, ema_params, tkey), (ckeys, idxs))
            return params, opt_state, ema_params, tkey, jnp.sum(losses)

        cache[key] = block
        return block

    def _train_one_epoch_fused(self, loader, k):
        ds = loader._data
        self.log(f"==> Start Training Epoch {self.epoch} "
                 f"(fused, {k} steps/dispatch) ...")
        interval = int(getattr(self.opt, "update_extra_interval", 16))
        warmup = int(getattr(self.opt, "grid_warmup_steps", 0))
        # device-resident collate inputs (same cache + invalidation rule as
        # the stepwise fast path, NeRFDataset.collate)
        src_ids = (id(ds.poses), id(ds.images))
        if getattr(ds, "_dev_cache_ids", None) != src_ids:
            ds._poses_dev = jnp.asarray(ds.poses)
            ds._images_flat = ds.images.reshape(
                len(ds.poses), -1, ds.images.shape[-1])
            ds._dev_cache_ids = src_ids
        pairs = list(loader.iter_indices())
        total_loss = None
        self.local_step = 0
        i = 0
        while i < len(pairs):
            self._maybe_refresh()
            blk = min(k, len(pairs) - i)
            if self.net.cfg.grid_ray and self.renderer_state is not None \
                    and interval > 0:
                # stop at the next refresh boundary so the refresh schedule
                # matches the stepwise loop exactly
                blk = min(blk, interval - self.global_step % interval)
            if warmup and self.global_step < warmup - 1:
                # budget phases are jit constants: cut at the phase change
                # (post-increment semantics: the step whose incremented
                # count reaches `warmup` is the first post-warmup step)
                blk = min(blk, (warmup - 1) - self.global_step)
            chunk = pairs[i:i + blk]
            idxs = jnp.asarray(np.array([c[0] for c in chunk], np.int32))
            ckeys = jnp.stack([c[1] for c in chunk])
            fn = self._scan_block_fn(ds, blk)
            (self.params, self.opt_state, self.ema_params, self.key,
             loss_sum) = fn(self.params, self.opt_state, self.ema_params,
                            self.key, ckeys, idxs, ds._poses_dev,
                            ds._images_flat, self.renderer_state)
            self.global_step += blk
            self.local_step += blk
            i += blk
            total_loss = loss_sum if total_loss is None \
                else total_loss + loss_sum
            if self.writer is not None:
                self.writer.add_scalar("train/loss", float(loss_sum) / blk,
                                       self.global_step)
        avg = float(total_loss) / max(self.local_step, 1) \
            if total_loss is not None else 0.0
        self.stats["loss"].append(avg)
        self.log(f"==> Finished Epoch {self.epoch}. avg loss {avg:.6f}")
        return avg

    def train(self, train_loader, valid_loader, max_epochs):
        if self.use_tensorboardX and self.local_rank == 0:
            import tensorboardX
            self.writer = tensorboardX.SummaryWriter(
                os.path.join(self.workspace, "run", self.name))
        if self.net.cfg.grid_ray and self.renderer_state is not None:
            self.renderer_state = R.mark_untrained_grid(
                self.net.cfg, self.renderer_state, train_loader._data.poses,
                train_loader._data.intrinsics,
                grid_size=self.net.cfg.grid_size)
        self.error_map = train_loader._data.error_map

        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            self.train_one_epoch(train_loader)
            if self.ckpt is not None and (
                    epoch % self.ckpt_interval == 0 or epoch == max_epochs):
                self.save_checkpoint(full=True, best=False)
            if self.epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_loader)
                if self.ckpt is not None:
                    self.save_checkpoint(full=False, best=True)
        if self.writer is not None:
            self.writer.close()

    # ------------------------------------------------------------------ eval
    def eval_params(self):
        return self.ema_params if self.ema_params is not None else self.params

    def eval_step(self, data):
        rays_o, rays_d = data["rays_o"], data["rays_d"]
        images = data["images"]  # [B, H, W, C]
        B, H, W, C = images.shape
        img_rgb = images[..., :3]
        if getattr(self.opt, "color_space", "srgb") == "linear":
            img_rgb = srgb_to_linear(img_rgb)
        gt_rgb = img_rgb if C == 3 else \
            img_rgb * images[..., 3:] + (1 - images[..., 3:])
        out = R.render(self.net, self.eval_params(),
                       rays_o, rays_d, staged=True,
                       max_ray_batch=getattr(self.opt, "max_ray_batch", 4096),
                       num_steps=getattr(self.opt, "num_steps", 128),
                       upsample_steps=getattr(self.opt, "upsample_steps", 128),
                       bg_color=1.0)
        pred_rgb = out["image"].reshape(B, H, W, 3)
        pred_depth = out["depth"].reshape(B, H, W)
        loss = float(jnp.mean((pred_rgb - gt_rgb) ** 2))
        return pred_rgb, pred_depth, gt_rgb, loss

    def evaluate_one_epoch(self, loader, name=None):
        self.log(f"++> Evaluate at epoch {self.epoch} ...")
        if name is None:
            name = f"{self.name}_ep{self.epoch:04d}"
        for metric in self.metrics:
            metric.clear()
        total_loss, count = 0.0, 0
        os.makedirs(os.path.join(self.workspace, "validation"), exist_ok=True)
        for i, data in enumerate(loader):
            pred, depth, gt, loss = self.eval_step(data)
            total_loss += loss
            count += 1
            for metric in self.metrics:
                metric.update(np.asarray(pred), np.asarray(gt))
            try:
                import cv2
                img = (np.asarray(pred[0]) * 255).clip(0, 255).astype(np.uint8)
                cv2.imwrite(os.path.join(self.workspace, "validation",
                                         f"{name}_{i:04d}_rgb.png"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            except Exception:
                pass
        avg = total_loss / max(count, 1)
        self.stats["valid_loss"].append(avg)
        result = self.metrics[0].measure() if self.metrics else avg
        self.stats["results"].append(result)
        for metric in self.metrics:
            self.log(metric.report())
        self.log(f"++> Evaluate epoch {self.epoch} Finished. loss {avg:.6f}")
        return avg

    def evaluate(self, loader, name=None):
        return self.evaluate_one_epoch(loader, name)

    def test(self, loader, save_path=None, name=None, write_video=True):
        """Render the test camera path (utils.py:588-638)."""
        if save_path is None:
            save_path = os.path.join(self.workspace, "results")
        if name is None:
            name = f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        self.log(f"==> Start Test, save results to {save_path}")
        mode = getattr(self.opt, "render_mode", "staged")
        if mode != "staged" and self.renderer_state is None:
            self.log(f"[WARN] render_mode={mode} needs the occupancy grid "
                     "(grid-ray training); falling back to staged")
            mode = "staged"
        all_preds, all_depths = [], []
        for i, data in enumerate(loader):
            H, W = data["H"], data["W"]
            if mode == "fast":
                out = R.render_frame_fast(
                    self.net, self.eval_params(), self.renderer_state,
                    data["rays_o"].reshape(-1, 3),
                    data["rays_d"].reshape(-1, 3),
                    tile=min(131072, -(-(H * W) // 1024) * 1024),
                    max_samples=16,
                    max_steps=getattr(self.opt, "max_steps", 1024),
                    dt_gamma=getattr(self.opt, "dt_gamma", 0.0),
                    samples_per_hit=2)
            elif mode in ("guided", "scout"):
                out = R.render_frame_guided(
                    self.net, self.eval_params(), self.renderer_state,
                    data["rays_o"].reshape(-1, 3),
                    data["rays_d"].reshape(-1, 3), H, W,
                    prepass_factor=8, max_samples=16,
                    max_steps=getattr(self.opt, "max_steps", 1024),
                    dt_gamma=getattr(self.opt, "dt_gamma", 0.0),
                    prepass_mode=("scout" if mode == "scout" else "march"))
            else:
                out = R.render(self.net, self.eval_params(), data["rays_o"],
                               data["rays_d"], staged=True,
                               max_ray_batch=getattr(self.opt, "max_ray_batch",
                                                     4096),
                               num_steps=getattr(self.opt, "num_steps", 128),
                               upsample_steps=getattr(self.opt,
                                                      "upsample_steps", 128))
            pred = np.asarray(out["image"]).reshape(H, W, 3)
            if getattr(self.opt, "color_space", "srgb") == "linear":
                pred = np.asarray(linear_to_srgb(pred))
            depth = np.asarray(out["depth"]).reshape(H, W)
            pred8 = (pred * 255).clip(0, 255).astype(np.uint8)
            depth8 = (depth * 255).clip(0, 255).astype(np.uint8)
            if write_video:
                all_preds.append(pred8)
                all_depths.append(depth8)
            else:
                import cv2
                cv2.imwrite(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"),
                            cv2.cvtColor(pred8, cv2.COLOR_RGB2BGR))
                cv2.imwrite(os.path.join(save_path, f"{name}_{i:04d}_depth.png"),
                            depth8)
        if write_video and all_preds:
            try:
                import imageio
                imageio.mimwrite(os.path.join(save_path, f"{name}_rgb.mp4"),
                                 np.stack(all_preds), fps=25, quality=8,
                                 macro_block_size=1)
                imageio.mimwrite(os.path.join(save_path, f"{name}_depth.mp4"),
                                 np.stack(all_depths), fps=25, quality=8,
                                 macro_block_size=1)
            except (ValueError, ImportError):
                # no ffmpeg backend available: fall back to PNG frames
                import cv2
                self.log("[WARN] no mp4 backend; writing PNG frames instead")
                for i, (p, dd) in enumerate(zip(all_preds, all_depths)):
                    cv2.imwrite(os.path.join(save_path,
                                             f"{name}_{i:04d}_rgb.png"),
                                cv2.cvtColor(p, cv2.COLOR_RGB2BGR))
                    cv2.imwrite(os.path.join(save_path,
                                             f"{name}_{i:04d}_depth.png"), dd)
        self.log("==> Finished Test.")

    # ----------------------------------------------------------------- mesh
    def save_mesh(self, save_path=None, resolution=256, threshold=10):
        from .mesh_export import extract_geometry, write_ply
        if save_path is None:
            save_path = os.path.join(self.workspace, "meshes",
                                     f"{self.name}_{self.epoch}.ply")
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        bound = self.net.cfg.bound

        def query(pts):
            return np.asarray(self.net.density(self.params,
                                               jnp.asarray(pts))["sigma"])

        verts, faces = extract_geometry(
            np.asarray([-bound] * 3), np.asarray([bound] * 3), resolution,
            threshold, query)
        write_ply(save_path, verts, faces)
        self.log(f"==> Saved mesh to {save_path}")

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, full=False, best=False):
        if best:
            result = self.stats["results"][-1] if self.stats["results"] else None
            path = self.ckpt.save(self.epoch, self.global_step,
                                  self.eval_params(), stats=self.stats,
                                  best=True, best_result=result)
        else:
            path = self.ckpt.save(self.epoch, self.global_step, self.params,
                                  stats=self.stats, opt_state=self.opt_state,
                                  ema_params=self.ema_params,
                                  renderer_state=self.renderer_state, full=full)
            self.stats["checkpoints"].append(path)
        return path

    def load_checkpoint(self, checkpoint=None, model_only=False):
        if checkpoint is None:
            checkpoint = self.ckpt.resolve("latest")
            if checkpoint is None:
                self.log("[WARN] No checkpoint found, model randomly initialized.")
                return
        state = CheckpointManager.load(checkpoint)
        if "model" in state:
            self.params = state["model"]
        if model_only:
            return
        self.epoch = state.get("epoch", 0)
        self.global_step = state.get("global_step", 0)
        self.stats = state.get("stats", self.stats)
        if "renderer_state" in state and self.renderer_state is not None:
            rs = state["renderer_state"]
            if isinstance(rs, R.RendererState):
                self.renderer_state = rs
        if "optimizer" in state:
            try:
                self.opt_state = state["optimizer"]
            except Exception:
                self.log("[WARN] failed to restore optimizer state")
        if "ema" in state and self.ema_params is not None:
            self.ema_params = state["ema"]
        self.log(f"[INFO] loaded {checkpoint} at epoch {self.epoch}, "
                 f"global step {self.global_step}")
