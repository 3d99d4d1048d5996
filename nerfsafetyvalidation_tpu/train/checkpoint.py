"""Checkpoint save/load with the reference's semantics.

Parity target: reference nerf/utils.py:938-1060 — `save_checkpoint` writes
{name}_ep{epoch:04d} files with epoch/global_step/stats + model state (+
optimizer/scheduler/EMA when full=True, + density-grid extras under grid-ray
mode), keeps a rolling window of `max_keep_ckpt`, and tracks a separate best
checkpoint (which drops the density grid to save space, :989-991);
`load_checkpoint` resolves latest/best/scratch/explicit-path and tolerates
missing keys (non-strict load).

Format: a pickle of numpy-ified pytrees (model params, optax state, EMA).
A converter for the reference's torch .pth files lives in data/convert.py.
"""

import glob
import os
import pickle

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


class CheckpointManager:
    def __init__(self, ckpt_path: str, name: str = "ngp", max_keep: int = 2):
        self.ckpt_path = ckpt_path
        self.name = name
        self.max_keep = max_keep
        os.makedirs(ckpt_path, exist_ok=True)
        self.best_path = os.path.join(ckpt_path, f"{self.name}.ckpt")
        self.saved = []

    def _file(self, epoch: int) -> str:
        return os.path.join(self.ckpt_path, f"{self.name}_ep{epoch:04d}.ckpt")

    def save(self, epoch, global_step, params, stats=None, opt_state=None,
             ema_params=None, renderer_state=None, full=False, best=False,
             best_result=None):
        state = {
            "epoch": int(epoch),
            "global_step": int(global_step),
            "stats": stats or {},
            "model": _to_numpy(params),
        }
        if renderer_state is not None and not best:
            state["renderer_state"] = _to_numpy(renderer_state)
        if full:
            if opt_state is not None:
                state["optimizer"] = _to_numpy(opt_state)
            if ema_params is not None:
                state["ema"] = _to_numpy(ema_params)
        if best:
            if best_result is not None:
                state["best_result"] = float(best_result)
            path = self.best_path
        else:
            path = self._file(epoch)
            self.saved.append(path)
            while len(self.saved) > self.max_keep:
                old = self.saved.pop(0)
                if os.path.exists(old):
                    os.remove(old)
        # atomic write: a kill mid-save must not leave a truncated file that
        # poisons the next 'latest' resume
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
        return path

    def resolve(self, which: str = "latest"):
        """Return a checkpoint path or None (utils.py:1000-1024 logic)."""
        if which == "scratch":
            return None
        if which == "best":
            return self.best_path if os.path.exists(self.best_path) \
                else self.resolve("latest")
        if which in ("latest", "latest_model"):
            ckpts = sorted(glob.glob(
                os.path.join(self.ckpt_path, f"{self.name}_ep*.ckpt")))
            # skip unreadable (e.g. truncated) files, newest first
            for path in reversed(ckpts):
                try:
                    with open(path, "rb") as f:
                        pickle.load(f)
                    return path
                except Exception:
                    print(f"[WARN] skipping unreadable checkpoint {path}")
            return None
        return which if os.path.exists(which) else None

    @staticmethod
    def load(path: str):
        with open(path, "rb") as f:
            state = pickle.load(f)
        for k in ("model", "optimizer", "ema", "renderer_state"):
            if k in state:
                state[k] = _to_jax(state[k])
        return state
