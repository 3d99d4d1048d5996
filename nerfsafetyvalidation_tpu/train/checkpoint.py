"""Checkpoint save/load with the reference's semantics.

Parity target: reference nerf/utils.py:938-1060 — `save_checkpoint` writes
{name}_ep{epoch:04d} files with epoch/global_step/stats + model state (+
optimizer/scheduler/EMA when full=True, + density-grid extras under grid-ray
mode), keeps a rolling window of `max_keep_ckpt`, and tracks a separate best
checkpoint (which drops the density grid to save space, :989-991);
`load_checkpoint` resolves latest/best/scratch/explicit-path and tolerates
missing keys (non-strict load).

Format: a pickle of numpy-ified pytrees (model params, optax state, EMA),
stamped with `format_version`. An optional orbax backend
(CheckpointManager(backend="orbax")) stores the array pytrees through
orbax.checkpoint.PyTreeCheckpointer (directory checkpoints with a JSON
sidecar for scalars) — same resolve/load surface, production-grade
sharded-array support. A converter for the reference's torch .pth files
lives in data/convert.py.
"""

FORMAT_VERSION = 2

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
    def __init__(self, ckpt_path: str, name: str = "ngp", max_keep: int = 2,
                 backend: str = "pickle"):
        if backend not in ("pickle", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        self.backend = backend
        self.ckpt_path = ckpt_path
        self.name = name
        self.max_keep = max_keep
        os.makedirs(ckpt_path, exist_ok=True)
        ext = ".ckpt" if backend == "pickle" else ".orbax"
        self.best_path = os.path.join(ckpt_path, f"{self.name}{ext}")
        self.saved = []

    def _file(self, epoch: int) -> str:
        ext = ".ckpt" if self.backend == "pickle" else ".orbax"
        return os.path.join(self.ckpt_path,
                            f"{self.name}_ep{epoch:04d}{ext}")

    def save(self, epoch, global_step, params, stats=None, opt_state=None,
             ema_params=None, renderer_state=None, full=False, best=False,
             best_result=None):
        state = {
            "format_version": FORMAT_VERSION,
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
                if os.path.isdir(old):
                    import shutil
                    shutil.rmtree(old, ignore_errors=True)
                elif os.path.exists(old):
                    os.remove(old)
        if self.backend == "orbax":
            self._save_orbax(path, state)
            return path
        # atomic write: a kill mid-save must not leave a truncated file that
        # poisons the next 'latest' resume
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
        return path

    @staticmethod
    def _save_orbax(path, state):
        import json
        import shutil
        import orbax.checkpoint as ocp

        arrays = {k: state[k] for k in ("model", "optimizer", "ema",
                                        "renderer_state") if k in state}
        meta = {k: v for k, v in state.items() if k not in arrays}
        tmp = path + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(tmp, "arrays"), arrays)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)

    def resolve(self, which: str = "latest"):
        """Return a checkpoint path or None (utils.py:1000-1024 logic)."""
        if which == "scratch":
            return None
        if which == "best":
            return self.best_path if os.path.exists(self.best_path) \
                else self.resolve("latest")
        if which in ("latest", "latest_model"):
            ext = ".ckpt" if self.backend == "pickle" else ".orbax"
            ckpts = sorted(glob.glob(
                os.path.join(self.ckpt_path, f"{self.name}_ep*{ext}")))
            # skip unreadable (e.g. truncated) files, newest first
            for path in reversed(ckpts):
                try:
                    if os.path.isdir(path):
                        if os.path.exists(os.path.join(path, "meta.json")):
                            return path
                        raise IOError("incomplete orbax checkpoint")
                    with open(path, "rb") as f:
                        pickle.load(f)
                    return path
                except Exception:
                    print(f"[WARN] skipping unreadable checkpoint {path}")
            return None
        return which if os.path.exists(which) else None

    @staticmethod
    def load(path: str):
        if os.path.isdir(path):  # orbax backend
            import json
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            arrays = ckptr.restore(os.path.join(path, "arrays"))
            with open(os.path.join(path, "meta.json")) as f:
                state = json.load(f)
            state.update(arrays)
        else:
            with open(path, "rb") as f:
                state = pickle.load(f)
        for k in ("model", "optimizer", "ema", "renderer_state"):
            if k in state:
                state[k] = _to_jax(state[k])
        return state
