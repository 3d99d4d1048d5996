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


def ffmlp_split_weights(flat, input_dim, output_dim, hidden_dim, num_layers):
    """De-pad one FFMLP flat weight vector into per-matmul [in, out]
    matrices for models.network_ff.

    Layout contract (ffmlp/ffmlp.py:118-122 + ffmlp.cu kernel weight
    walk): matrices are stored consecutively, each row-major [out, in]
    (tiny-cuda-nn convention), in the order
        [hidden, input_dim], (num_layers-1) x [hidden, hidden],
        [padded_output, hidden]     with padded_output = ceil(out/16)*16;
    the padded output ROWS are zero/garbage and are dropped.
    """
    flat = np.asarray(flat, dtype=np.float32).reshape(-1)
    padded_out = int(np.ceil(output_dim / 16)) * 16
    shapes = ([(hidden_dim, input_dim)]
              + [(hidden_dim, hidden_dim)] * (num_layers - 1)
              + [(padded_out, hidden_dim)])
    expect = sum(o * i for o, i in shapes)
    if flat.size != expect:
        raise ValueError(
            f"FFMLP weight vector has {flat.size} params, expected {expect} "
            f"for in={input_dim} out={output_dim} hidden={hidden_dim} "
            f"layers={num_layers} (ffmlp.py:118-122)")
    mats, ofs = [], 0
    for o, i in shapes:
        mats.append(flat[ofs:ofs + o * i].reshape(o, i))
        ofs += o * i
    mats[-1] = mats[-1][:output_dim]          # drop output padding rows
    import jax.numpy as jnp
    return [jnp.asarray(m.T) for m in mats]   # [in, out] like our nets


def ffmlp_pack_weights(mats, output_dim):
    """Inverse of ffmlp_split_weights (testing + export): [in, out]
    matrices -> flat padded vector."""
    mats = [np.asarray(m, dtype=np.float32).T for m in mats]  # [out, in]
    padded_out = int(np.ceil(output_dim / 16)) * 16
    last = np.zeros((padded_out, mats[-1].shape[1]), dtype=np.float32)
    last[:output_dim] = mats[-1]
    mats = mats[:-1] + [last]
    return np.concatenate([m.reshape(-1) for m in mats])


def torch_ff_state_dict_to_params(state_dict, input_dim=32, sigma_out=16,
                                  color_in=32, hidden=64, sigma_layers=2,
                                  color_layers=3):
    """Params pytree for models.network_ff from a reference network_ff
    checkpoint (FFMLP flat 'weights' tensors; nerf/network_ff.py:42-68:
    sigma FFMLP(32 -> 16, hidden 64, num_layers 2), color
    FFMLP(32 -> 3, hidden 64, num_layers 3) with the color input manually
    padded to 32)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()
          if hasattr(v, "shape")}
    params = {}
    if "encoder.embeddings" in sd:
        import jax.numpy as jnp
        params["encoder"] = {
            "embeddings": jnp.asarray(sd["encoder.embeddings"])}
    if "sigma_net.weights" in sd:
        params["sigma_net"] = ffmlp_split_weights(
            sd["sigma_net.weights"], input_dim, sigma_out, hidden,
            sigma_layers)
    if "color_net.weights" in sd:
        params["color_net"] = ffmlp_split_weights(
            sd["color_net.weights"], color_in, 3, hidden, color_layers)
    return params
