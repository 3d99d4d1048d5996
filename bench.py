"""Headline benchmark: render throughput (rays/sec/chip) on the validation
workload — an 800x800 view (640k rays) at 512 samples/ray through the
flagship Instant-NGP hash-grid NeRF, the exact shape validate.py drives
(reference envConfig.json:51-52, validate.py:72-75).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star target of 50M rays/sec/chip.
"""

import json
import time

import numpy as np

NORTH_STAR_RAYS_PER_SEC = 50e6


def main():
    import jax
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.config import NetworkConfig
    from nerfsafetyvalidation_tpu.models.network import NeRFNetwork
    from nerfsafetyvalidation_tpu.models import renderer as R
    from nerfsafetyvalidation_tpu.data.rays import get_rays

    H = W = 800
    num_steps = 512

    cfg = NetworkConfig(bound=1.0, compute_dtype="bfloat16")
    net = NeRFNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    intr = (1111.0, 1111.0, W / 2, H / 2)
    rays = get_rays(jnp.asarray(pose[None]), intr, H, W)
    rays_o = rays["rays_o"].reshape(-1, 3)
    rays_d = rays["rays_d"].reshape(-1, 3)
    n_rays = rays_o.shape[0]

    render = jax.jit(lambda p, o, d: R.render_tiles(
        net, p, o, d, tile=8192, num_steps=num_steps, upsample_steps=0,
        bg_color=1.0)["image"])

    # warm up / compile
    img = render(params, rays_o, rays_d)
    img.block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        img = render(params, rays_o, rays_d)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    rays_per_sec = n_rays / dt
    print(json.dumps({
        "metric": "rays/sec/chip (800^2 render, 512 samples/ray, hashgrid NeRF)",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
