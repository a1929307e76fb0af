"""Per-stage compile + execution profiling of the render pipeline on TPU.

Usage: python scripts/profile_stages.py [H W] (default 480 736)
Each stage is jitted separately; reports compile seconds and min exec ms.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.models.cost_reg_net import CostRegNet, MinCostRegNet
from boostmvsnerfs_tpu.models.feature_net import FeatureNet
from boostmvsnerfs_tpu.models.nerf_head import NeRFHead
from boostmvsnerfs_tpu.ops import cost_volume, geometry, render, sampling


def _sync(out):
    """Force completion: block_until_ready alone does not reliably wait on
    the axon remote backend for freshly-compiled executables — a tiny host
    transfer does."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def bench(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:34s} compile {compile_s:7.1f}s   exec {min(times)*1e3:9.2f}ms",
          flush=True)
    return out


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 736
    BK, S = 4, 3  # K=4 volumes folded into batch, 3 views each
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    print(f"profile at H={H} W={W}, BK={BK}, S={S}", flush=True)

    # ---- feature net over 6 source views
    fnet = FeatureNet()
    x6 = jnp.asarray(rng.standard_normal((6, H, W, 3)), jnp.float32)
    fvars = fnet.init(key, x6, False)
    bench("feature_net (6 views)", jax.jit(lambda v, x: fnet.apply(v, x, False)),
          fvars, x6)

    # ---- level-0 plane sweep variance (D=64, 1/8 scale, feats 1/4)
    Hv0, Wv0, D0 = H // 8, W // 8, 64
    feats0 = jnp.asarray(
        rng.standard_normal((BK, S, H // 4, W // 4, 32)), jnp.float32
    )
    pm = jnp.asarray(rng.standard_normal((BK, S, 3, 4)), jnp.float32)
    dv0 = jnp.asarray(
        np.broadcast_to(np.linspace(2, 8, D0)[None, :, None, None],
                        (BK, D0, Hv0, Wv0)), jnp.float32)
    vv = jax.jit(jax.vmap(cost_volume.variance_volume))
    vol0 = bench("variance_volume L0 (D=64)", vv, feats0, pm, dv0)

    # ---- level-1 plane sweep (D=8, 1/2 scale)
    Hv1, Wv1, D1 = H // 2, W // 2, 8
    feats1 = jnp.asarray(
        rng.standard_normal((BK, S, H // 2, W // 2, 16)), jnp.float32
    )
    dv1 = jnp.asarray(
        np.broadcast_to(np.linspace(2, 8, D1)[None, :, None, None],
                        (BK, D1, Hv1, Wv1)), jnp.float32)
    vol1 = bench("variance_volume L1 (D=8)", vv, feats1, pm, dv1)

    # ---- cost reg nets
    reg0 = MinCostRegNet()
    rvars0 = reg0.init(key, vol0, False)
    bench("MinCostRegNet L0", jax.jit(lambda v, x: reg0.apply(v, x, False)),
          rvars0, vol0)
    reg1 = CostRegNet()
    rvars1 = reg1.init(key, vol1, False)
    fv1, _ = bench("CostRegNet L1", jax.jit(lambda v, x: reg1.apply(v, x, False)),
                   rvars1, vol1)

    # ---- level-1 ray stage pieces
    N = H * W  # full image rays
    Ns = 2
    pts = jnp.asarray(rng.uniform(0, 100, (BK, N * Ns, 3)), jnp.float32)

    def vox_gather(vol, p):
        return jax.vmap(lambda v, q: sampling.grid_sample_3d(v, q, "zeros"))(vol, p)

    bench("get_vox_feat L1 (3D gather)", jax.jit(vox_gather), fv1,
          pts * jnp.asarray([Wv1 - 1, Hv1 - 1, D1 - 1]) / 100.0)

    img_feat = jnp.asarray(
        rng.standard_normal((BK, S, H, W, 11)), jnp.float32
    )
    xy = jnp.asarray(rng.uniform(0, W, (BK, N * Ns, 2)), jnp.float32)

    def img_gather(imgs, coords):
        out = []
        for s in range(S):
            out.append(jax.vmap(
                lambda im, c: sampling.grid_sample_2d(im, c, "border")
            )(imgs[:, s], coords))
        return jnp.stack(out, -2)

    bench("img feat gather x3 views (2D)", jax.jit(img_gather), img_feat, xy)

    # ---- nerf head L1
    head = NeRFHead(feat_ch=11)
    vox_feat = jnp.asarray(rng.standard_normal((BK, N, Ns, 8)), jnp.float32)
    ifrd = jnp.asarray(rng.standard_normal((BK, N, Ns, S, 15)), jnp.float32)
    hvars = head.init(key, vox_feat, ifrd)
    bench("nerf head L1", jax.jit(lambda v, a, b: head.apply(v, a, b)),
          hvars, vox_feat, ifrd)

    # ---- compositing
    raws = jnp.asarray(rng.standard_normal((1, 4, N, Ns, 4)), jnp.float32)
    masks = jnp.ones((1, 4, N, Ns), jnp.float32) / 4
    z = jnp.asarray(np.sort(rng.uniform(1, 5, (1, 4, N, Ns))), jnp.float32)
    bench("composite_blend K=4", jax.jit(render.composite_blend), raws, masks, z)


if __name__ == "__main__":
    main()
