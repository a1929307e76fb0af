"""Device mesh construction and sharding rules.

The TPU-native replacement for the reference's NCCL process groups
(reference train_net.py:143-149): a single ``Mesh(('data', 'rays'))``.

* ``data`` — data parallelism over scenes/target views (the reference's DDP
  axis, lib/datasets/samplers.py:103-159); gradients reduce over it.
* ``rays`` — the per-view ray bundle is sharded so each device renders an
  image tile; the reference instead loops serial chunks on one GPU
  (lib/networks/enerf/network.py:45-55 ``batchify_rays``).

Sharding is applied via jit in/out shardings (GSPMD): the cost-volume build
stays replicated per data-group while ray-stage tensors partition over
``rays``; XLA inserts the all-gathers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 1, n_rays: int | None = None, devices=None
) -> Mesh:
    """Build a (data, rays) mesh. Defaults: all devices on the rays axis."""
    if devices is None:
        devices = jax.devices()
    if n_rays is None:
        n_rays = max(1, len(devices) // n_data)
    use = np.asarray(devices[: n_data * n_rays]).reshape(n_data, n_rays)
    return Mesh(use, ("data", "rays"))


def make_cv_mesh(
    n_devices: int | None = None, k_best: int = 4, batch: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(cv, rays)`` mesh for the fused boost render.

    The flagship eval workload has two natural parallel axes: the K fused
    cost volumes (embarrassingly parallel until the final blend,
    SURVEY.md §2.3b) and the per-view ray bundle. The ``cv`` axis takes
    the largest factor of ``batch * k_best`` that fits; remaining devices
    go to ``rays``. Volume building + per-volume rendering then shard
    over ALL devices (cv x rays), with one cross-``cv`` reduction at the
    blend — unlike the plain (data, rays) mesh, where the ray-independent
    volume stages replicate per ray-shard (measured: work_efficiency
    0.63/0.36/0.20 at N=2/4/8 on the 64x96 CI geometry, SCALING_r04).
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    bk = batch * k_best
    cv = 1
    for d in range(min(n, bk), 0, -1):
        if n % d == 0 and bk % d == 0:
            cv = d
            break
    use = np.asarray(devices[:n]).reshape(cv, n // cv)
    return Mesh(use, ("cv", "rays"))


def batch_pspecs(keys) -> dict:
    """Per-leaf PartitionSpecs for a model batch (by key name).

    Ray-indexed leaves (``ray_idx_*``, ``rgb_*``, ``msk_*``: shape (B, N, ...))
    shard over (data, rays); image/camera leaves shard over data only;
    static tables (``combos``) replicate.
    """
    out = {}
    for k in keys:
        if k.startswith(("ray_idx_", "rgb_", "msk_")):
            out[k] = P("data", "rays")
        elif k == "combos":
            out[k] = P()
        else:
            out[k] = P("data")
    return out


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf NamedShardings for a model batch (batch_pspecs rules)."""
    specs = batch_pspecs(batch.keys())
    return {k: NamedSharding(mesh, specs[k]) for k in batch}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put every leaf with its sharding rule."""
    shardings = batch_shardings(mesh, batch)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
