"""BoostMVSNeRFs-TPU: a TPU-native (JAX/XLA/Pallas) framework for generalizable
novel view synthesis with multi cost-volume fusion.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch/CUDA implementation (Su-Terry/BoostMVSNeRFs):

* ENeRF backbone: cascade cost volumes + depth-guided sampling
  (reference: lib/networks/enerf/).
* MVSNeRF backbone: single padded cost volume + NDC NeRF MLP
  (reference: lib/networks/mvsnerf/).
* Boost recipe: per-target-view greedy selection of K source-view triplets,
  joint rendering of K cost volumes with visibility-weighted blending
  (reference: lib/networks/boost_enerf/network.py, boost_mvsnerf/network.py).

Design stance (TPU-first, not a port):
* channels-last layouts everywhere (NHWC / NDHWC) for XLA TPU convolutions,
* pure-functional forward passes under jit with static shapes,
* rays generated on device from camera matrices (the reference ships
  CPU-built ray tensors in the batch),
* multi-device scaling via jax.sharding.Mesh + shard_map (ray sharding,
  data parallelism) instead of NCCL DDP,
* Pallas kernels for the gather-heavy sampling hot loops.
"""

__version__ = "0.1.0"
