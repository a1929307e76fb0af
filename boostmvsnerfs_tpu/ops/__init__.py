from boostmvsnerfs_tpu.ops import geometry, sampling, cost_volume, render  # noqa: F401
