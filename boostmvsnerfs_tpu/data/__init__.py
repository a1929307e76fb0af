from boostmvsnerfs_tpu.data.registry import make_dataset  # noqa: F401
