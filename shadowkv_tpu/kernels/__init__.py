from shadowkv_tpu.kernels.reconstruct import sparse_refresh  # noqa: F401
