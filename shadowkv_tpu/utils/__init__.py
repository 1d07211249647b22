from shadowkv_tpu.utils.profiling import (  # noqa: F401
    device_memory_stats,
    time_fn,
    trace,
)
