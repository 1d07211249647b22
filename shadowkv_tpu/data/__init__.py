from shadowkv_tpu.data.dataset import Dataset  # noqa: F401
from shadowkv_tpu.data.metrics import (  # noqa: F401
    METRICS_FN,
    gen_len_for,
    metric_for,
)
