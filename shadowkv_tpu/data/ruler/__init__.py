from shadowkv_tpu.data.ruler.generate import (  # noqa: F401
    TASK_CONFIGS,
    generate_task,
)
