from shadowkv_tpu.eval.evaluator import DistConfig, Evaluator, init_dist  # noqa: F401
