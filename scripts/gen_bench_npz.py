"""Regenerate a bench-shape params.npz with SYNTHETIC weights.

checkpoints/ is gitignored, so a fresh checkout has no snapshot for
BENCH_WEIGHTS runs. Speed-only experiments (e.g. the 60K b8 wq8disk
knee test, `bench_60k_b8_wq8disk_r5b`) don't need trained weights —
only the disk-load int8 path (`load_params_npz(weight_quant='int8')`,
no in-loader bf16 copy). Trained weights for the organic-locality
benches come from scripts/train_bench_weights.py instead (~10 min on
the chip).

CPU-only; run from anywhere: python scripts/gen_bench_npz.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax.numpy as jnp  # noqa: E402

from shadowkv_tpu.models.params import (  # noqa: E402
    init_synthetic_params_host,
    save_params_npz,
)
from shadowkv_tpu.models.registry import toy_config  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/bench1p4b_syn"
    # The bench's exact 1.4B llama shape (bench.py cfg_kw).
    cfg = toy_config(
        name="sbench-1.4b-llama", num_layers=16, hidden_size=2048,
        num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=5632, vocab_size=32768, rope_theta=500000.0,
        dtype=jnp.bfloat16,
    )
    params = init_synthetic_params_host(cfg)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "params.npz")
    save_params_npz(params, path)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
