"""On-chip recall + per-call latency grid for the landmark top-k
variants (VERDICT r3 #2 follow-through: exact costs 5.9 ms/step at the
headline config, bench_xla_exact_r4; stock approx gives back 3.5; the
deeper overrides break the 0.95 recall bar — find the measured point
that keeps >=0.95 at BOTH bench scales with the least sort time).

Grid: C in {7672, 15352} x variant in
  exact | stock | mult2 | mult4 | mult8 | ts4 (two-stage: stock deep
  reduce to 4S candidates + exact over them) | ts4m8 (two-stage with
  the mult8 deep reduction) | ts2m8
Prints one JSON line per cell: {"c", "variant", "recall", "ms"}.
Timing is the jitted score_and_select alone (the decode-program term
the variants change), batch/head shape = the bench's [4, 8] at Q=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from shadowkv_tpu.core import selection

    variants = [
        ("exact", dict(approx=False, mult=0, ts=0)),
        ("stock", dict(approx=True, mult=0, ts=0)),
        ("mult2", dict(approx=True, mult=2, ts=0)),
        ("mult4", dict(approx=True, mult=4, ts=0)),
        ("mult8", dict(approx=True, mult=8, ts=0)),
        ("ts4", dict(approx=True, mult=0, ts=4)),
        ("ts4m8", dict(approx=True, mult=8, ts=4)),
        ("ts2m8", dict(approx=True, mult=8, ts=2)),
    ]
    cs = [
        int(x)
        for x in os.environ.get("PROBE_TOPK_CS", "7672,15352").split(",")
    ]
    for c in cs:
        key = jax.random.PRNGKey(c)
        q = jax.random.normal(key, (4, 8, 2, 1, 128), jnp.bfloat16)
        lms = jax.random.normal(
            jax.random.fold_in(key, 1), (4, 8, c, 128), jnp.bfloat16
        )
        mask = jnp.ones((4, 8, c), jnp.bool_)
        exact_ids = None
        for name, kw in variants:
            selection.TOPK_OVERRIDE_MULT = kw["mult"]
            selection.TOPK_TWO_STAGE = kw["ts"]
            approx = kw["approx"]
            fn = jax.jit(
                lambda q, l, m, _a=approx:
                selection.score_and_select(q, l, m, 256, approx=_a)
            )

            # Device-side timing loop (a per-call dispatch through the
            # axon tunnel costs ~0.5 s — 100x the op). The carry's
            # tiny q-perturbation (<=1e-4) chains the iterations so
            # XLA cannot CSE them.
            @jax.jit
            def loop(q, l, m, _a=approx):
                def body(i, carry):
                    acc, qq = carry
                    ids = selection.score_and_select(
                        qq, l, m, 256, approx=_a
                    )
                    acc = acc + jnp.sum(ids)
                    qq = qq + (acc & 1).astype(qq.dtype) * qq.dtype.type(
                        1e-4
                    )
                    return acc, qq

                return jax.lax.fori_loop(
                    0, 40, body, (jnp.int32(0), q)
                )[0]

            out = fn(q, lms, mask)
            jax.block_until_ready(loop(q, lms, mask))
            t0 = time.time()
            jax.block_until_ready(loop(q, lms, mask))
            ms = (time.time() - t0) / 40 * 1e3
            ids = np.asarray(out)
            if name == "exact":
                exact_ids = ids
                recall = 1.0
            else:
                rec = []
                for b in range(ids.shape[0]):
                    for k in range(ids.shape[1]):
                        inter = np.intersect1d(
                            exact_ids[b, k], ids[b, k]
                        ).size
                        rec.append(inter / 256.0)
                recall = float(np.mean(rec))
            print(
                json.dumps(
                    {
                        "c": c, "variant": name,
                        "recall": round(recall, 4),
                        "ms": round(ms, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
