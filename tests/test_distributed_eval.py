"""Two-process data-parallel evaluation over jax.distributed (CPU).

Validates the reference's NCCL gather_object replacement
(test/evaluator.py:138-171 -> eval/evaluator.py::summarize): each
process contributes stats, rank 0 prints the sample-weighted merge.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address={addr!r}, num_processes=2, process_id=pid
    )
    from shadowkv_tpu.eval.evaluator import DistConfig, Evaluator
    dist = DistConfig(True, jax.process_index(), jax.process_count(),
                      jax.process_index() == 0)
    ev = Evaluator(dist)
    ev.all_stats.append(dict(model="m", dataset="d", samples=2 + pid,
                             setting="s", score=1.0 if pid == 0 else 0.5))
    table = ev.summarize()
    if dist.master_process:
        # weighted mean: (2*1.0 + 3*0.5) / 5 = 0.7
        assert table and "0.7" in table, table
        print("TABLE_OK")
""")


@pytest.mark.slow
def test_two_process_weighted_summary(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.format(repo=repo, addr=f"127.0.0.1:{port}")
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in (1, 0)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed eval workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert any("TABLE_OK" in out for _, out, _ in outs)
