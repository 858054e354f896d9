"""Opt-in real-TPU stress suite (VERDICT r4 item 8): the round-4 one-off
stress harnesses promoted to gated tests, so every future round's TPU log
re-proves the at-scale claims instead of trusting a stale log:

  * SOP-scale device cache: 59,551-image uint8 train pool (~11.7 GB)
    resident next to CvT-13 + Adam, cached bs=112 steps OOM-free; separate
    60,480-image eval pool, one-program (auto-chunked) extraction + blocked
    exact top-k (scripts/stress_sop_cache.py; RESULTS.md r4).
  * MSLS val at city scale: 30k-db/3k-q im2im and 6k-db seq2seq recalls
    BIT-EXACT vs a host-loop oracle through the one-dispatch chunked device
    path (scripts/stress_msls_val.py; stress_msls_r4.log).

Run: RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_stress.py -s
(single-tenant chip — never run concurrently with other TPU work; the SOP
case pays the ~20 min bs=112 train-step compile).
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("RUN_TPU_TESTS"),
        reason="real-TPU stress test; set RUN_TPU_TESTS=1 (single-tenant chip)",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout):
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + ":" + REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    print(proc.stdout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout


def test_msls_val_stress_im2im():
    out = _run(
        "stress_msls_val.py", "--n_db", "30000", "--n_q", "3000",
        "--task", "im2im", timeout=2400,
    )
    assert "PARITY OK" in out


def test_msls_val_stress_seq2seq():
    out = _run(
        "stress_msls_val.py", "--n_db", "6000", "--n_q", "600",
        "--task", "seq2seq", "--seq_length", "3", timeout=2400,
    )
    assert "PARITY OK" in out


def test_sop_cache_stress():
    """Full SOP pool geometry, reduced step count (steady rate needs ~24
    steps; the epoch extrapolation is linear in steps)."""
    out = _run(
        "stress_sop_cache.py", "--steps", "24", timeout=4800,
    )
    assert "OOM" not in out.upper() or "OOM-free" in out
    assert "[hbm]" in out
