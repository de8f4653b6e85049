"""Pallas fused LSTM cell vs XLA — the win-or-retire measurement.

400-step scans at the decoder's shape (B=16, H=1024), four variants:
XLA and Pallas, each with fp32 and bf16 recurrent weights (bf16 halves
the per-step HBM weight traffic, which is the bandwidth floor; state
and accumulation stay f32 in all variants).

Timing forces a device→host transfer per measurement (axon relay:
block_until_ready returns early).

Run on the TPU: python benchmarks/pallas_lstm.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msa_tts_tpu.experimental.pallas_lstm_cell import (  # noqa: E402
    fused_lstm_cell,
    lstm_cell_reference,
)

B, H, T = 16, 1024, 400


def make_scan(cell):
    def run(x_projs, h, c, w):
        def step(carry, x_t):
            hh, cc = cell(x_t, carry[0], carry[1], w)
            return (hh, cc), hh[:, :1]

        (h, c), outs = jax.lax.scan(step, (h, c), x_projs)
        return h, outs

    return jax.jit(run)


def bench(name, cell, w_dtype, n_timed=5):
    rng = np.random.default_rng(0)
    x_projs = jnp.asarray(
        rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.1
    )
    h = jnp.zeros((B, H), jnp.float32)
    c = jnp.zeros((B, H), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.02,
        dtype=w_dtype,
    )
    run = make_scan(cell)
    out = run(x_projs, h, c, w)
    np.asarray(out[0])  # compile + sync
    times = []
    for _ in range(n_timed):
        t0 = time.time()
        out = run(x_projs, h, c, w)
        np.asarray(out[0])
        times.append(time.time() - t0)
    us_per_step = min(times) / T * 1e6
    row = {"variant": name, "w_dtype": str(np.dtype(w_dtype)),
           "us_per_step": round(us_per_step, 1),
           "h_checksum": round(float(np.asarray(out[0]).sum()), 3)}
    print(json.dumps(row))
    return row


def main():
    rows = [
        bench("xla", lstm_cell_reference, jnp.float32),
        bench("xla", lstm_cell_reference, jnp.bfloat16),
        bench("pallas", fused_lstm_cell, jnp.float32),
        bench("pallas", fused_lstm_cell, jnp.bfloat16),
    ]
    best = min(rows, key=lambda r: r["us_per_step"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
