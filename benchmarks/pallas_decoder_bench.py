"""Whole-loop Pallas Tacotron decoder vs the XLA while-loop — on-TPU
measurement behind serving's ``decode_backend`` default
(models/pallas_decoder.py).

Measures the raw jitted decode (encoder conditioning precomputed) at
full reference dims across batch and weight dtype, plus the
serving-level single-utterance synthesize latency and streaming TTFA.

Timing forces a device→host transfer per measurement (axon relay:
block_until_ready returns early).

Run on the TPU: python benchmarks/pallas_decoder_bench.py [--quick]
"""

from __future__ import annotations

import argparse
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

from msa_tts_tpu.models.decoder import (  # noqa: E402
    DecoderConfig,
    decoder_infer,
    init_decoder,
)
from msa_tts_tpu.models.pallas_decoder import (  # noqa: E402
    fits_vmem,
    pallas_decoder_infer,
)

AP = {
    "attention_type": "ForwardAttention",
    "attention_dim": 128,
    "attention_location_n_filters": 32,
    "attention_location_kernel_size": 31,
    "windowing": False,
    "norm": "softmax",
    "forward_attn": True,
    "trans_agent": True,
    "forward_attn_mask": False,
}


def make_cfg(max_steps, r=2):
    return DecoderConfig(
        n_mel_channels=80, n_frames_per_step=r,
        encoder_embedding_dim=576, attention_rnn_dim=1024,
        decoder_rnn_dim=1024, prenet_dim=256,
        max_decoder_steps=max_steps, gate_threshold=0.5,
        p_attention_dropout=0.1, p_decoder_dropout=0.1,
        early_stopping=False,          # run to the cap: fixed step count
        attention_params=dict(AP),
    )


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def bench_decode(cfg, B, T_in, dtype, n_timed=4):
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    if dtype != jnp.float32:
        params = cast_tree(params, dtype)
    enc = (
        jax.random.normal(jax.random.PRNGKey(1), (B, T_in, 576)) * 0.3
    ).astype(dtype)
    lens = jnp.full((B,), T_in, jnp.int32)
    rng = jax.random.PRNGKey(2)

    run_x = jax.jit(
        lambda p, e: decoder_infer(p, cfg, e, lens, rng, training=False)
    )
    run_p = jax.jit(lambda p, e: pallas_decoder_infer(p, cfg, e, lens, rng))

    def timeit(f):
        r = f(params, enc)
        np.asarray(r[0])
        t0 = time.time()
        for _ in range(n_timed):
            r = f(params, enc)
        np.asarray(r[0])
        return (time.time() - t0) / n_timed

    tx = timeit(run_x)
    row = {
        "B": B, "dtype": str(jnp.dtype(dtype).name),
        "steps": cfg.max_decoder_steps,
        "xla_ms": round(tx * 1e3, 1),
        "xla_us_step": round(tx / cfg.max_decoder_steps * 1e6, 1),
    }
    if fits_vmem(cfg, B, T_in, dtype):
        tp = timeit(run_p)
        # decode parity at matched weights/noise
        mx = np.asarray(run_x(params, enc)[0])
        mp = np.asarray(run_p(params, enc)[0])
        row.update(
            pallas_ms=round(tp * 1e3, 1),
            pallas_us_step=round(tp / cfg.max_decoder_steps * 1e6, 1),
            speedup=round(tx / tp, 2),
            max_mel_diff=float(np.abs(mx - mp).max()),
        )
    else:
        row["pallas_ms"] = None   # VMEM gate routes this shape to XLA
    print(row, flush=True)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--r", type=int, default=2,
                    help="n_frames_per_step; decoder steps are divided "
                         "by r so every r emits the same audio length "
                         "(the shipped default is 2)")
    ap.add_argument("--batches", default="1,2,4,8,16",
                    help="comma-separated batch sizes to sweep")
    args = ap.parse_args(argv)
    steps = (200 if args.quick else 400) // args.r
    cfg = make_cfg(steps, args.r)
    rows = []
    for B in (int(b) for b in args.batches.split(",")):
        for dtype in (jnp.bfloat16, jnp.float32):
            rows.append(bench_decode(cfg, B, 192, dtype,
                                     n_timed=2 if args.quick else 4))
    print(json.dumps({"r": args.r, "decode": rows}))


if __name__ == "__main__":
    main()
