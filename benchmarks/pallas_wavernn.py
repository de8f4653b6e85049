"""Whole-loop Pallas WaveRNN kernel vs the XLA lax.scan — on-TPU
measurement behind the ``gen_backend`` default (vocoders/pallas_gen.py).

Two views:
  * raw sample-loop per-step cost across fold-batch sizes (the scan is
    weight-bandwidth bound; the kernel keeps the ~7.6 MB of bf16
    sample-loop weights VMEM-resident for the whole generation);
  * end-to-end WaveRNN.generate / generate_batch on a ~6 s utterance
    (includes upsampling, device-side fold, noise, crossfade unfold and
    the axon relay's ~27 ms/call dispatch+transfer floor).

Timing forces a device→host transfer per measurement (axon relay:
block_until_ready returns early).

Run on the TPU: python benchmarks/pallas_wavernn.py [--quick]
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

from msa_tts_tpu.vocoders.pallas_gen import (  # noqa: E402
    make_pallas_generate,
    split_generation_params,
)
from msa_tts_tpu.vocoders.wavernn import (  # noqa: E402
    WaveRNN,
    WaveRNNConfig,
    _generation_noise,
    _make_generate_scan,
    _mm,
    cast_generation_params,
    init_wavernn,
)

CFG = WaveRNNConfig()          # production dims: rnn 512, MOL, aux net
T_MEL = 517                    # (T_MEL-1)*256 = 132096 samples ≈ 6 s


def per_step_sweep(batches, T=1024):
    params, _ = init_wavernn(jax.random.PRNGKey(0), CFG)
    gen = cast_generation_params(params, jnp.bfloat16)
    w = split_generation_params(gen, CFG)
    run_xla = jax.jit(_make_generate_scan(CFG, with_noise=True))
    rows = []
    for B in batches:
        rng = jax.random.PRNGKey(1)
        mels_up = jax.random.normal(
            jax.random.fold_in(rng, 1), (B, T, CFG.n_mels)) * 0.3
        aux = jax.random.normal(
            jax.random.fold_in(rng, 2), (B, T, CFG.res_out_dims)) * 0.3
        n1, n2 = _generation_noise(CFG, jax.random.fold_in(rng, 3), T, B)
        d = CFG.aux_dims
        si = jnp.concatenate([mels_up, aux[:, :, :d]], axis=2)
        ist = jnp.swapaxes(
            _mm(si, gen["I"]["weight"][:, 1:]) + params["I"]["bias"], 0, 1
        )
        ar = jnp.swapaxes(aux[:, :, d:], 0, 1)

        def bench(f, *a, n=8):
            r = f(*a)
            np.asarray(r)
            t0 = time.time()
            for _ in range(n):
                r = f(*a)
            np.asarray(r)
            return (time.time() - t0) / n / T * 1e6

        ux = bench(run_xla, gen, mels_up, aux, n1, n2)
        chunk = 8
        while chunk < 128 and chunk * 2 * B <= 12288:
            chunk *= 2
        if T % chunk:
            chunk = 8
        rp = jax.jit(make_pallas_generate(CFG, B, T, chunk=chunk))
        up = bench(rp, w, ist, ar, n1, n2)
        rows.append({"B": B, "xla_us_step": round(ux, 2),
                     "pallas_us_step": round(up, 2),
                     "speedup": round(ux / up, 2)})
        print(f"B={B:4d}  xla {ux:6.2f} us/step  pallas {up:6.2f}  "
              f"({ux / up:.2f}x)", flush=True)
    return rows


def end_to_end(n_timed=4):
    mel = np.random.RandomState(0).randn(80, T_MEL).astype(np.float32) * 0.5
    dur = (T_MEL - 1) * CFG.hop_length / CFG.sample_rate
    base = WaveRNN(cfg=CFG, rng=jax.random.PRNGKey(0))
    rows = []
    for backend in ("xla", "pallas"):
        voc = WaveRNN(params=base.params, state=base.state, cfg=CFG,
                      gen_backend=backend)

        def single():
            return voc.generate(
                mel, batched=True, target=2750, overlap=550,
                rng=jax.random.PRNGKey(1), verbose=False,
            )

        single()
        t0 = time.time()
        for _ in range(n_timed):
            single()
        dt = (time.time() - t0) / n_timed
        rows.append({"backend": backend, "workload": "single",
                     "ms": round(dt * 1e3, 1),
                     "x_realtime": round(dur / dt, 1)})
        print(f"{backend:6s} single: {dt * 1e3:7.1f} ms  "
              f"{dur / dt:6.1f}x realtime", flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    batches = (16, 48) if args.quick else (16, 48, 96, 160, 320)
    out = {
        "per_step": per_step_sweep(batches, T=512 if args.quick else 1024),
        "end_to_end": end_to_end(n_timed=2 if args.quick else 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
