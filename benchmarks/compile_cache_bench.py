"""Cold vs warm compile time with the persistent XLA cache.

The bucketed serving/training shapes compile to dozens of distinct XLA
programs (BENCHMARKS.md "recompile audit"); `utils/compile_cache` wires
`jax_compilation_cache_dir` into every entry point so that tax is paid
once per machine.  This measures exactly that tax: AOT-compile
(`jit(...).lower().compile()`, no execution — execution time and relay
variance would otherwise drown the signal) the serving decode program
at several (batch, text-bucket) shapes in a fresh process twice against
one cache directory.  The first process compiles; the second loads
executables from disk.

Run:  python benchmarks/compile_cache_bench.py            # both phases
      python benchmarks/compile_cache_bench.py --phase cold --cache DIR
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# (B, padded text length) buckets a serving deployment compiles
SHAPES = ((1, 32), (2, 32), (4, 48), (8, 64))


def run_phase(cache_dir: str) -> list[dict]:
    os.environ["MSA_COMPILATION_CACHE_DIR"] = cache_dir

    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from serving_http import build_tts
    from msa_tts_tpu.models.tacotron2nv import tacotron2nv_infer

    tts = build_tts(400)
    cfg = tts.cfg
    params, state = tts.model_params, tts.model_state
    emb_dim = tts.params["model"]["speaker_embedding_dim"]

    rows = []
    for B, T in SHAPES:
        inputs = jnp.asarray(np.ones((B, T), np.int32))
        in_len = jnp.full((B,), T, jnp.int32)
        sv = jnp.zeros((B, emb_dim), jnp.float32)
        rng = jax.random.PRNGKey(0)

        def f(p, s, i, il, v, k):
            return tacotron2nv_infer(p, s, cfg, i, il, v, k)

        t0 = time.time()
        jax.jit(f).lower(params, state, inputs, in_len, sv, rng).compile()
        dt = time.time() - t0
        rows.append({"B": B, "T": T, "compile_s": round(dt, 2)})
        print(rows[-1], flush=True)

    # one full train step (forward + grads + adam) at a training bucket
    # — the shape class behind the ~30 s-per-bucket first-epoch tax
    import optax

    from msa_tts_tpu.models.tacotron2nv import tacotron2nv_forward
    from msa_tts_tpu.models.loss import tacotron2_loss

    B, Tt, Tm = 16, 64, 256
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)
    batch = dict(
        inputs=jnp.ones((B, Tt), jnp.int32),
        input_lengths=jnp.full((B,), Tt, jnp.int32),
        melspecs=jnp.zeros((B, cfg.n_mel_channels, Tm), jnp.float32),
        melspec_lengths=jnp.full((B,), Tm, jnp.int32),
        stop_labels=jnp.zeros((B, Tm), jnp.float32),
        speaker_vecs=jnp.zeros((B, emb_dim), jnp.float32),
    )

    def train_step(p, s, opt, batch, rng):
        def lf(p):
            outs, new_s = tacotron2nv_forward(
                p, s, cfg, batch["inputs"], batch["input_lengths"],
                batch["melspecs"], batch["melspec_lengths"],
                batch["speaker_vecs"], rng, train=True,
            )
            loss = tacotron2_loss(
                outs, (batch["melspecs"], batch["stop_labels"]),
                batch["melspec_lengths"], reduction="none",
                pos_weight=1.0,
            )
            return loss, new_s

        (loss, new_s), grads = jax.value_and_grad(lf, has_aux=True)(p)
        upd, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, upd), new_s, new_opt, loss

    t0 = time.time()
    jax.jit(train_step).lower(
        params, state, opt0, batch, jax.random.PRNGKey(0)
    ).compile()
    dt = time.time() - t0
    rows.append({"B": B, "T": f"train {Tt}/{Tm}",
                 "compile_s": round(dt, 2)})
    print(rows[-1], flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["cold", "warm"])
    ap.add_argument("--cache")
    args = ap.parse_args(argv)

    if args.phase:
        rows = run_phase(args.cache)
        print(json.dumps({"phase": args.phase, "rows": rows}))
        return

    cache = tempfile.mkdtemp(prefix="xla_cache_bench_")
    out_rows = {}
    for phase in ("cold", "warm"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--cache", cache],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        row = json.loads(
            [ln for ln in out.stdout.splitlines()
             if ln.startswith('{"phase"')][-1]
        )
        out_rows[phase] = row["rows"]
        tot = sum(r["compile_s"] for r in row["rows"])
        print(f"{phase}: {row['rows']}  total {tot:.1f} s", flush=True)
    cold = sum(r["compile_s"] for r in out_rows["cold"])
    warm = sum(r["compile_s"] for r in out_rows["warm"])
    print(json.dumps({
        "shapes": len(SHAPES) + 1,   # + the train-step shape
        "cold_total_s": round(cold, 1),
        "warm_total_s": round(warm, 1),
        "speedup": round(cold / warm, 1),
    }))


if __name__ == "__main__":
    main()
