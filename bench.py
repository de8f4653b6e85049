"""Headline benchmark: meta-training throughput (teacher-forced mel
frames consumed per second) on the flagship Tacotron2NV model.

Workload: one second-order MAML outer step — K tasks × S shots, one
inner SGD step on the support set plus the query pass — on realistic
model dims (NVIDIA-Tacotron2-scale: 512 encoder, 1024 decoder RNNs,
80 mels).  Frames/step = K·S·T_mel·(n_inner + 1).

``python bench.py`` runs the JAX/TPU side and prints ONE json line
``{"metric", "value", "unit", "vs_baseline"}``.  The headline runs the
shipped default ``n_frames_per_step=2`` (quality-validated free ~1.9×,
BENCHMARKS.md r=2 section); ``--r1`` reproduces the r=1 row.
``python bench.py --measure-baseline [--r 2]`` measures the PyTorch-CPU
reference implementation (imported from /root/reference, sequential
per-task ``higher`` inner loops, the reference's own 4-thread cap) on
the *same workload* (same r) and stores it in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(HERE, "BASELINE_MEASURED.json")

# Matched workload (identical for both implementations).  K=8,S=16 is
# the round-5 headline shape: the r=2 K×S ladder (BENCHMARKS.md)
# showed the task axis K is the expensive dimension (each task is a
# vmapped weight/optimizer instance) while shots S scale almost like
# pure batch — 8×16 is 1.64× the old 8×8 knee at the SAME task count,
# and the meta_advantage quality protocol measured raising S at fixed
# K as quality-neutral-to-better (while cutting K measurably hurts
# adaptation — the throughput-optimal 2×64 shape is NOT the default
# for that reason).  `--k/--s` override it; the torch baseline is
# measured at the same shape (BASELINE_MEASURED.json, shape-keyed —
# sequential tasks, so its frames/s is nearly flat in K·S anyway).
K, S = 8, 16              # tasks × shots
T_IN, T_MEL = 96, 320     # phoneme / mel-frame lengths
N_INNER = 1
N_MELS = 80
FRAMES_PER_STEP = K * S * T_MEL * (N_INNER + 1)

# Tuned execution config (measured on TPU v5e; see git history):
# decoder scan unrolled 16x, bf16 compute with fp32 master
# weights/loss — 2.7x over the naive fp32 configuration.  Remat is off
# at the baseline shape (memory fits) and on for large meta-batches.
SCAN_UNROLL = 16
REMAT = False        # inner-step jax.checkpoint in make_maml_step —
                     # measured to INCREASE peak HBM here (stores the
                     # step twice); superseded by decoder scan_remat
SCAN_REMAT = False   # per-decoder-step remat: the real memory lever
BF16 = True


def set_workload(k: int, s: int, remat: bool | str | None = None) -> None:
    """Override the meta-batch shape (and optionally decoder-scan
    remat: False/True/"dots") — used by the CLI flags and the batch
    sweep."""
    global K, S, FRAMES_PER_STEP, SCAN_REMAT
    K, S = int(k), int(s)
    FRAMES_PER_STEP = K * S * T_MEL * (N_INNER + 1)
    if remat is not None:
        if remat not in (True, False, "dots"):
            # mirror decoder_forward's check: a typo like "dot" must not
            # silently coerce to full remat
            raise ValueError(
                f"remat must be True/False/'dots', got {remat!r}"
            )
        SCAN_REMAT = remat

MODEL_DIMS = dict(
    symbols_embedding_dim=512,
    encoder_n_convolutions=3,
    encoder_embedding_dim=512,
    encoder_kernel_size=5,
    n_frames_per_step=1,
    speaker_emb_type="static",
    speaker_embedding_dim=64,
    speaker_embedding_dim_lin=32,
    attention_rnn_dim=1024,
    decoder_rnn_dim=1024,
    prenet_dim=256,
    max_decoder_steps=1000,
    gate_threshold=0.5,
    p_attention_dropout=0.1,
    p_decoder_dropout=0.1,
    postnet_embedding_dim=512,
    postnet_kernel_size=5,
    postnet_n_convolutions=5,
    mask_padding=False,  # avoids reference in-place masked_fill_ breaking autograd
    use_residual_encoder=False,
)
ATTN = {
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
N_SYMBOLS = 129


def _episode_np(seed: int):
    rng = np.random.default_rng(seed)
    return dict(
        inputs=rng.integers(1, N_SYMBOLS, (K, S, T_IN)).astype(np.int32),
        input_lengths=np.full((K, S), T_IN, np.int32),
        melspecs=rng.standard_normal((K, S, N_MELS, T_MEL)).astype(
            np.float32
        ),
        melspec_lengths=np.full((K, S), T_MEL, np.int32),
        speaker_vecs=rng.standard_normal((K, S, 64)).astype(np.float32),
        stop_labels=np.concatenate(
            [np.zeros((K, S, T_MEL - 1), np.float32),
             np.ones((K, S, 1), np.float32)], axis=-1,
        ),
    )


# ---------------------------------------------------------------- JAX side

# TPU v5e (v5 lite) single-chip peak: ~197 TFLOP/s bf16, ~98.5 fp32.
V5E_PEAK_FLOPS = {"bf16": 197e12, "fp32": 98.5e12}


def _flops_per_step(jitted, *args) -> float | None:
    """XLA's own FLOP estimate for one compiled step (analytic ceiling
    for the MFU figure); None when the backend doesn't report it."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _model_cfg(r: int = 1):
    from msa_tts_tpu.models import config_from_params

    mp = dict(MODEL_DIMS)
    mp.update(
        n_symbols=N_SYMBOLS,
        n_mel_channels=N_MELS,
        num_speakers=1,
        n_frames_per_step=r,
        attention_params=dict(ATTN),
        decoder_no_early_stopping=False,
        scan_unroll=SCAN_UNROLL,
        scan_remat=SCAN_REMAT,
    )
    return config_from_params(mp)


def run_jax(n_steps: int = 4, r: int = 1, want_mfu: bool = False) -> dict:
    import jax
    import optax

    from msa_tts_tpu.meta.maml import make_maml_step
    from msa_tts_tpu.models import (
        init_tacotron2nv,
        tacotron2nv_forward,
    )
    from msa_tts_tpu.models.loss import tacotron2_loss
    from msa_tts_tpu.optim import TrainState

    import jax.numpy as jnp

    bf16 = BF16 and "--fp32" not in sys.argv
    cfg = _model_cfg(r)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, ms, batch, rng):
        if bf16:
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), p
            )
            batch = dict(
                batch,
                melspecs=batch["melspecs"].astype(jnp.bfloat16),
                speaker_vecs=batch["speaker_vecs"].astype(jnp.bfloat16),
            )
        outs, new_ms = tacotron2nv_forward(
            p, ms, cfg,
            batch["inputs"], batch["input_lengths"],
            batch["melspecs"], batch["melspec_lengths"],
            batch["speaker_vecs"], rng, train=True,
        )
        loss = tacotron2_loss(
            tuple(o.astype(jnp.float32) for o in outs),
            (batch["melspecs"].astype(jnp.float32), batch["stop_labels"]),
            batch["melspec_lengths"],
            reduction="none",
            pos_weight=1.0,
        )
        return loss, new_ms

    inner_tx = optax.sgd(1e-2)
    outer_tx = optax.adam(1e-3)
    step = make_maml_step(
        loss_fn, inner_tx, outer_tx, n_inner=N_INNER,
        second_order=True, clip_thresh=1.0, remat=REMAT,
    )
    step_jit = jax.jit(step, donate_argnums=(0,))

    tstate = TrainState(params, state, outer_tx.init(params), 0)
    # Episodes live on device (as a prefetching input pipeline would
    # keep them) — re-uploading ~64 MB per step over the tunnel would
    # otherwise dominate the measurement.
    support = jax.device_put(_episode_np(1))
    query = jax.device_put(_episode_np(2))

    # compile + warmup.  NOTE: timing forces a device→host transfer of
    # the loss each step — on the axon relay, block_until_ready returns
    # before execution completes, so only a transfer is a true sync.
    flops = (
        _flops_per_step(
            step_jit, tstate, support, query, jax.random.PRNGKey(0)
        )
        if want_mfu else None
    )

    t0 = time.time()
    tstate, metrics = step_jit(tstate, support, query, jax.random.PRNGKey(0))
    float(metrics.loss)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(n_steps):
        tstate, metrics = step_jit(
            tstate, support, query, jax.random.PRNGKey(i + 1)
        )
        float(metrics.loss)
    dt = (time.time() - t0) / n_steps
    out = {
        "sec_per_step": dt,
        "frames_per_sec": FRAMES_PER_STEP / dt,
        "compile_sec": compile_s,
        "loss": float(metrics.loss),
        "device": str(jax.devices()[0]),
    }
    if flops:
        peak = V5E_PEAK_FLOPS["bf16" if bf16 else "fp32"]
        out["flops_per_step"] = flops
        out["achieved_tflops"] = round(flops / dt / 1e12, 2)
        out["mfu_vs_v5e_peak"] = round(flops / dt / peak, 4)
    return out


def run_jax_joint(n_steps: int = 6, r: int = 1) -> dict:
    """Joint-trainer throughput: one jitted supervised step (forward +
    grads + adam) at batch B = K·S on the same model dims.  ``r`` is
    n_frames_per_step — frames/step stays B·T_mel at any r (teacher
    forcing emits T_mel frames; the decoder scan runs T_mel/r steps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from msa_tts_tpu.models import init_tacotron2nv, tacotron2nv_forward
    from msa_tts_tpu.models.loss import tacotron2_loss
    from msa_tts_tpu.optim import TrainState

    bf16 = BF16 and "--fp32" not in sys.argv
    cfg = _model_cfg(r)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))

    def loss_fn(p, ms, batch, rng):
        if bf16:
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), p
            )
            batch = dict(
                batch,
                melspecs=batch["melspecs"].astype(jnp.bfloat16),
                speaker_vecs=batch["speaker_vecs"].astype(jnp.bfloat16),
            )
        outs, new_ms = tacotron2nv_forward(
            p, ms, cfg,
            batch["inputs"], batch["input_lengths"],
            batch["melspecs"], batch["melspec_lengths"],
            batch["speaker_vecs"], rng, train=True,
        )
        loss = tacotron2_loss(
            tuple(o.astype(jnp.float32) for o in outs),
            (batch["melspecs"].astype(jnp.float32), batch["stop_labels"]),
            batch["melspec_lengths"],
            reduction="none", pos_weight=1.0,
        )
        return loss, new_ms

    def step(tstate, batch, rng):
        def lf(p):
            return loss_fn(p, tstate.model_state, batch, rng)

        (loss, new_ms), grads = jax.value_and_grad(lf, has_aux=True)(
            tstate.params
        )
        updates, new_opt = tx.update(grads, tstate.opt_state, tstate.params)
        new_params = optax.apply_updates(tstate.params, updates)
        return (
            TrainState(new_params, new_ms, new_opt, tstate.step + 1),
            loss,
        )

    step_jit = jax.jit(step, donate_argnums=(0,))
    ep = _episode_np(1)
    B = K * S
    batch = jax.device_put({
        k: v.reshape((B,) + v.shape[2:]) for k, v in ep.items()
    })
    tstate = TrainState(params, state, tx.init(params), 0)

    t0 = time.time()
    tstate, loss = step_jit(tstate, batch, jax.random.PRNGKey(0))
    float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_steps):
        tstate, loss = step_jit(tstate, batch, jax.random.PRNGKey(i + 1))
        float(loss)
    dt = (time.time() - t0) / n_steps
    frames = B * T_MEL
    return {
        "sec_per_step": dt,
        "frames_per_sec": frames / dt,
        "compile_sec": compile_s,
        "loss": float(loss),
    }


def recompile_audit(n_utts: int = 512, seed: int = 0) -> dict:
    """Bucketing study, host-side: how many DISTINCT padded shapes (→
    XLA recompiles) does a realistic utterance-length distribution
    produce under the dataloader's pad-to-multiple policy?  Lengths are
    drawn from an LJSpeech-like log-normal (mean ~6.5 s, σ ~0.45) with
    proportional text lengths."""
    rng = np.random.default_rng(seed)
    dur = np.clip(rng.lognormal(np.log(6.0), 0.45, n_utts), 1.0, 14.0)
    t_mel = (dur * 22050 / 256).astype(int)          # hop 256
    t_in = np.maximum((t_mel * 0.28).astype(int), 8)  # ~phonemes/frame

    def shapes(text_mult, mel_mult):
        pad = lambda x, m: (x + m - 1) // m * m
        return {
            (int(pad(a, text_mult)), int(pad(b, mel_mult)))
            for a, b in zip(t_in, t_mel)
        }

    policies = {
        "no_padding": (1, 1),
        "default (16, 32)": (16, 32),
        "coarse (32, 128)": (32, 128),
        "pow2-ish (64, 256)": (64, 256),
    }
    out = {}
    for name, (tm, mm) in policies.items():
        s = shapes(tm, mm)
        out[name] = {
            "distinct_shapes": len(s),
            "mean_mel_pad_overhead": round(
                float(np.mean([
                    ((t + mm - 1) // mm * mm) / t - 1.0 for t in t_mel
                ])), 4,
            ),
        }
    return {"n_utterances": n_utts, "policies": out}


# -------------------------------------------------------------- torch side

def run_torch_reference(n_steps: int = 2, r: int = 1) -> dict:
    """Measure the reference implementation (PyTorch CPU, sequential
    per-task higher inner loops — msa_tts/maml.py:33-105).

    ``r`` (n_frames_per_step): the reference's own r>1 path has two
    latent bugs its r=1 configs never hit, shimmed here for a matched
    r=2 measurement: (a) it drops NVIDIA's gate repeat_interleave (its
    BCE crashes on (B,T/r) gates vs (B,T) stop labels — same fix as
    benchmarks/quality_convergence.py:_patch_reference_gate_repeat);
    (b) parse_decoder_inputs (decoder.py:200) calls ``view`` on the
    transposed, non-contiguous mel — a no-op reshape at r=1 but a real
    one at r=2, so it raises on our (B, M, T)-contiguous batch; the
    shim substitutes the same math via ``contiguous().view``."""
    sys.path.insert(0, "/root/reference")
    import torch

    torch.set_num_threads(4)  # the reference pins BLAS/OMP to 4 threads
    from msa_tts.models.tacotron2nv import Tacotron2NV
    from msa_tts.models.modules_tacotron2nv.tacotron2nv_loss import (
        Tacotron2Loss,
    )

    try:
        import higher
    except ImportError:
        higher = None

    mp = dict(MODEL_DIMS)
    mp.update(
        n_symbols=N_SYMBOLS,
        n_mel_channels=N_MELS,
        num_speakers=1,
        n_frames_per_step=r,
        attention_params=dict(ATTN),
        decoder_no_early_stopping=False,
        freeze_charemb=False,
        freeze_encoder=False,
        freeze_decoder=False,
    )
    model = Tacotron2NV(mp)
    if r > 1:
        dec = model.decoder
        orig_parse = dec.parse_decoder_outputs

        def _fixed(mel, gate, align):
            mel, gate, align = orig_parse(mel, gate, align)
            return mel, gate.repeat_interleave(r, dim=1), align

        dec.parse_decoder_outputs = _fixed

        def _fixed_inputs(decoder_inputs):
            # (B, M, T) -> (T/r, B, M*r); reference decoder.py:189-205
            # semantics with the non-contiguous ``view`` made legal.
            x = decoder_inputs.transpose(1, 2).contiguous()
            x = x.view(x.size(0), x.size(1) // r, -1)
            return x.transpose(0, 1)

        dec.parse_decoder_inputs = _fixed_inputs
    model.train()
    criterion = Tacotron2Loss(
        n_frames_per_step=r, reduction="none", pos_weight=1.0,
        device=torch.device("cpu"),
    )
    inner_opt = torch.optim.SGD(model.parameters(), lr=1e-2)
    outer_opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    ep_s = _episode_np(1)
    ep_q = _episode_np(2)

    def task_tensors(ep, k):
        return (
            torch.from_numpy(ep["inputs"][k]).long(),
            torch.from_numpy(ep["input_lengths"][k]).long(),
            torch.from_numpy(ep["melspecs"][k]),
            torch.from_numpy(ep["melspec_lengths"][k]).long(),
            torch.from_numpy(ep["speaker_vecs"][k]),
            torch.from_numpy(ep["stop_labels"][k]),
        )

    def one_outer_step():
        grad_list = []
        for k in range(K):
            inp, il, mel, ml, spk, stop = task_tensors(ep_s, k)
            inp_q, il_q, mel_q, ml_q, spk_q, stop_q = task_tensors(ep_q, k)
            if higher is not None:
                with higher.innerloop_ctx(
                    model, inner_opt, track_higher_grads=True
                ) as (fmodel, diffopt):
                    for _ in range(N_INNER):
                        outs = fmodel(inp, il, mel, ml, spk)
                        loss = criterion(tuple(outs), (mel, stop), ml)
                        diffopt.step(loss)
                    outs = fmodel(inp_q, il_q, mel_q, ml_q, spk_q)
                    loss_q = criterion(
                        tuple(outs), (mel_q, stop_q), ml_q
                    )
                    grads = torch.autograd.grad(
                        loss_q, fmodel.parameters(time=0),
                        allow_unused=True,
                    )
            else:
                # No `higher` in env: measure the FOMAML-equivalent
                # support pass + query pass + backward (a LOWER bound on
                # the reference's 2nd-order cost).
                outs = model(inp, il, mel, ml, spk)
                loss = criterion(tuple(outs), (mel, stop), ml)
                loss.backward()
                outs = model(inp_q, il_q, mel_q, ml_q, spk_q)
                loss_q = criterion(tuple(outs), (mel_q, stop_q), ml_q)
                loss_q.backward()
                grads = [p.grad for p in model.parameters()]
            grad_list.append(grads)
        outer_opt.zero_grad()
        for p, *gs in zip(model.parameters(), *grad_list):
            valid = [g for g in gs if g is not None]
            if valid:
                p.grad = sum(valid) / len(grad_list)
        outer_opt.step()
        return float(loss_q.item())

    one_outer_step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        loss = one_outer_step()
    dt = (time.time() - t0) / n_steps
    return {
        "sec_per_step": dt,
        "frames_per_sec": FRAMES_PER_STEP / dt,
        "loss": loss,
        "threads": 4,
        "higher_available": higher is not None,
        "workload": {
            "K": K, "S": S, "T_in": T_IN, "T_mel": T_MEL, "r": r,
            "n_inner": N_INNER, "frames_per_step": FRAMES_PER_STEP,
        },
    }


def _flag_value(name: str):
    if name in sys.argv:
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            raise SystemExit(f"usage: {name} <value>")
        return sys.argv[i + 1]
    return None


def _device_reachable(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard deadline: a
    wedged device relay hangs any in-process jax call indefinitely
    (observed mid-round-3: a crashed remote compile took the axon
    tunnel down), and a bench that hangs is worse than a bench that
    reports the outage."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "np.asarray(jax.jit(lambda x: x * 2)(jax.numpy.ones((8, 8))));"
        "print('ok')"
    )
    # Retry (with a longer deadline) ONLY after a timeout — that is the
    # host-contention case the retry exists for.  A fast non-ok exit is
    # a real device/runtime error a longer deadline can't fix: report it
    # and bail immediately instead of doubling the blocking time.
    for deadline in (timeout_s, timeout_s * 2):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, timeout=deadline,
            )
            if b"ok" in r.stdout:
                return True
            sys.stderr.write(
                "[bench] device probe failed (rc=%s):\n%s\n"
                % (r.returncode, r.stderr.decode(errors="replace")[-2000:])
            )
            return False
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    # --measure-baseline is a pure torch-CPU measurement: it must keep
    # working during exactly the accelerator outage the probe exists for
    if "--measure-baseline" not in sys.argv and not _device_reachable():
        print(json.dumps({
            "metric": "meta_train_mel_frames_per_sec",
            "value": None,
            "unit": "frames/s",
            "error": "accelerator unreachable (device probe timed out)",
        }))
        sys.exit(1)

    enable_compilation_cache()
    k, s = _flag_value("--k"), _flag_value("--s")
    remat_flag = ("dots" if "--remat-dots" in sys.argv
                  else True if "--remat" in sys.argv else None)
    if k or s:
        set_workload(k or K, s or S, remat=remat_flag)
    elif remat_flag is not None:
        set_workload(K, S, remat=remat_flag)
    if "--recompile-audit" in sys.argv:
        print(json.dumps(recompile_audit(), indent=2))
        return
    if "--joint" in sys.argv:
        r_joint = int(_flag_value("--r") or 2)   # shipped default r=2
        result = run_jax_joint(r=r_joint)
        print(json.dumps({
            "metric": "joint_train_mel_frames_per_sec",
            "value": round(result["frames_per_sec"], 1),
            "unit": "frames/s",
            "r": r_joint,
            "sec_per_step": round(result["sec_per_step"], 4),
        }))
        return
    if "--mfu" in sys.argv:
        r_mfu = int(_flag_value("--r") or 2)   # shipped default r=2
        result = run_jax(r=r_mfu, want_mfu=True)
        print(json.dumps({
            "metric": "meta_train_mfu",
            "k": K, "s": S, "r": r_mfu, "scan_remat": SCAN_REMAT,
            "sec_per_step": round(result["sec_per_step"], 4),
            "compile_sec": round(result["compile_sec"], 1),
            "frames_per_sec": round(result["frames_per_sec"], 1),
            "flops_per_step": result.get("flops_per_step"),
            "achieved_tflops": result.get("achieved_tflops"),
            "mfu_vs_v5e_peak": result.get("mfu_vs_v5e_peak"),
        }))
        return
    if "--measure-baseline" in sys.argv:
        r_base = int(_flag_value("--r") or 1)
        result = run_torch_reference(r=r_base)
        data = {
            "description": (
                "Reference PyTorch-CPU MAML outer step on the "
                "matched workload, sequential tasks, 4 BLAS "
                "threads (reference limit_threads). `higher` "
                "not installed in this image: measured as "
                "support fwd+bwd + query fwd+bwd per task — a "
                "LOWER bound on the reference's second-order "
                "cost (conservative for speedup claims). "
                "measured = r=1; measured_r2 = n_frames_per_step=2 "
                "(the shipped default; reference shimmed with the "
                "NVIDIA gate-repeat fix its own r>1 path is missing)."
            ),
        }
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                prev = json.load(f)
            data.update(
                {k: v for k, v in prev.items() if k != "description"}
            )
        key = "measured" if r_base == 1 else f"measured_r{r_base}"
        if (K, S) != (8, 8):
            # shape-aware keys: the r-ladder history rows were measured
            # at the round-3/4 8×8 knee and stay under the bare keys
            key += f"_k{K}s{S}"
        data[key] = result
        with open(BASELINE_PATH, "w") as f:
            json.dump(data, f, indent=2)
        print(json.dumps(result))
        return

    # Headline runs the SHIPPED default config: n_frames_per_step=2
    # (quality-validated free 1.9x — benchmarks/quality_convergence.py
    # and meta_advantage.py at --r 2, BENCHMARKS.md).  --r1 reproduces
    # the old r=1 row; --r N measures any reduction factor (T_mel=320
    # must divide by it).  vs_baseline always compares the MATCHED
    # torch reference workload (same r), never across reduction factors.
    r_head = 1 if "--r1" in sys.argv else int(_flag_value("--r") or 2)
    if T_MEL % r_head:
        raise SystemExit(f"--r {r_head} does not divide T_mel={T_MEL}")
    result = run_jax(r=r_head)
    baseline_fps = None
    key = "measured" if r_head == 1 else f"measured_r{r_head}"
    if (K, S) != (8, 8):
        key += f"_k{K}s{S}"
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline_fps = json.load(f).get(key, {}).get(
                "frames_per_sec"
            )
    vs = (
        result["frames_per_sec"] / baseline_fps
        if baseline_fps
        else None
    )
    print(
        json.dumps(
            {
                "metric": "meta_train_mel_frames_per_sec",
                "value": round(result["frames_per_sec"], 1),
                "unit": "frames/s",
                "r": r_head,
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
