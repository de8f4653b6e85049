"""Converged-model quality validation: this framework vs the PyTorch
reference, trained to convergence on identical data.

Answers the "does the rebuild actually LEARN as well as the reference"
question that weight-parity-at-init tests cannot: both frameworks train
the same tiny Tacotron2NV config with the same optimizer settings and
the same batch schedule on a structured synthetic text→mel task, then
report held-out teacher-forced loss and MCD.  Finally the JAX-trained
checkpoint is exported to a torch state_dict and evaluated INSIDE the
reference model to prove checkpoint round-trip fidelity at the quality
level (reference entry points being reproduced: msa_tts/baseline.py:177
training loop, msa_tts/utils/metrics.py:15 MCD).

Run:  python benchmarks/quality_convergence.py [--steps 400]
Prints one JSON line per row and a markdown table at the end.
CPU-only by design (the reference is torch-CPU here); ~5 min.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import optax  # noqa: E402

from msa_tts_tpu.models import (  # noqa: E402
    config_from_params,
    init_tacotron2nv,
    tacotron2nv_forward,
)
from msa_tts_tpu.models.loss import tacotron2_loss  # noqa: E402
from msa_tts_tpu.ops.metrics import mcd_batch_np  # noqa: E402
from msa_tts_tpu.utils.torch_import import (  # noqa: E402
    pytrees_to_state_dict,
)

MODEL_PARAMS = {
    # False: all utterances in this benchmark are full-length, so output
    # masking is a numeric no-op — and the reference's in-place
    # masked_fill_ (tacotron2nv.py:75) breaks autograd on current torch.
    "mask_padding": False,
    "n_mel_channels": 10,
    "n_frames_per_step": 1,
    "n_symbols": 50,
    "symbols_embedding_dim": 16,
    "encoder_n_convolutions": 2,
    "encoder_embedding_dim": 16,
    "encoder_kernel_size": 5,
    "speaker_emb_type": "static",
    "num_speakers": 4,
    "speaker_embedding_dim": 6,
    "speaker_embedding_dim_lin": 4,
    "attention_rnn_dim": 24,
    "decoder_rnn_dim": 24,
    "prenet_dim": 12,
    "max_decoder_steps": 25,
    "gate_threshold": 0.5,
    "p_attention_dropout": 0.1,
    "p_decoder_dropout": 0.1,
    "decoder_no_early_stopping": False,
    "postnet_embedding_dim": 16,
    "postnet_kernel_size": 5,
    "postnet_n_convolutions": 3,
    "use_residual_encoder": False,
    "freeze_charemb": False,
    "freeze_encoder": False,
    "freeze_decoder": False,
    "attention_params": {
        "attention_type": "ForwardAttention",
        "attention_dim": 16,
        "attention_location_n_filters": 8,
        "attention_location_kernel_size": 15,
        "windowing": False,
        "norm": "softmax",
        "forward_attn": True,
        "trans_agent": True,
        "forward_attn_mask": False,
    },
}

T_IN, T_MEL = 12, 24
N_TRAIN, N_EVAL, BATCH = 48, 16, 8
LR, CLIP = 1e-3, 1.0


def make_data(seed: int = 0):
    """Structured text→mel task: each token has a fixed mel signature;
    frames follow the (time-stretched) token sequence plus mild noise.
    Learnable by both frameworks, not memorizable noise."""
    rng = np.random.default_rng(seed)
    n_sym = MODEL_PARAMS["n_symbols"]
    n_mel = MODEL_PARAMS["n_mel_channels"]
    token_sig = rng.standard_normal((n_sym, n_mel)).astype(np.float32)

    def build(n, seed2):
        r = np.random.default_rng(seed2)
        inputs = r.integers(1, n_sym, (n, T_IN)).astype(np.int32)
        pos = (np.arange(T_MEL) * T_IN / T_MEL).astype(np.int32)
        mels = token_sig[inputs[:, pos]]  # (n, T_MEL, n_mel)
        # light temporal smoothing + per-utterance noise
        mels = 0.5 * mels + 0.25 * np.roll(mels, 1, axis=1) \
            + 0.25 * np.roll(mels, -1, axis=1)
        mels += 0.05 * r.standard_normal(mels.shape).astype(np.float32)
        mels = np.swapaxes(mels, 1, 2).astype(np.float32)  # (n, n_mel, T)
        spk = r.standard_normal(
            (n, MODEL_PARAMS["speaker_embedding_dim"])
        ).astype(np.float32)
        stop = np.zeros((n, T_MEL), np.float32)
        stop[:, -1] = 1.0
        in_len = np.full((n,), T_IN, np.int32)
        mel_len = np.full((n,), T_MEL, np.int32)
        return dict(inputs=inputs, in_len=in_len, mels=mels,
                    mel_len=mel_len, spk=spk, stop=stop)

    return build(N_TRAIN, 1), build(N_EVAL, 2)


def batch_schedule(n_steps: int, seed: int = 3):
    """Identical batch order for both frameworks."""
    r = np.random.default_rng(seed)
    order = []
    while len(order) < n_steps * BATCH:
        order.extend(r.permutation(N_TRAIN).tolist())
    idx = np.asarray(order)
    return [
        idx[i * BATCH:(i + 1) * BATCH] for i in range(n_steps)
    ]


def subset(d, idx):
    return {k: v[idx] for k, v in d.items()}


# --------------------------------------------------------------- JAX side
def train_jax(train, schedule, seed: int = 0):
    cfg = config_from_params(dict(MODEL_PARAMS))
    params, state = init_tacotron2nv(jax.random.PRNGKey(seed), cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(CLIP), optax.adam(LR)
    )
    opt_state = tx.init(params)

    def loss_fn(p, s, batch, rng):
        outs, new_s = tacotron2nv_forward(
            p, s, cfg, batch["inputs"], batch["in_len"], batch["mels"],
            batch["mel_len"], batch["spk"], rng, train=True,
        )
        loss = tacotron2_loss(
            tuple(outs), (batch["mels"], batch["stop"]), batch["mel_len"],
            n_frames_per_step=MODEL_PARAMS["n_frames_per_step"],
            reduction="none", pos_weight=1.0,
        )
        return loss, new_s

    @jax.jit
    def step(p, s, o, batch, rng):
        (loss, new_s), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, s, batch, rng)
        updates, new_o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, new_o, loss

    rng = jax.random.PRNGKey(seed + 100)
    for i, idx in enumerate(schedule):
        rng, k = jax.random.split(rng)
        params, state, opt_state, loss = step(
            params, state, opt_state, subset(train, idx), k
        )
    return cfg, params, state, float(loss)


def eval_jax(cfg, params, state, data):
    eval_cfg = config_from_params(
        dict(MODEL_PARAMS, p_prenet_dropout=0.0)
    )
    outs, _ = tacotron2nv_forward(
        params, state, eval_cfg, data["inputs"], data["in_len"],
        data["mels"], data["mel_len"], data["spk"],
        jax.random.PRNGKey(0), train=False,
    )
    loss = float(tacotron2_loss(
        tuple(outs), (data["mels"], data["stop"]), data["mel_len"],
        n_frames_per_step=MODEL_PARAMS["n_frames_per_step"],
        reduction="none", pos_weight=1.0,
    ))
    mcd = float(mcd_batch_np(
        np.swapaxes(np.asarray(outs[1]), 1, 2),
        np.swapaxes(data["mels"], 1, 2),
        data["mel_len"],
    ))
    return loss, mcd


# ------------------------------------------------------------- torch side

def _patch_reference_gate_repeat(model, r=None):
    """The reference drops NVIDIA-Tacotron2's gate repeat_interleave at
    n_frames_per_step>1 (msa_tts/models/modules_tacotron2nv/decoder.py:
    207-232 returns (B, T/r) gate energies against (B, T) stop labels,
    so its own r=2 training CRASHES in BCEWithLogits).  Apply the
    NVIDIA fix — repeat each decoder step's gate over its r frames, the
    same semantic our decoder.py:408 implements — so the reference can
    be trained/evaluated at r=2 for a matched comparison."""
    r = MODEL_PARAMS["n_frames_per_step"] if r is None else r
    if r == 1:
        return model
    dec = model.decoder
    orig = dec.parse_decoder_outputs

    def fixed(mel, gate, align):
        mel, gate, align = orig(mel, gate, align)
        return mel, gate.repeat_interleave(r, dim=1), align

    dec.parse_decoder_outputs = fixed
    return model


def train_torch(train, schedule, seed: int = 0):
    import torch
    from msa_tts.models.tacotron2nv import Tacotron2NV
    from msa_tts.models.modules_tacotron2nv.tacotron2nv_loss import (
        Tacotron2Loss,
    )

    torch.manual_seed(seed)
    torch.set_num_threads(4)
    model = _patch_reference_gate_repeat(Tacotron2NV(dict(MODEL_PARAMS)))
    model.train()
    criterion = Tacotron2Loss(
        MODEL_PARAMS["n_frames_per_step"], "none", 1.0,
        torch.device("cpu"),
    )
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    def tt(x, dtype=None):
        t = torch.from_numpy(np.asarray(x))
        return t.to(dtype) if dtype is not None else t

    loss = None
    for idx in schedule:
        b = subset(train, idx)
        opt.zero_grad()
        outs = model(
            tt(b["inputs"], torch.long), tt(b["in_len"], torch.long),
            tt(b["mels"]), tt(b["mel_len"], torch.long), tt(b["spk"]),
        )
        loss = criterion(
            outs, (tt(b["mels"]), tt(b["stop"])), tt(b["mel_len"])
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
    return model, float(loss.item())


def eval_torch(model, data):
    import torch
    from msa_tts.models.modules_tacotron2nv.tacotron2nv_loss import (
        Tacotron2Loss,
    )

    model.eval()
    criterion = Tacotron2Loss(
        MODEL_PARAMS["n_frames_per_step"], "none", 1.0,
        torch.device("cpu"),
    )
    orig_dropout = torch.nn.functional.dropout
    torch.nn.functional.dropout = lambda x, *a, **k: x  # prenet is always-on
    try:
        with torch.no_grad():
            outs = model(
                torch.from_numpy(data["inputs"]).long(),
                torch.from_numpy(data["in_len"]).long(),
                torch.from_numpy(data["mels"]),
                torch.from_numpy(data["mel_len"]).long(),
                torch.from_numpy(data["spk"]),
            )
            loss = criterion(
                outs,
                (torch.from_numpy(data["mels"]),
                 torch.from_numpy(data["stop"])),
                torch.from_numpy(data["mel_len"]),
            )
    finally:
        torch.nn.functional.dropout = orig_dropout
    model.train()
    mcd = float(mcd_batch_np(
        np.swapaxes(outs[1].numpy(), 1, 2),
        np.swapaxes(data["mels"], 1, 2),
        data["mel_len"],
    ))
    return float(loss.item()), mcd


def roundtrip_eval(cfg, params, state, data):
    """Export the JAX-trained weights to a torch state_dict, load them
    into the REFERENCE model, evaluate there."""
    import torch
    from msa_tts.models.tacotron2nv import Tacotron2NV

    sd = pytrees_to_state_dict(params, state, cfg)
    model = _patch_reference_gate_repeat(Tacotron2NV(dict(MODEL_PARAMS)))
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    )
    return eval_torch(model, data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--r", type=int, default=1,
                    help="reduction factor n_frames_per_step (the r=2 "
                         "throughput lever needs quality evidence — "
                         "BENCHMARKS.md)")
    ap.add_argument("--t_mel", type=int, default=None,
                    help="override the mel length (default 24); r must "
                         "divide it — r=5 needs e.g. 40, and a fair "
                         "r=4-vs-r=5 comparison runs BOTH at the same "
                         "t_mel (round-5 r-sweep quality column)")
    args = ap.parse_args()
    global T_MEL
    if args.t_mel:
        T_MEL = args.t_mel
    MODEL_PARAMS["n_frames_per_step"] = args.r
    assert T_MEL % args.r == 0, f"r={args.r} must divide t_mel={T_MEL}"

    train, eval_data = make_data()
    schedule = batch_schedule(args.steps)

    cfg, params, state, jax_train_loss = train_jax(train, schedule)
    jax_loss, jax_mcd = eval_jax(cfg, params, state, eval_data)
    print(json.dumps({"row": "jax_trained", "steps": args.steps,
                      "r": args.r,
                      "final_train_loss": round(jax_train_loss, 4),
                      "eval_loss": round(jax_loss, 4),
                      "eval_mcd": round(jax_mcd, 4)}))

    model, torch_train_loss = train_torch(train, schedule)
    t_loss, t_mcd = eval_torch(model, eval_data)
    print(json.dumps({"row": "torch_reference_trained",
                      "steps": args.steps, "r": args.r,
                      "final_train_loss": round(torch_train_loss, 4),
                      "eval_loss": round(t_loss, 4),
                      "eval_mcd": round(t_mcd, 4)}))

    rt_loss, rt_mcd = roundtrip_eval(cfg, params, state, eval_data)
    print(json.dumps({"row": "jax_ckpt_in_reference",
                      "eval_loss": round(rt_loss, 4),
                      "eval_mcd": round(rt_mcd, 4),
                      "delta_loss_vs_jax": round(rt_loss - jax_loss, 6),
                      "delta_mcd_vs_jax": round(rt_mcd - jax_mcd, 6)}))

    print("\n| model | eval loss | eval MCD |")
    print("|---|---|---|")
    print(f"| this framework (jax), {args.steps} steps "
          f"| {jax_loss:.4f} | {jax_mcd:.4f} |")
    print(f"| reference (torch), {args.steps} steps "
          f"| {t_loss:.4f} | {t_mcd:.4f} |")
    print(f"| jax checkpoint evaluated in reference "
          f"| {rt_loss:.4f} | {rt_mcd:.4f} |")


if __name__ == "__main__":
    main()
