"""The few-shot meta-learning advantage, demonstrated end to end.

The reference framework exists to make k-shot adaptation to UNSEEN
speakers work (msa_tts/infer.py:266-281 few-shot finetune protocol,
msa_tts/maml.py:33-105 meta-training).  This benchmark shows that the
machinery pays off: a MAML/Reptile-meta-trained initialization adapts to
held-out speakers in a handful of gradient steps measurably better than
a joint-trained initialization given the SAME (or larger) training
budget.

Task design — speaker identity must matter, and must not be readable
from the conditioning input, or adaptation would have nothing to do:

  * every token has a fixed mel signature (as in
    quality_convergence.py);
  * every speaker applies a hidden per-channel affine transform
    ``mel = a_s * base + b_s`` to it (their "voice");
  * the speaker embedding fed to the model is a random vector
    UNCORRELATED with (a_s, b_s) — like a d-vector of a speaker the
    embedding table never saw.  The only route to a new speaker's voice
    is gradient adaptation on its k support utterances, which is
    exactly the reference's few-shot protocol.

Protocol:
  1. meta-train (MAML second-order, and Reptile) on 8 speakers;
  2. joint-train on the same 8 speakers' pooled data with the same
     number of outer steps AND a 4x-steps variant (so the baseline
     cannot be called undertrained);
  3. for each held-out speaker (4 of them), adapt each checkpoint
     k ∈ {0, 1, 5, 10} full-batch steps on S=4 support utterances
     (the framework's own `make_metatest_fn`), then report
     teacher-forced query loss and MCD, mean ± std over speakers;
  4. export the MAML and joint checkpoints to torch state_dicts, run
     the SAME adaptation protocol inside the reference's Tacotron2NV,
     and confirm the advantage survives the round trip.

Run:  python benchmarks/meta_advantage.py [--outer_steps 200]
Prints one JSON line per row and a markdown table.  CPU-only; the
model is tiny by design (this is a learning-dynamics experiment, not a
throughput bench).
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

from msa_tts_tpu.meta.maml import (  # noqa: E402
    make_maml_step,
    make_metatest_fn,
)
from msa_tts_tpu.meta.reptile import make_reptile_step  # noqa: E402
from msa_tts_tpu.models import (  # noqa: E402
    config_from_params,
    init_tacotron2nv,
    tacotron2nv_forward,
)
from msa_tts_tpu.models.loss import tacotron2_loss  # noqa: E402
from msa_tts_tpu.ops.metrics import mcd_batch_np  # noqa: E402
from msa_tts_tpu.optim import TrainState  # noqa: E402
from msa_tts_tpu.utils.torch_import import (  # noqa: E402
    pytrees_to_state_dict,
)

MODEL_PARAMS = {
    "mask_padding": False,  # all utterances full-length (see
    # quality_convergence.py for why the reference needs this off)
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
N_TRAIN_SPK, N_TEST_SPK = 8, 4
UTTS_PER_SPK = 24            # 16 support pool + 8 query
N_QUERY = 8
K_TASKS = 4                  # speakers per meta-batch
S_SHOTS = 4                  # support utterances per task
N_INNER_TRAIN = 3            # inner steps during meta-training
INNER_LR = 5e-2              # tuned: 4-shot full-batch inner steps
OUTER_LR = 1e-3              # examples/maml/params.yml optim_outer
EVAL_SHOTS = 4               # support utterances at meta-test
K_EVAL = (0, 1, 5, 10)


# ------------------------------------------------------------------ data
def build_corpus(seed: int = 0):
    """Returns (train_speakers, test_speakers): lists of per-speaker
    batch dicts with ``support``/``query`` splits."""
    rng = np.random.default_rng(seed)
    n_sym = MODEL_PARAMS["n_symbols"]
    n_mel = MODEL_PARAMS["n_mel_channels"]
    emb_dim = MODEL_PARAMS["speaker_embedding_dim"]
    token_sig = rng.standard_normal((n_sym, n_mel)).astype(np.float32)

    def one_speaker(spk_seed):
        r = np.random.default_rng(spk_seed)
        # the hidden voice: per-channel affine
        a = r.uniform(0.4, 1.6, n_mel).astype(np.float32)
        b = (0.6 * r.standard_normal(n_mel)).astype(np.float32)
        # the visible conditioning: uncorrelated with the voice
        emb = r.standard_normal(emb_dim).astype(np.float32)

        n = UTTS_PER_SPK
        inputs = r.integers(1, n_sym, (n, T_IN)).astype(np.int32)
        pos = (np.arange(T_MEL) * T_IN / T_MEL).astype(np.int32)
        base = token_sig[inputs[:, pos]]             # (n, T_MEL, n_mel)
        base = 0.5 * base + 0.25 * np.roll(base, 1, axis=1) \
            + 0.25 * np.roll(base, -1, axis=1)
        mels = a[None, None] * base + b[None, None]
        mels += 0.05 * r.standard_normal(mels.shape).astype(np.float32)
        mels = np.swapaxes(mels, 1, 2).astype(np.float32)
        stop = np.zeros((n, T_MEL), np.float32)
        stop[:, -1] = 1.0
        full = dict(
            inputs=inputs,
            in_len=np.full((n,), T_IN, np.int32),
            mels=mels,
            mel_len=np.full((n,), T_MEL, np.int32),
            spk=np.tile(emb, (n, 1)),
            stop=stop,
        )
        sup = {k: v[:-N_QUERY] for k, v in full.items()}
        qry = {k: v[-N_QUERY:] for k, v in full.items()}
        return {"support": sup, "query": qry}

    train = [one_speaker(1000 + i) for i in range(N_TRAIN_SPK)]
    test = [one_speaker(2000 + i) for i in range(N_TEST_SPK)]
    return train, test


def _stack_tasks(speakers, spk_ids, shot_idx, q_idx):
    """Stack K tasks' (support, query) into leading-axis-K dicts."""
    sup = {
        k: np.stack([speakers[s]["support"][k][shot_idx[j]]
                     for j, s in enumerate(spk_ids)])
        for k in speakers[0]["support"]
    }
    qry = {
        k: np.stack([speakers[s]["query"][k][q_idx[j]]
                     for j, s in enumerate(spk_ids)])
        for k in speakers[0]["query"]
    }
    return sup, qry


# ----------------------------------------------------------------- model
def make_loss_fn(cfg):
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

    return loss_fn


def meta_train(method: str, train_spk, outer_steps: int, seed: int = 0):
    cfg = config_from_params(dict(MODEL_PARAMS))
    params, state = init_tacotron2nv(jax.random.PRNGKey(seed), cfg)
    loss_fn = make_loss_fn(cfg)
    inner_tx = optax.sgd(INNER_LR)
    outer_tx = optax.adam(OUTER_LR)
    if method == "maml":
        step = make_maml_step(
            loss_fn, inner_tx, outer_tx, N_INNER_TRAIN,
            second_order=True, clip_thresh=1.0,
        )
    elif method == "reptile":
        # first-order: no grad flows through the inner scan, remat
        # would only slow the CPU run down
        step = make_reptile_step(
            loss_fn, inner_tx, outer_tx, N_INNER_TRAIN,
            mode="sequential", clip_thresh=1.0, remat=False,
        )
    else:
        raise ValueError(method)
    step = jax.jit(step)

    tstate = TrainState(
        params=params, model_state=state,
        opt_state=outer_tx.init(params), step=0,
    )
    r = np.random.default_rng(seed + 7)
    loss = float("nan")
    for i in range(outer_steps):
        spk_ids = r.choice(len(train_spk), K_TASKS, replace=False)
        shot_idx = [r.choice(UTTS_PER_SPK - N_QUERY, S_SHOTS,
                             replace=False) for _ in range(K_TASKS)]
        q_idx = [r.choice(N_QUERY, S_SHOTS, replace=False)
                 for _ in range(K_TASKS)]
        sup, qry = _stack_tasks(train_spk, spk_ids, shot_idx, q_idx)
        tstate, metrics = step(
            tstate, sup, qry, jax.random.PRNGKey(seed * 9973 + i)
        )
        loss = float(metrics.loss)
    return cfg, tstate, loss


def joint_train(train_spk, steps: int, seed: int = 0, batch: int = 16):
    """Strong baseline: pooled multi-speaker training, Adam, same data."""
    cfg = config_from_params(dict(MODEL_PARAMS))
    params, state = init_tacotron2nv(jax.random.PRNGKey(seed), cfg)
    loss_fn = make_loss_fn(cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(OUTER_LR))
    opt_state = tx.init(params)

    pool = {
        k: np.concatenate([s["support"][k] for s in train_spk])
        for k in train_spk[0]["support"]
    }
    n = pool["inputs"].shape[0]

    @jax.jit
    def step(p, s, o, b, rng):
        (loss, new_s), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, s, b, rng)
        updates, new_o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, new_o, loss

    r = np.random.default_rng(seed + 13)
    loss = float("nan")
    for i in range(steps):
        idx = r.choice(n, batch, replace=False)
        b = {k: v[idx] for k, v in pool.items()}
        params, state, opt_state, loss = step(
            params, state, opt_state, b, jax.random.PRNGKey(seed * 31 + i)
        )
    return cfg, TrainState(params, state, None, steps), float(loss)


# ------------------------------------------------------------ adaptation
_METATEST_CACHE: dict = {}


def _metatest_for(cfg, k: int):
    """One jitted metatest per (cfg, k), shared across every init being
    evaluated — the XLA program is identical, recompiling it per
    checkpoint would dominate the benchmark's runtime.  cfg must be part
    of the key: the jit closes over make_loss_fn(cfg), and two configs
    can produce identical array shapes (jax.jit would not retrace)."""
    key = (repr(cfg), k)  # cfg nests dicts → not hashable; repr is value-based
    if key not in _METATEST_CACHE:
        _METATEST_CACHE[key] = jax.jit(make_metatest_fn(
            make_loss_fn(cfg), optax.sgd(INNER_LR), k, remat=False
        ))
    return _METATEST_CACHE[key]


def adapt_eval(cfg, tstate, test_spk, k: int, seed: int = 0):
    """k-step adaptation on EVAL_SHOTS support utts, teacher-forced query
    loss + MCD; returns per-speaker arrays."""
    eval_cfg = config_from_params(dict(MODEL_PARAMS, p_prenet_dropout=0.0))

    if k > 0:
        metatest = _metatest_for(cfg, k)
    losses, mcds = [], []
    for si, spk in enumerate(test_spk):
        sup = {kk: v[:EVAL_SHOTS] for kk, v in spk["support"].items()}
        qry = spk["query"]
        if k > 0:
            _, adapted, ms, _ = metatest(
                tstate.params, tstate.model_state, sup, qry,
                jax.random.PRNGKey(seed * 131 + si),
            )
        else:
            adapted, ms = tstate.params, tstate.model_state
        outs, _ = tacotron2nv_forward(
            adapted, ms, eval_cfg, qry["inputs"], qry["in_len"],
            qry["mels"], qry["mel_len"], qry["spk"],
            jax.random.PRNGKey(0), train=False,
        )
        losses.append(float(tacotron2_loss(
            tuple(outs), (qry["mels"], qry["stop"]), qry["mel_len"],
            n_frames_per_step=MODEL_PARAMS["n_frames_per_step"],
            reduction="none", pos_weight=1.0,
        )))
        mcds.append(float(mcd_batch_np(
            np.swapaxes(np.asarray(outs[1]), 1, 2),
            np.swapaxes(qry["mels"], 1, 2), qry["mel_len"],
        )))
    return np.asarray(losses), np.asarray(mcds)


# ----------------------------------------------- reference-side protocol
def adapt_eval_torch(cfg, tstate, test_spk, k: int):
    """The SAME protocol inside the reference: load the exported
    checkpoint into msa_tts' Tacotron2NV, adapt k full-batch SGD steps
    on the support shots, evaluate the query teacher-forced loss + MCD
    (reference protocol: msa_tts/infer.py:266-281 finetune-then-infer)."""
    import torch
    from msa_tts.models.modules_tacotron2nv.tacotron2nv_loss import (
        Tacotron2Loss,
    )
    from msa_tts.models.tacotron2nv import Tacotron2NV

    sd = pytrees_to_state_dict(tstate.params, tstate.model_state, cfg)

    def tt(x, dtype=None):
        t = torch.from_numpy(np.asarray(x))
        return t.to(dtype) if dtype is not None else t

    criterion = Tacotron2Loss(
        MODEL_PARAMS["n_frames_per_step"], "none", 1.0,
        torch.device("cpu"),
    )
    losses, mcds = [], []
    for spk in test_spk:
        from benchmarks.quality_convergence import (
            _patch_reference_gate_repeat,
        )

        model = _patch_reference_gate_repeat(
            Tacotron2NV(dict(MODEL_PARAMS)),
            r=MODEL_PARAMS["n_frames_per_step"],
        )
        model.load_state_dict(
            {kk: torch.from_numpy(np.asarray(v)) for kk, v in sd.items()}
        )
        model.train()
        opt = torch.optim.SGD(model.parameters(), lr=INNER_LR)
        sup = {kk: v[:EVAL_SHOTS] for kk, v in spk["support"].items()}
        for _ in range(k):
            opt.zero_grad()
            outs = model(
                tt(sup["inputs"], torch.long), tt(sup["in_len"], torch.long),
                tt(sup["mels"]), tt(sup["mel_len"], torch.long),
                tt(sup["spk"]),
            )
            loss = criterion(
                outs, (tt(sup["mels"]), tt(sup["stop"])),
                tt(sup["mel_len"]),
            )
            loss.backward()
            opt.step()
        model.eval()
        qry = spk["query"]
        orig_dropout = torch.nn.functional.dropout
        torch.nn.functional.dropout = lambda x, *a, **kw: x
        try:
            with torch.no_grad():
                outs = model(
                    tt(qry["inputs"], torch.long),
                    tt(qry["in_len"], torch.long), tt(qry["mels"]),
                    tt(qry["mel_len"], torch.long), tt(qry["spk"]),
                )
                qloss = criterion(
                    outs, (tt(qry["mels"]), tt(qry["stop"])),
                    tt(qry["mel_len"]),
                )
        finally:
            torch.nn.functional.dropout = orig_dropout
        losses.append(float(qloss.item()))
        mcds.append(float(mcd_batch_np(
            np.swapaxes(outs[1].numpy(), 1, 2),
            np.swapaxes(qry["mels"], 1, 2), qry["mel_len"],
        )))
    return np.asarray(losses), np.asarray(mcds)


# ------------------------------------------------------------------ main
def run(outer_steps: int = 200, with_reference: bool = True,
        methods=("maml", "reptile"), seed: int = 0,
        joint_mults=(1, 4), k_eval=K_EVAL):
    # the second-order MAML step takes ~2 min of XLA compile on CPU;
    # persist it so reruns (and the pytest) start warm
    from msa_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    train_spk, test_spk = build_corpus(seed)
    rows = []

    inits = {}
    for method in methods:
        cfg, tstate, tr_loss = meta_train(
            method, train_spk, outer_steps, seed
        )
        inits[method] = (cfg, tstate)
        rows.append({"init": method, "train_loss": round(tr_loss, 4),
                     "outer_steps": outer_steps})

    # joint baselines: equal outer steps, and a budget-generous
    # multiple (the meta methods must win at low k even against it)
    for mult in joint_mults:
        cfg, tstate, tr_loss = joint_train(
            train_spk, outer_steps * mult, seed
        )
        name = "joint" if mult == 1 else f"joint_{mult}x"
        inits[name] = (cfg, tstate)
        rows.append({"init": name, "train_loss": round(tr_loss, 4),
                     "outer_steps": outer_steps * mult})

    results = {}
    for name, (cfg, tstate) in inits.items():
        for k in k_eval:
            losses, mcds = adapt_eval(cfg, tstate, test_spk, k, seed)
            results[(name, k)] = (losses, mcds)
            rows.append({
                "init": name, "k": k,
                "query_loss_mean": round(float(losses.mean()), 4),
                "query_loss_std": round(float(losses.std()), 4),
                "query_mcd_mean": round(float(mcds.mean()), 4),
                "query_mcd_std": round(float(mcds.std()), 4),
            })

    ref_rows = []
    if with_reference:
        for name in list(dict.fromkeys(
            [m for m in methods] + ["joint"]
        )):
            if name not in inits:
                continue
            cfg, tstate = inits[name]
            for k in (1, 5):
                losses, mcds = adapt_eval_torch(cfg, tstate, test_spk, k)
                ref_rows.append({
                    "init": name, "k": k, "protocol": "reference_torch",
                    "query_loss_mean": round(float(losses.mean()), 4),
                    "query_mcd_mean": round(float(mcds.mean()), 4),
                })
    return rows, ref_rows, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer_steps", type=int, default=200)
    ap.add_argument("--no_reference", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--r", type=int, default=1,
                    help="reduction factor n_frames_per_step (r=2 "
                         "quality-evidence run — BENCHMARKS.md)")
    ap.add_argument("--k", type=int, default=None,
                    help="speakers (tasks) per meta-batch — override "
                         "for meta-batch-shape quality runs (round-5 "
                         "K×S ladder evidence)")
    ap.add_argument("--s", type=int, default=None,
                    help="support utterances (shots) per task")
    args = ap.parse_args()
    MODEL_PARAMS["n_frames_per_step"] = args.r
    assert T_MEL % args.r == 0
    global K_TASKS, S_SHOTS
    if args.k:
        K_TASKS = args.k
    if args.s:
        S_SHOTS = args.s
    assert S_SHOTS <= UTTS_PER_SPK - N_QUERY and S_SHOTS <= N_QUERY, (
        f"S={S_SHOTS} exceeds the per-speaker pool"
    )
    assert K_TASKS <= N_TRAIN_SPK

    rows, ref_rows, results = run(
        args.outer_steps, with_reference=not args.no_reference,
        seed=args.seed,
    )
    print(json.dumps({"run": "meta_advantage", "r": args.r,
                      "outer_steps": args.outer_steps,
                      "k_tasks": K_TASKS, "s_shots": S_SHOTS,
                      "seed": args.seed}))
    for r in rows + ref_rows:
        print(json.dumps(r))

    inits = sorted({r["init"] for r in rows if "k" in r})
    print("\n| init \\ k | " + " | ".join(str(k) for k in K_EVAL) + " |")
    print("|---|" + "---|" * len(K_EVAL))
    for name in inits:
        cells = []
        for k in K_EVAL:
            losses, mcds = results[(name, k)]
            cells.append(f"{losses.mean():.3f}±{losses.std():.3f}")
        print(f"| {name} (query loss) | " + " | ".join(cells) + " |")
    for name in inits:
        cells = []
        for k in K_EVAL:
            losses, mcds = results[(name, k)]
            cells.append(f"{mcds.mean():.3f}±{mcds.std():.3f}")
        print(f"| {name} (query MCD) | " + " | ".join(cells) + " |")
    if ref_rows:
        print("\nReference (torch) cross-check on exported checkpoints:")
        for r in ref_rows:
            print(f"  {r['init']} k={r['k']}: loss "
                  f"{r['query_loss_mean']} MCD {r['query_mcd_mean']}")


if __name__ == "__main__":
    main()
