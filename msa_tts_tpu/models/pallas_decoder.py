"""Whole-loop Pallas TPU kernel for autoregressive Tacotron2 inference.

Why: the serving decode (`decoder.decoder_infer`) is weight-bandwidth
bound — every autoregressive step re-reads the ~38 MB (bf16) of
attention-LSTM / decoder-LSTM / projection weights from HBM, because
XLA materializes each step's matmuls against HBM-resident operands.
The v5e holds ~128 MB of VMEM (probed — see BENCHMARKS.md), so this
kernel runs the ENTIRE decode loop inside ONE ``pallas_call`` with the
weights, the encoder conditioning, the attention state and the output
buffers all VMEM-resident; HBM is touched once at entry and once at
exit.

Exactness: the kernel computes the same function as ``decoder_infer``
(same gate math, same early-stopping count semantics, f32 gate/state
arithmetic with matmuls at the weights' dtype).  The prenet's
always-on dropout is the one stochastic input: its masks are
precomputed OUTSIDE the kernel with ``decoder._infer_step``'s exact
``fold_in(rng, step)`` key schedule and streamed in, so kernel and XLA
paths draw identical noise — parity is tested at both the kernel and
the serving level (tests/test_pallas_decoder.py).

Supported attention config: ForwardAttention with/without
forward_attn / trans_agent / location_attention, softmax or
normalized-sigmoid norm, optional energy masking.  Inference-time
windowing and forward_attn_mask (reference quirks off by default) are
NOT lowered — ``supports_config`` gates them back to the XLA path.

Reference for the algorithm: msa_tts/models/modules_tacotron2nv/
decoder.py:333-411 and forward_attn.py:103-224 — re-derived TPU-first,
not ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .attention import MASK_VALUE
from .decoder import DecoderConfig
from ..ops.masking import sequence_mask


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def supports_config(cfg: DecoderConfig) -> bool:
    """True when the kernel lowers this decoder configuration."""
    ap = cfg.attention_params
    if ap.get("attention_type") == "LSA":
        return True      # fixed-spec LSA (attention.py:lsa_attention)
    return (
        ap.get("attention_type") == "ForwardAttention"
        and not ap.get("windowing", False)
        and not ap.get("forward_attn_mask", False)
        and ap.get("norm", "softmax") in ("softmax", "sigmoid")
    )


def _attn_flags(ap: dict):
    """The step's static attention switches.  LSA (the reference's
    NVIDIA-style variant, fixed per attention.py) is the same dataflow
    as ForwardAttention with the recursion/agent off, masked energies
    and softmax norm — one kernel body serves both."""
    if ap.get("attention_type") == "LSA":
        return dict(loc_att=True, fwd=False, tagent=False,
                    norm="softmax", mask_energies=True)
    return dict(
        loc_att=ap.get("location_attention", True),
        fwd=ap.get("forward_attn", True),
        tagent=ap.get("trans_agent", True),
        norm=ap.get("norm", "softmax"),
        mask_energies=ap.get("mask_energies", False),
    )


# Leave headroom under the 100 MB vmem_limit for Mosaic's own
# temporaries (softmax/tanh intermediates at (B, T_in, A)).
_VMEM_BUDGET = 88 * 1024 * 1024


def estimated_vmem_bytes(cfg: DecoderConfig, B: int, T_in: int,
                         weight_bytes: int) -> int:
    """Everything the kernel keeps VMEM-resident: weights, per-utterance
    conditioning, the precomputed prenet-dropout stream, the S-step
    output buffers and the state scratch.  Used to gate the kernel —
    a config/batch whose footprint exceeds the budget routes back to
    the XLA while-loop instead of failing Mosaic's VMEM check at
    compile time (e.g. fp32 full dims at B≥8 with a 1000-step cap)."""
    B = max(B, 2)   # B=1 runs padded to 2 (_dup_row0)
    ap = cfg.attention_params
    E, H, Hd, P = (
        cfg.encoder_embedding_dim, cfg.attention_rnn_dim,
        cfg.decoder_rnn_dim, cfg.prenet_dim,
    )
    A = ap["attention_dim"]
    F = ap.get("attention_location_n_filters", 32)
    K = ap.get("attention_location_kernel_size", 31)
    MR = cfg.n_mel_channels * cfg.n_frames_per_step
    S = cfg.max_decoder_steps
    n_weights = (
        MR * P + P * P                              # prenet
        + (P + E + H) * 4 * H + 4 * H               # attention LSTM
        + H * A + 2 * K * F + F * A + A + 1         # attention
        + (E + H) + 1                               # transition agent
        + (H + E + Hd) * 4 * Hd + 4 * Hd            # decoder LSTM
        + (Hd + E) * (MR + 1) + MR + 1              # projection + gate
    )
    return (
        n_weights * weight_bytes
        + 4 * B * T_in * (E + A + 1)                # enc, pinputs, mask
        + 4 * S * 2 * B * P                         # prenet dropout masks
        + 4 * S * B * (MR + 1 + T_in)               # output buffers
        + 4 * B * (2 * H + 2 * Hd + E + 3 * T_in + MR + 32)  # scratch
    )


def fits_vmem(cfg: DecoderConfig, B: int, T_in: int,
              weight_dtype=jnp.float32) -> bool:
    return (
        estimated_vmem_bytes(
            cfg, B, T_in, jnp.dtype(weight_dtype).itemsize
        )
        <= _VMEM_BUDGET
    )


# Measured on v5e (benchmarks/pallas_decoder_bench.py, full same-day
# sweep 2026-08-21 on the current r-aware kernel, T=192, fixed steps at
# matched audio length): speedup vs the XLA while-loop (bf16/f32) is
#   r=1: B=4: 2.5×/1.5×, B=8: 2.1×/1.3×, B=16: 1.22× (bf16; f32 is
#        VMEM-gated to XLA anyway);
#   r=2 (the shipped default): B=1: 2.2×/3.0×, B=2: 2.2×/1.4×,
#        B=4: 1.8×/2.0×, B=8: 1.6×/1.3×, B=16: 0.61×.
# (The round-3 "B=8 loses" figure predates the round-4 kernel rework —
# the current kernel measures 3× faster at B=8 than that table.)
# B≤8 wins with solid margin at every measured r; B=16 is a clear loss
# at the shipped r=2 and within relay variance at r=1, so `auto`
# routes B>8 back to XLA.  The ``r`` parameter keeps the gate
# re-calibratable per reduction factor without touching callers.
_MAX_PROFITABLE_B = {}          # per-r overrides (none currently)
_MAX_PROFITABLE_B_DEFAULT = 8


def profitable(B: int, r: int = 1) -> bool:
    """True when the whole-loop kernel beats the XLA decode at batch
    ``B`` and reduction factor ``r`` on the measured hardware
    envelope."""
    return B <= _MAX_PROFITABLE_B.get(int(r), _MAX_PROFITABLE_B_DEFAULT)


# --------------------------------------------------------------------------
# Weight repacking
# --------------------------------------------------------------------------

def split_decoder_params(params, cfg: DecoderConfig):
    """Transpose every matmul to (in, out) and split each concat-input
    layer into per-operand halves (the same linear map without in-kernel
    concatenation).  Biases become (1, out) f32 rows."""
    E = cfg.encoder_embedding_dim
    H = cfg.attention_rnn_dim
    P = cfg.prenet_dim

    def t(w):
        return jnp.swapaxes(w, 0, 1)

    def b(v):
        return jnp.asarray(v, jnp.float32).reshape(1, -1)

    att = params["attention_layer"]
    a_ih = t(params["attention_rnn"]["weight_ih"])     # (P+E, 4H)
    d_ih = t(params["decoder_rnn"]["weight_ih"])       # (H+E, 4Hd)
    pj = t(params["linear_projection"]["weight"])      # (Hd+E, MR)
    gt = t(params["gate_layer"]["weight"])             # (Hd+E, 1)
    Hd = cfg.decoder_rnn_dim
    w = {
        "pre1": t(params["prenet"]["layers"][0]["weight"]),
        "pre2": t(params["prenet"]["layers"][1]["weight"]),
        "att_ih_p": a_ih[:P],
        "att_ih_c": a_ih[P:],
        "att_hh": t(params["attention_rnn"]["weight_hh"]),
        "att_b": b(
            params["attention_rnn"]["bias_ih"]
            + params["attention_rnn"]["bias_hh"]
        ),
        "q_w": t(att["query_layer"]["weight"]),        # (H, A)
        "v_w": b(att["v"]["weight"]),                  # (1, A) row
        # LSA's v has no bias (init_lsa) — the kernel adds a zero
        "v_b": (
            b(att["v"]["bias"]) if "bias" in att["v"]
            else jnp.zeros((1, 1), jnp.float32)
        ),
        "dec_ih_h": d_ih[:H],
        "dec_ih_c": d_ih[H:],
        "dec_hh": t(params["decoder_rnn"]["weight_hh"]),
        "dec_b": b(
            params["decoder_rnn"]["bias_ih"]
            + params["decoder_rnn"]["bias_hh"]
        ),
        "proj_h": pj[:Hd],
        "proj_c": pj[Hd:],
        "proj_b": b(params["linear_projection"]["bias"]),
        "gate_h": gt[:Hd],
        "gate_c": gt[Hd:],
        "gate_b": b(params["gate_layer"]["bias"]),
    }
    ap = cfg.attention_params
    # key the repack on the SAME flag resolution the kernel body uses
    # (_attn_flags forces loc_att=True for LSA, whose init always has a
    # real location layer) — keying on the raw config here would emit
    # zero location weights for an LSA config carrying
    # location_attention=False while the kernel still computes with them
    if _attn_flags(ap)["loc_att"]:
        lc = att["location_layer"]["location_conv1d"]["weight"]  # (F, 2, K)
        # per-tap filter rows: tap k of the previous-α / cumulative-α
        # channels, each (K, F) — the conv becomes K shifted outer adds
        w["loc_prev"] = jnp.swapaxes(lc[:, 0, :], 0, 1)
        w["loc_cum"] = jnp.swapaxes(lc[:, 1, :], 0, 1)
        w["loc_dense"] = t(att["location_layer"]["location_dense"]["weight"])
    else:
        A = ap["attention_dim"]
        F = ap.get("attention_location_n_filters", 32)
        K = ap.get("attention_location_kernel_size", 31)
        w["loc_prev"] = jnp.zeros((K, F), jnp.float32)
        w["loc_cum"] = jnp.zeros((K, F), jnp.float32)
        w["loc_dense"] = jnp.zeros((F, A), jnp.float32)
    if ap.get("trans_agent", True) and "ta" in att:
        ta = t(att["ta"]["weight"])                    # (E+H, 1)
        w["ta_c"], w["ta_q"] = ta[:E], ta[E:]
        w["ta_b"] = b(att["ta"]["bias"])
    else:
        w["ta_c"] = jnp.zeros((E, 1), jnp.float32)
        w["ta_q"] = jnp.zeros((H, 1), jnp.float32)
        w["ta_b"] = jnp.zeros((1, 1), jnp.float32)
    return w


_W_NAMES = (
    "pre1", "pre2",
    "att_ih_p", "att_ih_c", "att_hh", "att_b",
    "q_w", "v_w", "v_b", "loc_prev", "loc_cum", "loc_dense",
    "ta_c", "ta_q", "ta_b",
    "dec_ih_h", "dec_ih_c", "dec_hh", "dec_b",
    "proj_h", "proj_c", "proj_b", "gate_h", "gate_c", "gate_b",
)


def _dot(x, w):
    """x (B, in) @ w (in, out) at the weight dtype, f32 accumulation."""
    return jax.lax.dot_general(
        x.astype(w.dtype), w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _lstm(gates, h, c):
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H: 2 * H])
    g = jnp.tanh(gates[:, 2 * H: 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _bind_step(cfg: DecoderConfig, B: int, T_in: int, w,
               enc_ref, pin_ref, mask_ref, pre_ref,
               mels_ref, gates_ref, aligns_ref,
               ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref, cum_ref,
               alpha_ref, u_ref, din_ref, nf_ref, mlen_ref):
    """Bind ONE decoder step over the given VMEM refs: ``step(i)``
    consumes prenet-mask row ``i`` / writes output row ``i`` and
    mutates the state scratch, returning the number of still-unfinished
    utterances.  Shared verbatim by the whole-loop kernel
    (``make_pallas_decoder_infer``) and the streaming segment kernel
    (``make_pallas_decoder_segment``) so their math cannot diverge."""
    ap = cfg.attention_params
    K = ap.get("attention_location_kernel_size", 31)
    pad_l = (K - 1) // 2
    flags = _attn_flags(ap)
    loc_att, fwd, tagent = (
        flags["loc_att"], flags["fwd"], flags["tagent"],
    )
    norm, mask_energies = flags["norm"], flags["mask_energies"]

    keep = 1.0 - cfg.p_prenet_dropout

    def b3(x, shape, dims):
        # Mosaic-lowerable rank expansion: jnp's `x[:, None, :]` falls
        # through JAX's slice rewrite into lax.gather (newaxis disables
        # the rewrite — numpy/indexing.py), which the TPU kernel
        # lowering rejects.  broadcast_in_dim lowers directly.
        return jax.lax.broadcast_in_dim(x, shape, dims)

    def step(t):
        # prenet with the exact precomputed 0/1 dropout masks:
        # (x/keep)·mask == where(mask, x/keep, 0) bit-for-bit (N.dropout)
        pm = pre_ref[t].astype(jnp.float32)       # (2, B, P)
        x = jax.nn.relu(_dot(din_ref[:], w["pre1"][:])) / keep * pm[0]
        x = jax.nn.relu(_dot(x, w["pre2"][:])) / keep * pm[1]
        # attention LSTM (input = [prenet, context], split matmuls)
        ctx = ctx_ref[:]
        g4 = (
            _dot(x, w["att_ih_p"][:]) + _dot(ctx, w["att_ih_c"][:])
            + _dot(ah_ref[:], w["att_hh"][:]) + w["att_b"][:]
        )
        ah, ac = _lstm(g4, ah_ref[:], ac_ref[:])
        ah_ref[:] = ah
        ac_ref[:] = ac
        # ---- attention
        pq = _dot(ah, w["q_w"][:])                 # (B, A)
        if loc_att:
            zpad = jnp.zeros((B, pad_l), jnp.float32)
            cat_p = jnp.concatenate([zpad, aw_ref[:], zpad], axis=1)
            cat_c = jnp.concatenate([zpad, cum_ref[:], zpad], axis=1)
            wp = w["loc_prev"][:].astype(jnp.float32)  # (K, F)
            wc = w["loc_cum"][:].astype(jnp.float32)
            F = wp.shape[1]
            Tp = T_in + 2 * pad_l
            # Broadcast the padded vectors to (B, Tp, F) ONCE at lane
            # offset 0, then take the K shifted windows as 3-D sublane
            # slices — broadcasting each lane-offset 2-D slice instead
            # hits Mosaic's unsupported offset-vector reshape.
            cp3 = b3(cat_p, (B, Tp, F), (0, 1))
            cc3 = b3(cat_c, (B, Tp, F), (0, 1))
            loc = jnp.zeros((B, T_in, F), jnp.float32)
            for k in range(K):                     # static unroll
                sp3 = jax.lax.slice_in_dim(cp3, k, k + T_in, axis=1)
                sc3 = jax.lax.slice_in_dim(cc3, k, k + T_in, axis=1)
                wpk = jax.lax.slice_in_dim(wp, k, k + 1, axis=0)  # (1, F)
                wck = jax.lax.slice_in_dim(wc, k, k + 1, axis=0)
                loc = loc + (
                    sp3 * b3(wpk, (B, T_in, F), (1, 2))
                    + sc3 * b3(wck, (B, T_in, F), (1, 2))
                )
            ploc = jax.lax.dot_general(
                loc.astype(w["loc_dense"].dtype), w["loc_dense"][:],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (B, T, A)
            A = ploc.shape[-1]
            pre_tanh = b3(pq, (B, T_in, A), (0, 2)) + ploc + pin_ref[
                :
            ].astype(jnp.float32)
        else:
            pin = pin_ref[:].astype(jnp.float32)
            A = pin.shape[-1]
            pre_tanh = b3(pq, (B, T_in, A), (0, 2)) + pin
        vv = w["v_w"][:].astype(jnp.float32)       # (1, A)
        e = jnp.sum(
            jnp.tanh(pre_tanh) * b3(vv, (B, T_in, A), (1, 2)), axis=-1
        ) + w["v_b"][0, 0]                         # (B, T)
        if mask_energies:
            e = jnp.where(mask_ref[:] > 0, e, MASK_VALUE)
        if norm == "softmax":
            align = jax.nn.softmax(e, axis=-1)
        else:
            sg = jax.nn.sigmoid(e)
            align = sg / jnp.sum(sg, axis=1, keepdims=True)
        if loc_att:
            cum_ref[:] = cum_ref[:] + align
        if fwd:
            alpha = alpha_ref[:]
            shifted = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.float32), alpha[:, :-1]], axis=1
            )
            u = u_ref[:, :1]
            a = ((1.0 - u) * alpha + u * shifted + 1e-8) * align
            align = a / jnp.sum(a, axis=1, keepdims=True)
            alpha_ref[:] = align
        aw_ref[:] = align
        # context = Σ_t align·enc (Mosaic's dot lowering rejects batch
        # dims, so the batched (1,T)·(T,E) einsum is a broadcast-sum)
        enc = enc_ref[:].astype(jnp.float32)       # (B, T, E)
        E = enc.shape[-1]
        ctx = jnp.sum(
            b3(align, (B, T_in, E), (0, 1)) * enc, axis=1
        )                                          # (B, E)
        ctx_ref[:] = ctx
        if fwd and tagent:
            u_new = jax.nn.sigmoid(
                _dot(ctx, w["ta_c"][:]) + _dot(ah, w["ta_q"][:])
                + w["ta_b"][:]
            )                                      # (B, 1)
            u_ref[:, :1] = u_new
        # decoder LSTM (input = [attn_h, context])
        g4 = (
            _dot(ah, w["dec_ih_h"][:]) + _dot(ctx, w["dec_ih_c"][:])
            + _dot(dh_ref[:], w["dec_hh"][:]) + w["dec_b"][:]
        )
        dh, dc = _lstm(g4, dh_ref[:], dc_ref[:])
        dh_ref[:] = dh
        dc_ref[:] = dc
        mel = (
            _dot(dh, w["proj_h"][:]) + _dot(ctx, w["proj_c"][:])
            + w["proj_b"][:]
        )                                          # (B, MR)
        gate = (
            _dot(dh, w["gate_h"][:]) + _dot(ctx, w["gate_c"][:])
            + w["gate_b"][:]
        )                                          # (B, 1)
        dec = (
            jax.nn.sigmoid(gate) <= cfg.gate_threshold
        ).astype(jnp.float32)                      # (B, 1)
        # Mosaic can't reduce rank-1 vectors: keep the finished mask at
        # its full (B, 8) scratch width (all lanes identical) so the
        # alive count is a rank-2 reduction.
        nf = nf_ref[:] * b3(dec, nf_ref.shape, (0, 1))
        nf_ref[:] = nf
        mlen_ref[:] = mlen_ref[:] + nf.astype(jnp.int32)
        mels_ref[t] = mel
        gates_ref[t, :] = gate[:, 0]
        aligns_ref[t] = align
        din_ref[:] = mel
        # 8× the unfinished count — callers only test sign
        return jnp.sum(nf).astype(jnp.int32)

    return step


_SCRATCH_KEYS = (
    "ah", "ac", "dh", "dc", "ctx", "aw", "cum", "alpha", "u", "din",
    "nf", "mlen",
)


def _scratch_shapes(cfg: DecoderConfig, B: int, T_in: int):
    pltpu = _pl()[1]
    H, Hd, E = (
        cfg.attention_rnn_dim, cfg.decoder_rnn_dim,
        cfg.encoder_embedding_dim,
    )
    MR = cfg.n_mel_channels * cfg.n_frames_per_step
    return [
        pltpu.VMEM((B, H), jnp.float32),       # attention h
        pltpu.VMEM((B, H), jnp.float32),       # attention c
        pltpu.VMEM((B, Hd), jnp.float32),      # decoder h
        pltpu.VMEM((B, Hd), jnp.float32),      # decoder c
        pltpu.VMEM((B, E), jnp.float32),       # context
        pltpu.VMEM((B, T_in), jnp.float32),    # attention weights
        pltpu.VMEM((B, T_in), jnp.float32),    # cumulative weights
        pltpu.VMEM((B, T_in), jnp.float32),    # forward alpha
        pltpu.VMEM((B, 8), jnp.float32),       # transition agent u
        pltpu.VMEM((B, MR), jnp.float32),      # AR decoder input
        pltpu.VMEM((B, 8), jnp.float32),       # not_finished
        pltpu.VMEM((B, 8), jnp.int32),         # mel_lengths
    ]


def make_pallas_decoder_infer(cfg: DecoderConfig, B: int, T_in: int,
                              interpret: bool = False):
    """Build ``run(w, enc, pinputs, maskf, pre_masks) -> (mels (S,B,MR),
    gates (S,B), aligns (S,B,T), mel_lengths (1,B) i32, n_steps (1,1))``
    — the whole autoregressive loop (early stopping included) in one
    kernel launch."""
    if not supports_config(cfg):
        raise ValueError("decoder config not supported by the kernel")
    pl, pltpu = _pl()
    S = cfg.max_decoder_steps
    MR = cfg.n_mel_channels * cfg.n_frames_per_step
    H = cfg.attention_rnn_dim
    Hd = cfg.decoder_rnn_dim
    E = cfg.encoder_embedding_dim

    def kernel(enc_ref, pin_ref, mask_ref, pre_ref, *refs):
        w = dict(zip(_W_NAMES, refs[:len(_W_NAMES)]))
        (mels_ref, gates_ref, aligns_ref, ml_ref, ns_ref) = (
            refs[len(_W_NAMES): len(_W_NAMES) + 5]
        )
        scratch = refs[len(_W_NAMES) + 5:]
        (ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref, cum_ref,
         alpha_ref, u_ref, din_ref, nf_ref, mlen_ref) = scratch

        # ---- buffer/state init (reference: decoder.py:430-443 +
        #      attention.py:init_attn_state)
        mels_ref[:] = jnp.zeros_like(mels_ref)
        gates_ref[:] = jnp.full_like(gates_ref, 1e3)
        aligns_ref[:] = jnp.zeros_like(aligns_ref)
        for ref in (ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref,
                    cum_ref, din_ref):
            ref[:] = jnp.zeros_like(ref)
        pos_t = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1)
        alpha_ref[:] = jnp.where(pos_t == 0, 1.0, 1e-7)
        u_ref[:] = jnp.full_like(u_ref, 0.5)
        nf_ref[:] = jnp.ones_like(nf_ref)
        mlen_ref[:] = jnp.zeros_like(mlen_ref)

        step = _bind_step(
            cfg, B, T_in, w, enc_ref, pin_ref, mask_ref, pre_ref,
            mels_ref, gates_ref, aligns_ref, *scratch,
        )

        def body(carry):
            t, _alive = carry
            return t + 1, step(t)

        def cond(carry):
            t, alive = carry
            under = t < S
            if cfg.early_stopping:
                return under & (alive > 0)
            return under

        n_steps, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32))
        )
        ml_ref[0, :] = mlen_ref[:, 0]
        ns_ref[0, 0] = n_steps

    def whole():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(w: dict, enc, pinputs, maskf, pre_masks):
        return pl.pallas_call(
            kernel,
            in_specs=[whole()] * (4 + len(_W_NAMES)),
            out_specs=(
                whole(), whole(), whole(), whole(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((S, B, MR), jnp.float32),
                jax.ShapeDtypeStruct((S, B), jnp.float32),
                jax.ShapeDtypeStruct((S, B, T_in), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            scratch_shapes=_scratch_shapes(cfg, B, T_in),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            enc, pinputs, maskf, pre_masks,
            *[w[k] for k in _W_NAMES],
        )

    return run


# --------------------------------------------------------------------------
# Streaming segment kernel
# --------------------------------------------------------------------------

def make_pallas_decoder_segment(cfg: DecoderConfig, B: int, T_in: int,
                                n_seg: int, interpret: bool = False):
    """Build ``run(w, enc, pinputs, maskf, pre_masks, *state_in) ->
    (mels (n_seg,B,MR), gates (n_seg,B), aligns (n_seg,B,T), nf (1,B),
    mlen (1,B), *state_out)`` — ``n_seg`` fixed decoder steps from a
    carried state, the Pallas analogue of
    ``decoder.decoder_infer_segment`` (same ``_bind_step`` math as the
    whole-loop kernel, so chaining segments reproduces it).  State
    arrays, in order: din (B,MR), ah/ac (B,H), dh/dc (B,Hd), ctx (B,E),
    aw/cum/alpha (B,T), u (B,1)."""
    if not supports_config(cfg):
        raise ValueError("decoder config not supported by the kernel")
    pl, pltpu = _pl()
    MR = cfg.n_mel_channels * cfg.n_frames_per_step
    H = cfg.attention_rnn_dim
    Hd = cfg.decoder_rnn_dim
    E = cfg.encoder_embedding_dim
    st_shapes = (
        (B, MR), (B, H), (B, H), (B, Hd), (B, Hd), (B, E),
        (B, T_in), (B, T_in), (B, T_in), (B, 1),
    )
    n_st = len(st_shapes)

    def kernel(enc_ref, pin_ref, mask_ref, pre_ref, nf_in, mlen_in,
               *refs):
        st_in = refs[:n_st]
        w = dict(zip(_W_NAMES, refs[n_st: n_st + len(_W_NAMES)]))
        outs = refs[n_st + len(_W_NAMES):]
        mels_ref, gates_ref, aligns_ref, nf_out, mlen_out = outs[:5]
        st_out = outs[5: 5 + n_st]
        scratch = outs[5 + n_st:]
        (ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref, cum_ref,
         alpha_ref, u_ref, din_ref, nf_ref, mlen_ref) = scratch

        # load the carried state into the step scratch (din, ah, ac,
        # dh, dc, ctx, aw, cum, alpha, u order per st_shapes)
        for ref, src in zip(
            (din_ref, ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref,
             cum_ref, alpha_ref),
            st_in[:9],
        ):
            ref[:] = src[:]
        u_ref[:, :1] = st_in[9][:]
        # fill ALL lanes of the (B, 8) masks — the step now updates and
        # reduces full-width (scratch is uninitialized VMEM otherwise)
        nf_ref[:] = jax.lax.broadcast_in_dim(
            nf_in[:].astype(jnp.float32), nf_ref.shape, (0, 1)
        )
        mlen_ref[:] = jax.lax.broadcast_in_dim(
            mlen_in[:], mlen_ref.shape, (0, 1)
        )

        step = _bind_step(
            cfg, B, T_in, w, enc_ref, pin_ref, mask_ref, pre_ref,
            mels_ref, gates_ref, aligns_ref, *scratch,
        )

        def body(i, _):
            step(i)
            return 0

        jax.lax.fori_loop(0, n_seg, body, 0)

        for dst, ref in zip(
            st_out,
            (din_ref, ah_ref, ac_ref, dh_ref, dc_ref, ctx_ref, aw_ref,
             cum_ref, alpha_ref),
        ):
            dst[:] = ref[:]
        st_out[9][:] = u_ref[:, :1]
        nf_out[:] = nf_ref[:, :1].astype(jnp.int32)
        mlen_out[:] = mlen_ref[:, :1]

    def whole():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(w: dict, enc, pinputs, maskf, pre_masks, nf, mlen, *state):
        n_in = 6 + n_st + len(_W_NAMES)
        n_out = 5 + n_st
        return pl.pallas_call(
            kernel,
            in_specs=[whole()] * n_in,
            out_specs=tuple(whole() for _ in range(n_out)),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg, B, MR), jnp.float32),
                jax.ShapeDtypeStruct((n_seg, B), jnp.float32),
                jax.ShapeDtypeStruct((n_seg, B, T_in), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ) + tuple(
                jax.ShapeDtypeStruct(s, jnp.float32) for s in st_shapes
            ),
            scratch_shapes=_scratch_shapes(cfg, B, T_in),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            enc, pinputs, maskf, pre_masks, nf, mlen, *state,
            *[w[k] for k in _W_NAMES],
        )

    return run


# --------------------------------------------------------------------------
# decoder_infer-compatible wrapper
# --------------------------------------------------------------------------

def _preprocess(params, cfg: DecoderConfig, encoder_outputs):
    """The hoisted encoder projection — ForwardAttention's inputs_layer
    or LSA's memory_layer (attention.py:preprocess_inputs[_lsa])."""
    from .attention import preprocess_inputs, preprocess_inputs_lsa

    if cfg.attention_params.get("attention_type") == "LSA":
        return preprocess_inputs_lsa(
            params["attention_layer"], encoder_outputs
        )
    return preprocess_inputs(params["attention_layer"], encoder_outputs)


def _prenet_masks(cfg: DecoderConfig, rng, S: int, B: int, start=0):
    """The prenet dropout masks ``decoder._infer_step`` would draw for
    steps [start, start+S), up front, as RAW 0/1 floats, using the same
    fold_in(rng, step) → split → fold_in(k_pre, layer) schedule.  The
    kernel computes ``(x / keep) · mask`` — bit-identical to the XLA
    path's ``where(mask, x / keep, 0)`` for every keep value (a
    premultiplied 1/keep mask would be 1 ulp off for non-dyadic keep
    like 0.7, and the error compounds through the AR feedback until it
    can flip a near-threshold gate).  The ONE implementation serves
    both the whole-loop and segment wrappers — the shared key schedule
    IS the offline==streamed contract."""
    keep = 1.0 - cfg.p_prenet_dropout
    P = cfg.prenet_dim

    def step_masks(t):
        k_step = jax.random.fold_in(rng, t)
        k_pre, _ = jax.random.split(k_step)
        return jnp.stack(
            [
                jax.random.bernoulli(
                    jax.random.fold_in(k_pre, i), keep, (B, P)
                ).astype(jnp.float32)
                for i in range(2)
            ],
            axis=0,
        )

    return jax.vmap(step_masks)(jnp.arange(S) + start)  # (S, 2, B, P)


def _dup_row0(x, axis: int):
    """Pad a per-utterance axis from 1 to 2 by duplicating row 0.

    Mosaic mis-lays-out B=1 kernels (a rank-3 reduction at B=1 yields an
    implicit-dim vector the softmax can't relayout), so single-utterance
    decodes run as B=2 with an identical twin row — same compute tiles
    (the sublane tile is 8 either way), same gate-stopping step, outputs
    sliced back to B=1.  The twin uses the SAME prenet-dropout masks as
    row 0, keeping the kernel bit-consistent with the XLA path's B=1
    noise draw."""
    return jnp.concatenate([x, x], axis=axis)


def pallas_decoder_infer(params, cfg: DecoderConfig, encoder_outputs,
                         input_lengths, rng, *, interpret: bool = False):
    """Drop-in for :func:`decoder.decoder_infer` (inference path) running
    the whole AR loop in one Pallas kernel.  Same returns:
    ``(mel_outputs (B, n_mel, S·r), gate_outputs (B, S·r), alignments
    (B, S, T_in), mel_lengths (B,), n_steps)``."""
    B, T_in, _ = encoder_outputs.shape
    r = cfg.n_frames_per_step
    S = cfg.max_decoder_steps
    w = split_decoder_params(params, cfg)
    pinputs = _preprocess(params, cfg, encoder_outputs)
    maskf = sequence_mask(input_lengths, T_in).astype(jnp.float32)
    pre_masks = _prenet_masks(cfg, rng, S, B)
    pad1 = B == 1   # also in interpret mode: tests cover the padded path
    if pad1:
        encoder_outputs = _dup_row0(encoder_outputs, 0)
        pinputs = _dup_row0(pinputs, 0)
        maskf = _dup_row0(maskf, 0)
        pre_masks = _dup_row0(pre_masks, 2)
        B = 2
    run = make_pallas_decoder_infer(cfg, B, T_in, interpret=interpret)
    mels, gates, aligns, ml, ns = run(
        w, encoder_outputs, pinputs, maskf, pre_masks
    )
    if pad1:
        B = 1
        mels, gates, aligns = mels[:, :1], gates[:, :1], aligns[:, :1]
        ml = ml[:, :1]
    mel_outputs = jnp.swapaxes(mels, 0, 1)            # (B, S, MR)
    mel_outputs = mel_outputs.reshape(B, S * r, cfg.n_mel_channels)
    mel_outputs = jnp.swapaxes(mel_outputs, 1, 2)
    gate_outputs = jnp.repeat(jnp.swapaxes(gates, 0, 1), r, axis=1)
    alignments = jnp.swapaxes(aligns, 0, 1)
    return mel_outputs, gate_outputs, alignments, ml[0], ns[0, 0]


def pallas_decoder_segment(params, cfg: DecoderConfig, encoder_outputs,
                           input_lengths, rng, state: dict, n_seg: int,
                           *, interpret: bool = False, prepacked_w=None):
    """Drop-in for :func:`decoder.decoder_infer_segment`: run ``n_seg``
    AR steps from the carried stream state inside one Pallas kernel.
    Same returns: ``(new_state, mels (B, n_mel, n_seg·r),
    gates (B, n_seg), alignments (B, n_seg, T_in))``.

    ``prepacked_w``: the :func:`split_decoder_params` result, when the
    caller can compute it ONCE per stream — inlined here it would
    re-materialize transposed copies of every decoder weight inside
    each segment's compiled program (serving.synthesize_stream passes
    it; one-shot callers can omit it)."""
    from .attention import AttnState
    from .decoder import DecoderCarry

    B, T_in, _ = encoder_outputs.shape
    r = cfg.n_frames_per_step
    w = (
        prepacked_w if prepacked_w is not None
        else split_decoder_params(params, cfg)
    )
    pinputs = _preprocess(params, cfg, encoder_outputs)
    maskf = sequence_mask(input_lengths, T_in).astype(jnp.float32)
    step0 = state["step"]
    pre_masks = _prenet_masks(cfg, rng, n_seg, B, start=step0)

    carry: DecoderCarry = state["carry"]
    ast: AttnState = carry.attn_state
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    st_in = (
        f32(state["decoder_input"]),
        f32(carry.attention_hidden), f32(carry.attention_cell),
        f32(carry.decoder_hidden), f32(carry.decoder_cell),
        f32(carry.attention_context),
        f32(ast.attention_weights), f32(ast.attention_weights_cum),
        f32(ast.alpha), f32(ast.u),
    )
    nf_in = state["not_finished"].astype(jnp.int32)[:, None]
    mlen_in = state["mel_lengths"].astype(jnp.int32)[:, None]
    pad1 = B == 1   # also in interpret mode: tests cover the padded path
    if pad1:
        encoder_outputs = _dup_row0(encoder_outputs, 0)
        pinputs = _dup_row0(pinputs, 0)
        maskf = _dup_row0(maskf, 0)
        pre_masks = _dup_row0(pre_masks, 2)
        st_in = tuple(_dup_row0(x, 0) for x in st_in)
        nf_in, mlen_in = _dup_row0(nf_in, 0), _dup_row0(mlen_in, 0)
        B = 2
    run = make_pallas_decoder_segment(
        cfg, B, T_in, n_seg, interpret=interpret
    )
    outs = run(
        w, encoder_outputs, pinputs, maskf, pre_masks,
        nf_in, mlen_in, *st_in,
    )
    mels, gates, aligns, nf, mlen = outs[:5]
    (din, ah, ac, dh, dc, ctx, aw, cum, alpha, u) = outs[5:]
    if pad1:
        B = 1
        mels, gates, aligns = mels[:, :1], gates[:, :1], aligns[:, :1]
        nf, mlen = nf[:1], mlen[:1]
        (din, ah, ac, dh, dc, ctx, aw, cum, alpha, u) = (
            x[:1] for x in (din, ah, ac, dh, dc, ctx, aw, cum, alpha, u)
        )
    # State stays f32 between segments regardless of the encoder/weight
    # dtype: the offline whole-loop kernel carries f32 VMEM state for
    # every step, and truncating the LSTM cells to bf16 at each segment
    # boundary would compound through the AR feedback (and could flip
    # near-threshold gates, changing the streamed length vs offline).
    new_state = dict(
        step=step0 + n_seg,
        decoder_input=din,
        carry=DecoderCarry(
            attention_hidden=ah,
            attention_cell=ac,
            decoder_hidden=dh,
            decoder_cell=dc,
            attention_context=ctx,
            attn_state=AttnState(
                attention_weights=aw,
                attention_weights_cum=cum,
                alpha=alpha,
                u=u,
                win_idx=ast.win_idx,
            ),
        ),
        not_finished=nf[:, 0],
        mel_lengths=mlen[:, 0],
    )
    mels = jnp.swapaxes(mels, 0, 1)                 # (B, n_seg, MR)
    mels = mels.reshape(B, n_seg * r, cfg.n_mel_channels)
    mels = jnp.swapaxes(mels, 1, 2)
    gates = jnp.swapaxes(gates, 0, 1)
    aligns = jnp.swapaxes(aligns, 0, 1)
    return new_state, mels, gates, aligns
