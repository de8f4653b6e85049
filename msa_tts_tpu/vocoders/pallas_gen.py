"""Whole-loop Pallas TPU kernel for WaveRNN sample generation.

Why this exists: the XLA sample loop (`wavernn._make_generate_scan`) is
weight-bandwidth bound — every one of the ~T·hop timesteps re-reads the
~7.6 MB (bf16) of GRU/FC weights from HBM, because XLA materializes each
step's matmuls as separate HBM-resident operands.  Round 2's per-step
fused cell (`experimental/pallas_lstm_cell.py`) could not beat XLA
because a per-step ``pallas_call`` *still* re-reads the weights each
step.  This kernel instead runs the ENTIRE generation loop inside ONE
``pallas_call``:

  * all sample-loop weights live in VMEM for the whole generation
    (un-gridded full-array BlockSpecs — loaded from HBM exactly once);
  * the per-step conditioning (the hoisted ``I`` projection), aux
    features and pre-drawn sampling noise are streamed in time-chunks
    by the Pallas pipeline (grid over chunks, auto double-buffered);
  * the GRU state is carried across grid steps in VMEM scratch (the
    TPU grid is sequential, scratch persists);
  * the mixture-of-logistics sampling runs in-kernel from the same
    pre-drawn noise tensors the XLA path uses, so both paths compute
    the same function (parity-tested in tests/test_pallas_gen.py).

Math parity notes: matmuls take the weights' dtype (bf16 by default via
``cast_generation_params``) with f32 accumulation — identical to
``wavernn._mm``.  The ``concatenate([z, aux])`` inputs of rnn2/fc1/fc2
are expressed as split matmuls (z @ W_z + a @ W_a), which is the same
linear map without in-kernel concats.

Reference for the algorithm being accelerated:
msa_tts/utils/wavernn/wavernn.py:123-166 (sample loop),
modules.py:149-257 (MoL sampling) — re-derived, not ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .wavernn import LOG_SCALE_MIN, WaveRNNConfig


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


# --------------------------------------------------------------------------
# Weight repacking
# --------------------------------------------------------------------------

def split_generation_params(params, cfg: WaveRNNConfig):
    """Repack the sample-loop weights for the kernel: transpose to
    (in, out) so every in-kernel matmul is ``x @ W``, split the
    concat-input layers (rnn2/fc1/fc2) into their z- and aux-addressed
    halves, and lift biases to (1, out) rows (TPU wants ≥2-D).

    Weight dtypes are preserved (run ``cast_generation_params`` first
    for bf16 weights); biases are f32 like the XLA path's gate math.
    """
    d = cfg.aux_dims

    def t(w):
        return jnp.swapaxes(w, 0, 1)        # (out,in) → (in,out)

    def b(v):
        return jnp.asarray(v, jnp.float32)[None, :]

    p = {
        "rnn1_ih": t(params["rnn1"]["weight_ih"]),
        "rnn1_hh": t(params["rnn1"]["weight_hh"]),
        "rnn1_bih": b(params["rnn1"]["bias_ih"]),
        "rnn1_bhh": b(params["rnn1"]["bias_hh"]),
        "rnn2_hh": t(params["rnn2"]["weight_hh"]),
        "rnn2_bih": b(params["rnn2"]["bias_ih"]),
        "rnn2_bhh": b(params["rnn2"]["bias_hh"]),
        "fc3_w": t(params["fc3"]["weight"]),
        "fc3_b": b(params["fc3"]["bias"]),
        # x·w_x outer product replaces the sample column of I
        "w_x": jnp.asarray(
            params["I"]["weight"][:, 0], jnp.float32
        )[None, :],
    }
    r2 = t(params["rnn2"]["weight_ih"])     # (rnn[+d], 3·rnn)
    f1 = t(params["fc1"]["weight"])
    f2 = t(params["fc2"]["weight"])
    if cfg.use_aux_net:
        p["rnn2_ih_z"], p["rnn2_ih_a"] = r2[: cfg.rnn_dims], r2[cfg.rnn_dims:]
        p["fc1_z"], p["fc1_a"] = f1[: cfg.rnn_dims], f1[cfg.rnn_dims:]
        p["fc2_z"], p["fc2_a"] = f2[: cfg.fc_dims], f2[cfg.fc_dims:]
    else:
        # aux-less nets never touch the *_a halves, but the kernel's
        # argument list is static — pass zero blocks of the right shape
        p["rnn2_ih_z"], p["fc1_z"], p["fc2_z"] = r2, f1, f2
        p["rnn2_ih_a"] = jnp.zeros((d, 3 * cfg.rnn_dims), r2.dtype)
        p["fc1_a"] = jnp.zeros((d, cfg.fc_dims), f1.dtype)
        p["fc2_a"] = jnp.zeros((d, cfg.fc_dims), f2.dtype)
    p["fc1_b"] = b(params["fc1"]["bias"])
    p["fc2_b"] = b(params["fc2"]["bias"])
    return p


_W_NAMES = (
    "rnn1_ih", "rnn1_hh", "rnn1_bih", "rnn1_bhh",
    "rnn2_ih_z", "rnn2_ih_a", "rnn2_hh", "rnn2_bih", "rnn2_bhh",
    "fc1_z", "fc1_a", "fc1_b", "fc2_z", "fc2_a", "fc2_b",
    "fc3_w", "fc3_b", "w_x",
)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _dot(x, w):
    """x (B, in) @ w (in, out), accumulating in f32 with x cast to the
    weight dtype — the same contraction wavernn._mm performs."""
    return jax.lax.dot_general(
        x.astype(w.dtype), w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gru(x_gates, h, w_hh, b_hh):
    """GRU update from precomputed input gates (torch order r, z, n)."""
    H = h.shape[-1]
    gh = _dot(h, w_hh) + b_hh
    i_r, i_z, i_n = (
        x_gates[:, :H], x_gates[:, H: 2 * H], x_gates[:, 2 * H:],
    )
    h_r, h_z, h_n = gh[:, :H], gh[:, H: 2 * H], gh[:, 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _make_kernel(cfg: WaveRNNConfig, chunk: int):
    pl, _ = _pl()
    d = cfg.aux_dims
    K = cfg.n_classes // 3 if cfg.mode == "MOL" else 0

    def kernel(i_static_ref, a_ref, n1_ref, n2_ref,
               *refs):
        w = dict(zip(_W_NAMES, refs[:len(_W_NAMES)]))
        out_ref = refs[len(_W_NAMES)]
        x_ref, h1_ref, h2_ref = refs[len(_W_NAMES) + 1:]

        # grid = (row_groups, time_chunks), time fastest: a fresh row
        # group starts its own AR chains from zero state
        @pl.when(pl.program_id(1) == 0)
        def _init():
            x_ref[:] = jnp.zeros_like(x_ref)
            h1_ref[:] = jnp.zeros_like(h1_ref)
            h2_ref[:] = jnp.zeros_like(h2_ref)

        w_x = w["w_x"][:]                    # (1, rnn)

        def step(t, _):
            x = x_ref[:, :1]                 # (B, 1) prev sample
            h1 = h1_ref[:]
            h2 = h2_ref[:]
            a_t = a_ref[t]                   # (B, 3d) aux slabs
            # z = I(concat(x, cond)): cond half precomputed/streamed
            z = i_static_ref[t] + x * w_x
            g1 = _dot(z, w["rnn1_ih"][:]) + w["rnn1_bih"][:]
            h1 = _gru(g1, h1, w["rnn1_hh"][:], w["rnn1_bhh"][:])
            z = z + h1
            g2 = _dot(z, w["rnn2_ih_z"][:]) + w["rnn2_bih"][:]
            if cfg.use_aux_net:
                g2 = g2 + _dot(a_t[:, :d], w["rnn2_ih_a"][:])
            h2 = _gru(g2, h2, w["rnn2_hh"][:], w["rnn2_bhh"][:])
            z = z + h2
            f1 = _dot(z, w["fc1_z"][:]) + w["fc1_b"][:]
            if cfg.use_aux_net:
                f1 = f1 + _dot(a_t[:, d: 2 * d], w["fc1_a"][:])
            z = jax.nn.relu(f1)
            f2 = _dot(z, w["fc2_z"][:]) + w["fc2_b"][:]
            if cfg.use_aux_net:
                f2 = f2 + _dot(a_t[:, 2 * d:], w["fc2_a"][:])
            z = jax.nn.relu(f2)
            logits = _dot(z, w["fc3_w"][:]) + w["fc3_b"][:]
            if cfg.mode == "MOL":
                v = logits[:, :K] + n1_ref[t]          # (B, K)
                m = jnp.max(v, axis=-1, keepdims=True)
                # first-max one-hot via iota+min (ties have measure zero
                # with continuous gumbel noise; matches argmax semantics)
                idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                masked = jnp.where(v == m, idx, K)
                amin = jnp.min(masked, axis=-1, keepdims=True)
                onehot = (idx == amin).astype(jnp.float32)
                mean = jnp.sum(
                    logits[:, K: 2 * K] * onehot, axis=-1, keepdims=True
                )
                log_scale = jnp.maximum(
                    jnp.sum(
                        logits[:, 2 * K:] * onehot, axis=-1, keepdims=True
                    ),
                    LOG_SCALE_MIN,
                )
                sample = jnp.clip(
                    mean + jnp.exp(log_scale) * n2_ref[t][:, :1],
                    -1.0, 1.0,
                )                                       # (B, 1)
            else:                                       # GAUSS
                mean = logits[:, :1]
                log_std = jnp.maximum(logits[:, 1:2], -7.0)
                sample = jnp.clip(
                    mean + jnp.exp(log_std) * n2_ref[t][:, :1],
                    -1.0, 1.0,
                )
            x_ref[:, :1] = sample
            h1_ref[:] = h1
            h2_ref[:] = h2
            # out block is (1, chunk, RG): Mosaic requires the LAST TWO
            # block dims to be (8,128)-divisible or full-size, so the
            # row-group axis leads as a size-1 blocked dimension
            out_ref[0, t, :] = sample[:, 0]
            return 0

        jax.lax.fori_loop(0, chunk, step, 0)

    return kernel


def make_pallas_generate(cfg: WaveRNNConfig, B: int, T: int,
                         chunk: int = 32, row_group: int | None = None,
                         interpret: bool = False):
    """Build ``run(split_params, i_static, a_rest, noise1, noise2) ->
    samples (B, T)`` — a drop-in for the scan inside
    ``wavernn._make_generate_scan.run_with_noise`` (same operands, after
    the hoisted conditioning projection; time-major inputs).

    ``T`` must be a multiple of ``chunk`` (callers pad; trailing steps
    generate garbage the fold/unfold already discards).

    One row group (the default, ``row_group=None``) is fastest at every
    measured batch — v5e VMEM (~128 MB, probed) holds the weights plus
    the double-buffered streams for thousands of rows when callers size
    ``chunk`` down with B.  Fold rows are independent AR chains, so an
    explicit smaller ``row_group`` runs them as an outer grid dimension
    (grid = (row_groups, time_chunks), time fastest): each group re-runs
    the time loop from zero state while the weights stay VMEM-resident
    across ALL groups.  That trades serialized time loops for fixed VMEM
    — measured slower, kept as the constrained-memory escape hatch (rows
    pad up to a multiple of ``row_group``; pad rows compute garbage that
    is sliced away).
    """
    if T % chunk:
        raise ValueError(f"T={T} not a multiple of chunk={chunk}")
    pl, pltpu = _pl()
    d3 = 3 * cfg.aux_dims
    K = cfg.n_classes // 3 if cfg.mode == "MOL" else 1
    kernel = _make_kernel(cfg, chunk)
    RG = B if row_group is None else min(B, row_group)
    G = -(-B // RG)
    Bp = G * RG
    grid = (G, T // chunk)

    def chunked(feat):
        # time-major (T, Bp, F): one (chunk, RG, F) block per grid step
        return pl.BlockSpec(
            (chunk, RG) + feat, lambda g, i: (i, g) + (0,) * len(feat),
            memory_space=pltpu.VMEM,
        )

    def whole():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(w: dict, i_static, a_rest, noise1, noise2):
        # noise layouts from _generation_noise: MOL (T,B,K)/(T,B);
        # GAUSS (T,B)/zeros — normalize to (T,B,K)/(T,B,1)
        if noise1.ndim == 2:
            noise1 = noise1[..., None]
        n2 = (noise2 if cfg.mode == "MOL" else noise1[..., 0])[..., None]
        n1 = noise1
        if a_rest.shape[-1] == 0:
            a_rest = jnp.zeros((T, B, d3), jnp.float32)

        def padb(x):
            return (
                x if Bp == B
                else jnp.pad(x, ((0, 0), (0, Bp - B)) + ((0, 0),) * (x.ndim - 2))
            )

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                chunked((cfg.rnn_dims,)),        # i_static
                chunked((d3,)),                  # aux slabs
                chunked((K,)),                   # mixture noise
                chunked((1,)),                   # sample noise
            ] + [whole() for _ in _W_NAMES],
            out_specs=pl.BlockSpec(
                (1, chunk, RG), lambda g, i: (g, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((G, T, RG), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((RG, 8), jnp.float32),              # x
                pltpu.VMEM((RG, cfg.rnn_dims), jnp.float32),   # h1
                pltpu.VMEM((RG, cfg.rnn_dims), jnp.float32),   # h2
            ],
            # the v5e has ~128 MB of VMEM (probed; the conservative
            # compiler default rejects row groups the chip easily holds)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            padb(i_static), padb(a_rest), padb(n1), padb(n2),
            *[w[k] for k in _W_NAMES],
        )
        # (G, T, RG) → (T, G·RG) → (B, T)
        out = jnp.moveaxis(out, 0, 1).reshape(T, Bp)
        return jnp.swapaxes(out[:, :B], 0, 1)

    return run
