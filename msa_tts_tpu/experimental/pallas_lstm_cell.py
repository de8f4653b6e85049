"""Fused LSTM-cell Pallas TPU kernel — RETIRED from the hot path.

Measured on TPU v5e (benchmarks/pallas_lstm.py, B=16, H=1024, 400-step
scan, bit-identical checksums across all variants):

    xla/fp32 66.1 us/step | xla/bf16 76.1 | pallas/fp32 101.7 | pallas/bf16 100.8

XLA's own fusion wins at this shape even against the bf16-weight
variant, so the model uses the XLA path (ops/rnn.py) and this kernel
lives in experimental/ as a correctness-tested starting point for
future shapes where a hand-written kernel might pay off.

One kernel per decoder step fuses the recurrent matmul (MXU) with the
gate nonlinearities and state update (VPU), so the (B, 4H) gate
pre-activations never round-trip HBM.  The input projection
``x @ W_ih^T + b`` is precomputed outside (for scans it is hoisted into
one large batched matmul — see ops/rnn.py).

Weight layout: ``w_hh_t`` is the *transposed* recurrent weight
``(H, 4H)`` (gates i,f,g,o along the second axis), which makes the
kernel's matmul contiguous: ``gates = h @ w_hh_t``.

A pure-XLA fallback with identical semantics is used on non-TPU
platforms (and under ``interpret=True`` in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; kernels only run on TPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_proj_ref, h_ref, c_ref, w_ref, h_out_ref, c_out_ref):
    """Grid: (num_hblocks,).  Block j computes columns [j·HB, (j+1)·HB)
    of the new hidden/cell state.

    Refs (per block):
      x_proj: (B, 4·HB)  — the 4 gate slices for this block, concatenated
      h:      (B, H)     — full previous hidden state
      w:      (H, 4·HB)  — recurrent weights for this block's gates
      h_out/c_out: (B, HB)
      c:      (B, HB)    — previous cell state slice
    """
    # cast h to the weights' dtype (bf16-weight variant halves the HBM
    # weight traffic, the bandwidth floor of the step); accumulate f32
    gates = x_proj_ref[:] + jnp.dot(
        h_ref[:].astype(w_ref.dtype), w_ref[:],
        preferred_element_type=jnp.float32,
    )
    hb = h_out_ref.shape[1]
    i = jax.nn.sigmoid(gates[:, :hb])
    f = jax.nn.sigmoid(gates[:, hb : 2 * hb])
    g = jnp.tanh(gates[:, 2 * hb : 3 * hb])
    o = jax.nn.sigmoid(gates[:, 3 * hb :])
    c_new = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c_new)
    c_out_ref[:] = c_new


def prepare_weights(params: dict) -> dict:
    """Convert torch-layout LSTM params to the kernel's layout:
    ``w_hh_t`` (H, 4H) and fused bias folded into the input projection.

    Returns {"w_ih": (4H, in), "bias": (4H,), "w_hh_t": (H, 4H)}.
    """
    return {
        "w_ih": params["weight_ih"],
        "bias": params["bias_ih"] + params["bias_hh"],
        "w_hh_t": params["weight_hh"].T,
    }


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def fused_lstm_cell(
    x_proj: jax.Array,
    h: jax.Array,
    c: jax.Array,
    w_hh_t: jax.Array,
    *,
    block_h: int = 256,
    interpret: bool = False,
):
    """One LSTM step with fused matmul+gates.

    Args:
      x_proj: (B, 4H) input projection incl. both biases.
      h, c:   (B, H) previous states.
      w_hh_t: (H, 4H) transposed recurrent weights.

    Returns (h_new, c_new), each (B, H).
    """
    B, H = h.shape
    HB = min(block_h, H)
    assert H % HB == 0, (H, HB)
    n_blocks = H // HB

    # Gather the 4 gate slices for block j contiguously: build an index
    # map via reshaping w to (H, 4, H) → (H, 4, n_blocks, HB).
    w4 = w_hh_t.reshape(H, 4, n_blocks, HB)
    w_blocks = (
        w4.transpose(2, 0, 1, 3).reshape(n_blocks, H, 4 * HB)
    )
    x4 = x_proj.reshape(B, 4, n_blocks, HB)
    x_blocks = x4.transpose(2, 0, 1, 3).reshape(n_blocks, B, 4 * HB)
    c_blocks = c.reshape(B, n_blocks, HB).transpose(1, 0, 2)

    grid = (n_blocks,)
    h_out, c_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, B, 4 * HB), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
            pl.BlockSpec(
                (B, H), lambda j: (0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
            pl.BlockSpec(
                (None, B, HB), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
            pl.BlockSpec(
                (None, H, 4 * HB), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (None, B, HB), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
            pl.BlockSpec(
                (None, B, HB), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM if pltpu else None,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, B, HB), h.dtype),
            jax.ShapeDtypeStruct((n_blocks, B, HB), h.dtype),
        ],
        interpret=interpret,
    )(x_blocks, h, c_blocks, w_blocks)
    h_out = h_out.transpose(1, 0, 2).reshape(B, H)
    c_out = c_out.transpose(1, 0, 2).reshape(B, H)
    return h_out, c_out


def lstm_cell_reference(x_proj, h, c, w_hh_t):
    """XLA fallback with identical math (used off-TPU)."""
    gates = x_proj + jax.lax.dot(
        h.astype(w_hh_t.dtype), w_hh_t,
        preferred_element_type=jnp.float32,
    )
    H = h.shape[1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new
