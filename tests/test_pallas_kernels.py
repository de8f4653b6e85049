"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msa_tts_tpu.ops import rnn as R
from msa_tts_tpu.experimental.pallas_lstm_cell import (
    fused_lstm_cell,
    lstm_cell_reference,
    prepare_weights,
)


@pytest.mark.parametrize("B,H,block_h", [(4, 256, 128), (8, 512, 256)])
def test_fused_lstm_cell_matches_reference(B, H, block_h, np_rng):
    params = R.init_lstm_cell(jax.random.PRNGKey(0), H, H)
    prep = prepare_weights(params)
    x = jnp.asarray(np_rng.standard_normal((B, H)), dtype=jnp.float32)
    h = jnp.asarray(np_rng.standard_normal((B, H)), dtype=jnp.float32)
    c = jnp.asarray(np_rng.standard_normal((B, H)), dtype=jnp.float32)

    x_proj = x @ prep["w_ih"].T + prep["bias"]

    # Oracle 1: the plain torch-layout cell
    h_ref, c_ref = R.lstm_cell(params, x, (h, c))
    # Oracle 2: the XLA fallback
    h_fb, c_fb = lstm_cell_reference(x_proj, h, c, prep["w_hh_t"])
    np.testing.assert_allclose(
        np.asarray(h_fb), np.asarray(h_ref), atol=1e-5
    )

    # Pallas kernel in interpreter mode
    h_k, c_k = fused_lstm_cell(
        x_proj, h, c, prep["w_hh_t"], block_h=block_h, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(h_k), np.asarray(h_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_k), np.asarray(c_ref), atol=1e-5
    )
