"""Differentiable inner-loop adaptation.

Replaces the reference's ``higher.innerloop_ctx`` mechanism
(msa_tts/maml.py:40-54): the inner optimizer is a pure optax transform,
the k-step loop is a ``lax.scan``, and second-order MAML gradients come
for free from ``jax.grad`` through the scan — no functional-model
monkey-patching.  Each inner step is wrapped in ``jax.checkpoint`` so
grad-of-grad through the scanned AR decoder rematerializes instead of
storing every step's activations.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def make_inner_optimizer(optim_cfg: dict) -> optax.GradientTransformation:
    from ..optim import make_optimizer

    return make_optimizer(optim_cfg)


def make_adapt_fn(
    loss_fn: Callable,
    inner_tx: optax.GradientTransformation,
    n_steps: int,
    *,
    remat: bool = True,
    grad_pmean_axis=None,
):
    """Build ``adapt(params, model_state, batch, rng)``.

    ``loss_fn(params, model_state, batch, rng) -> (loss, new_model_state)``
    must be pure.  Returns ``(adapted_params, model_state, losses)`` with
    ``losses`` the per-step inner losses (shape ``(n_steps,)``).

    The returned function is differentiable w.r.t. ``params`` — take
    ``jax.grad`` through it for second-order MAML, or stop gradients at
    its output for first-order variants.  Safe under ``vmap`` over a
    task axis (the batch is part of the scan carry, no hidden state).

    ``grad_pmean_axis``: mesh axis name (or tuple of names) to pmean the
    inner gradients and losses over each step.  Used under ``shard_map``
    when a task's support shots are sharded across that axis — every
    shard then computes identical adapted params (see
    parallel/shard_meta.py).
    """

    def one_step(carry, rng_t):
        params, opt_state, model_state, batch = carry

        def step_loss(p):
            loss, new_ms = loss_fn(p, model_state, batch, rng_t)
            return loss, new_ms

        (loss, new_ms), grads = jax.value_and_grad(
            step_loss, has_aux=True
        )(params)
        if grad_pmean_axis is not None:
            grads = jax.lax.pmean(grads, grad_pmean_axis)
            loss = jax.lax.pmean(loss, grad_pmean_axis)
        updates, opt_state = inner_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, new_ms, batch), loss

    step_fn = jax.checkpoint(one_step) if remat else one_step

    def adapt(params, model_state, batch, rng):
        opt_state = inner_tx.init(params)
        keys = jax.random.split(rng, n_steps)
        (adapted, _, final_ms, _), losses = jax.lax.scan(
            step_fn, (params, opt_state, model_state, batch), keys
        )
        return adapted, final_ms, losses

    return adapt
