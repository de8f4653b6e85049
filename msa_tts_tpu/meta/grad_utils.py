"""Pytree gradient utilities (reference: msa_tts/utils/grad_utils.py —
``mix_grad`` weighted task-gradient averaging and ``apply_grad``
accumulation + norm)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mix_grads(grad_list, weights=None):
    """Weighted average of a list of gradient pytrees (uniform when
    ``weights`` is None)."""
    n = len(grad_list)
    if weights is None:
        weights = [1.0 / n] * n
    else:
        total = sum(weights)
        weights = [w / total for w in weights]

    def combine(*gs):
        return sum(w * g for w, g in zip(weights, gs))

    return jax.tree_util.tree_map(combine, *grad_list)


def mix_grads_stacked(stacked_grads, weights=None):
    """Weighted average over the leading (task) axis of stacked grads —
    the vmap-native counterpart of :func:`mix_grads`."""
    if weights is None:
        return jax.tree_util.tree_map(
            lambda g: jnp.mean(g, axis=0), stacked_grads
        )
    w = jnp.asarray(weights)
    w = w / jnp.sum(w)

    def combine(g):
        return jnp.tensordot(w, g, axes=1)

    return jax.tree_util.tree_map(combine, stacked_grads)


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)
    )


def tree_sub(a, b):
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)
