"""Train state and optimizer factory.

The optimizer factory accepts the reference's config vocabulary
(``{"optimizer_type": "Adam", "lr": "1e-3", ...}`` with torch.optim
names and possibly stringified values — msa_tts/utils/helpers.py:20-26)
and builds the matching optax chain with torch-equivalent semantics
(e.g. Adam's ``weight_decay`` is L2-to-gradient, not AdamW decay).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from .config import parse_optim_params


class TrainState(NamedTuple):
    params: Any
    model_state: Any      # batch-norm statistics
    opt_state: Any
    step: int


def _as_betas(value, default=(0.9, 0.999)):
    if value is None:
        return default
    return tuple(value)


def make_optimizer(optim_cfg: dict) -> optax.GradientTransformation:
    """Build an optax optimizer from a reference-style config section."""
    name, kw = parse_optim_params(optim_cfg)
    name = name.lower()
    lr = float(kw.pop("lr", 1e-3))
    weight_decay = float(kw.pop("weight_decay", 0.0))
    chain = []
    if name == "adam":
        betas = _as_betas(kw.pop("betas", None))
        eps = float(kw.pop("eps", 1e-8))
        amsgrad = bool(kw.pop("amsgrad", False))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        scale_fn = (
            optax.scale_by_amsgrad if amsgrad else optax.scale_by_adam
        )
        chain.append(scale_fn(b1=betas[0], b2=betas[1], eps=eps))
    elif name == "adamw":
        betas = _as_betas(kw.pop("betas", None))
        eps = float(kw.pop("eps", 1e-8))
        amsgrad = bool(kw.pop("amsgrad", False))
        scale_fn = (
            optax.scale_by_amsgrad if amsgrad else optax.scale_by_adam
        )
        chain.append(scale_fn(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif name == "sgd":
        momentum = float(kw.pop("momentum", 0.0))
        nesterov = bool(kw.pop("nesterov", False))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        elif nesterov:
            raise ValueError("SGD nesterov requires momentum > 0")
    elif name == "rmsprop":
        alpha = float(kw.pop("alpha", 0.99))
        eps = float(kw.pop("eps", 1e-8))
        momentum = float(kw.pop("momentum", 0.0))
        centered = bool(kw.pop("centered", False))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        # centered → grad-stddev normalization (torch centered=True);
        # momentum → torch's post-normalization velocity buffer
        if centered:
            chain.append(optax.scale_by_stddev(decay=alpha, eps=eps))
        else:
            chain.append(optax.scale_by_rms(decay=alpha, eps=eps))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if kw:
        # silently dropping a torch option (nesterov, amsgrad, ...)
        # would make training dynamics diverge from the reference run
        # the config was copied from with no signal
        raise ValueError(
            f"unsupported {name} optimizer option(s): {sorted(kw)}"
        )
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm gradient clipping; returns (clipped, pre-clip norm).

    Note the reference calls torch's clip *before* ``backward()``
    (msa_tts/baseline.py:209-214), clipping the previous step's stale
    gradients — we clip the freshly computed ones (the intended
    behavior)."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm
