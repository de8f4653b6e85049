"""Loss-landscape analysis on parameter pytrees.

Replaces the reference's vendored loss-landscapes library
(msa_tts/utils/loss_landscapes/: ModelParameters vector algebra,
``random_plane`` 2-D surfaces with filter/layer/model normalization,
``linear_interpolation`` — main.py:35,232) with direct pytree algebra:
a "direction" is a pytree like the params, and the loss surface is
evaluated by a jitted loss function over perturbed parameters.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tree_rand_like(rng, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(rng, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


def _filter_norms(x: jnp.ndarray) -> jnp.ndarray:
    """Per-filter L2 norm: norm over all dims except the first
    (per-output-channel for conv/linear weights)."""
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(x**2, keepdims=True))
    axes = tuple(range(1, x.ndim))
    return jnp.sqrt(jnp.sum(x**2, axis=axes, keepdims=True))


def normalize_direction(direction, params, mode: str = "filter"):
    """Scale a random direction to match parameter norms (the
    loss-landscapes normalization schemes)."""
    if mode == "filter":
        return jax.tree_util.tree_map(
            lambda d, p: d
            * _filter_norms(p)
            / jnp.maximum(_filter_norms(d), 1e-10),
            direction,
            params,
        )
    if mode == "layer":
        return jax.tree_util.tree_map(
            lambda d, p: d
            * jnp.linalg.norm(p.ravel())
            / jnp.maximum(jnp.linalg.norm(d.ravel()), 1e-10),
            direction,
            params,
        )
    if mode == "model":
        pn = jnp.sqrt(
            sum(
                jnp.sum(l**2)
                for l in jax.tree_util.tree_leaves(params)
            )
        )
        dn = jnp.sqrt(
            sum(
                jnp.sum(l**2)
                for l in jax.tree_util.tree_leaves(direction)
            )
        )
        return jax.tree_util.tree_map(
            lambda d: d * pn / jnp.maximum(dn, 1e-10), direction
        )
    raise ValueError(f"unknown normalization: {mode}")


def random_plane(
    loss_fn: Callable,
    params,
    distance: float = 10.0,
    steps: int = 16,
    normalization: str = "filter",
    rng=None,
) -> np.ndarray:
    """Loss surface on a random 2-D plane through ``params``.

    ``loss_fn(params) -> scalar`` must be jittable.  Matches the
    reference's traversal semantics (start at the corner, step across a
    ``steps × steps`` grid spanning ``distance``).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    d1 = normalize_direction(tree_rand_like(k1, params), params, normalization)
    d2 = normalize_direction(tree_rand_like(k2, params), params, normalization)

    # Center the plane on params: offsets span [-distance/2, +distance/2].
    loss_jit = jax.jit(loss_fn)

    alphas = np.linspace(-0.5, 0.5, steps) * distance
    betas = np.linspace(-0.5, 0.5, steps) * distance
    surface = np.zeros((steps, steps))
    for i, a in enumerate(alphas):
        for j, b in enumerate(betas):
            p = jax.tree_util.tree_map(
                lambda p0, x, y: p0 + a * x + b * y, params, d1, d2
            )
            surface[i, j] = float(loss_jit(p))
    return surface


def linear_interpolation(
    loss_fn: Callable,
    params_start,
    params_end,
    steps: int = 32,
) -> np.ndarray:
    """Loss along the line segment between two parameter sets
    (reference main.py:35-92)."""
    loss_jit = jax.jit(loss_fn)
    out = np.zeros(steps)
    for i, t in enumerate(np.linspace(0.0, 1.0, steps)):
        p = jax.tree_util.tree_map(
            lambda a, b: (1.0 - t) * a + t * b, params_start, params_end
        )
        out[i] = float(loss_jit(p))
    return out


def bezier_path(loss_fn: Callable, params_start, params_end, control,
                steps: int = 32) -> np.ndarray:
    """Loss along a quadratic Bézier curve between two parameter sets
    with one control point (reference contrib/connecting_paths.py
    analog)."""
    loss_jit = jax.jit(loss_fn)
    out = np.zeros(steps)
    for i, t in enumerate(np.linspace(0.0, 1.0, steps)):
        a, b, c = (1 - t) ** 2, 2 * (1 - t) * t, t**2
        p = jax.tree_util.tree_map(
            lambda s, m, e: a * s + b * m + c * e,
            params_start, control, params_end,
        )
        out[i] = float(loss_jit(p))
    return out


def polygon_path(loss_fn: Callable, waypoints: list,
                 steps_per_segment: int = 16) -> np.ndarray:
    """Loss along the piecewise-linear path through ``waypoints``
    (reference contrib polygon-chain analog)."""
    segments = [
        linear_interpolation(loss_fn, a, b, steps_per_segment)
        for a, b in zip(waypoints[:-1], waypoints[1:])
    ]
    return np.concatenate(segments)


def trajectory_distances(param_history: list) -> np.ndarray:
    """L2 distances of a parameter trajectory from its start (the
    reference's trajectory-tracker analog, contrib/trajectories.py)."""
    start = param_history[0]
    out = []
    for p in param_history:
        d = jnp.sqrt(
            sum(
                jnp.sum((a - b) ** 2)
                for a, b in zip(
                    jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(start),
                )
            )
        )
        out.append(float(d))
    return np.asarray(out)


class TrajectoryTracker:
    """Base optimization-trajectory tracker (reference
    contrib/trajectories.py:13 — abstract __getitem__/get_item/
    get_trajectory/save_position surface), pytree-native: positions
    are parameter pytrees, stored as flat float32 vectors."""

    def __getitem__(self, timestep: int) -> np.ndarray:
        raise NotImplementedError

    def get_item(self, timestep: int) -> np.ndarray:
        return self[timestep]

    def get_trajectory(self) -> list:
        raise NotImplementedError

    def save_position(self, params) -> None:
        raise NotImplementedError

    @staticmethod
    def _flatten(params) -> np.ndarray:
        return np.concatenate(
            [np.asarray(l, np.float32).ravel()
             for l in jax.tree_util.tree_leaves(params)]
        )


class FullTrajectoryTracker(TrajectoryTracker):
    """Stores the full parameter vector per timestep, spilled to
    ``directory/<idx>.npy`` instead of kept in memory (reference
    contrib/trajectories.py:56 FullTrajectoryTracker).  Unlike the
    reference, construction does NOT implicitly save a position —
    call ``save_position`` explicitly per logged step."""

    def __init__(self, directory: str):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.next_idx = 0

    def __getitem__(self, timestep: int) -> np.ndarray:
        import os

        if not 0 <= timestep < self.next_idx:
            raise IndexError("Given timestep does not exist.")
        return np.load(os.path.join(self.dir, f"{timestep}.npy"))

    def save_position(self, params) -> None:
        import os

        np.save(
            os.path.join(self.dir, f"{self.next_idx}.npy"),
            self._flatten(params),
        )
        self.next_idx += 1

    def get_trajectory(self) -> list:
        return [self[i] for i in range(self.next_idx)]


class ProjectingTrajectoryTracker(TrajectoryTracker):
    """Projects each position onto ``n_bases`` fixed random directions
    at storage time (least squares — reference
    contrib/trajectories.py:93), so tracking an N-step trajectory of an
    M-parameter model costs N·n_bases floats instead of N·M."""

    def __init__(self, params, rng, n_bases: int = 2):
        n = int(self._flatten(params).size)
        self.A = np.asarray(
            jax.random.normal(rng, (n, n_bases)), np.float64
        )
        self.trajectory: list[np.ndarray] = []

    def __getitem__(self, timestep: int) -> np.ndarray:
        return self.trajectory[timestep]

    def save_position(self, params) -> None:
        b = self._flatten(params).astype(np.float64)
        self.trajectory.append(
            np.linalg.lstsq(self.A, b, rcond=None)[0]
        )

    def get_trajectory(self) -> list:
        return self.trajectory


# ---------------------------------------------------------------------------
# Metric library (reference metrics/{metric,sl_metrics,rl_metrics}.py)
# ---------------------------------------------------------------------------
# The reference's vendored library ships a small Metric hierarchy whose
# live surface is Loss / LossGradient / LossPerturbations
# (sl_metrics.py:18-75) plus ExpectedReturnMetric (rl_metrics.py:6-31);
# everything else in sl_metrics.py is commented out upstream.  Here a
# metric is simply a callable over a parameter PYTREE (the framework's
# landscape currency) rather than a torch ModelWrapper, and the
# supervised metrics close over a jittable ``loss_fn(params) -> scalar``
# the same way random_plane/linear_interpolation do — inputs/targets are
# baked into the closure, which is the jit-friendly equivalent of the
# reference's (loss_fn, inputs, target) triple.


class Metric:
    """A quantity evaluated at a point in parameter space
    (reference metric.py:8-26)."""

    def __call__(self, params):
        raise NotImplementedError


class Loss(Metric):
    """The loss value at ``params`` (reference sl_metrics.py:18-27)."""

    def __init__(self, loss_fn: Callable):
        self._loss = jax.jit(loss_fn)

    def __call__(self, params) -> float:
        return float(self._loss(params))


class LossGradient(Metric):
    """The flattened loss gradient at ``params`` (reference
    sl_metrics.py:30-43) — one reverse-mode pass, returned as a single
    numpy vector like the reference's concatenated ``named_parameters``
    gradient."""

    def __init__(self, loss_fn: Callable):
        self._grad = jax.jit(jax.grad(loss_fn))

    def __call__(self, params) -> np.ndarray:
        g = self._grad(params)
        leaves = jax.tree_util.tree_leaves(g)
        return np.concatenate([np.asarray(l).ravel() for l in leaves])


class LossPerturbations(Metric):
    """Loss deltas along ``n_directions`` random directions scaled by
    ``alpha`` (reference sl_metrics.py:46-75 — probabilistic curvature
    probing after Schuurmans et al.).  All directions are evaluated in
    ONE jitted vmap over a stacked direction tree instead of the
    reference's sequential add/eval/subtract loop — the perturbed
    evaluations are independent, so they batch onto the MXU."""

    def __init__(self, loss_fn: Callable, n_directions: int = 8,
                 alpha: float = 1.0, rng=None):
        self.n_directions = int(n_directions)
        self.alpha = float(alpha)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        def perturbed(params, dirs):
            def one(d):
                p = jax.tree_util.tree_map(
                    lambda p0, x: p0 + self.alpha * x, params, d
                )
                return loss_fn(p)

            return jax.vmap(one)(dirs), loss_fn(params)

        self._perturbed = jax.jit(perturbed)

    def __call__(self, params) -> np.ndarray:
        # One stacked random direction tree per call: each direction is
        # an independent tree_rand_like draw (a fresh key per LEAF per
        # direction — reusing one key per direction would hand identical
        # perturbations to same-shaped leaves).
        keys = jax.random.split(self._rng, self.n_directions)
        per_dir = [tree_rand_like(k, params) for k in keys]
        dirs = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *per_dir
        )
        losses, base = self._perturbed(params, dirs)
        return np.asarray(losses) - float(base)


class ExpectedReturn(Metric):
    """Average episodic return of ``policy_fn(params, obs) -> action``
    over ``n_episodes`` rollouts (reference rl_metrics.py:6-31).  The
    environment is duck-typed on the gym step API — ``reset() -> obs``
    and ``step(action) -> (obs, reward, done, info)`` — so no gym
    dependency is required; rollouts are host-driven because episode
    length is data-dependent (the environment is external Python, not a
    traceable program)."""

    def __init__(self, environment, policy_fn: Callable,
                 n_episodes: int = 1):
        self.environment = environment
        self.policy_fn = policy_fn
        self.n_episodes = int(n_episodes)

    def __call__(self, params) -> float:
        returns = []
        for _ in range(self.n_episodes):
            obs = self.environment.reset()
            total, done = 0.0, False
            while not done:
                action = self.policy_fn(params, jnp.asarray(obs))
                obs, reward, done, _ = self.environment.step(
                    np.asarray(action)
                )
                total += float(reward)
            returns.append(total)
        return sum(returns) / len(returns)
