"""Speaker-identity classifier for evaluating synthesized audio.

Reference: msa_tts/utils/spk_cls/ — a 2-layer MLP over 256-d d-vectors
(spk_cls_model.py:5-18), trained once per continual-stream prefix
(1..N speakers) so synthesized audio can be scored for speaker identity
(train_spk_cls.py:39-146).  Functional JAX: one jitted Adam training
loop over the in-memory embedding table.
"""

from __future__ import annotations

import pickle
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax


def init_spk_cls(rng, emb_size: int, hidden_size: int, num_cls: int):
    import math

    k1, k2 = jax.random.split(rng)

    def torch_linear(k, i, o):
        a = 1.0 / math.sqrt(i)
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(kw, (o, i), jnp.float32, -a, a),
            "bias": jax.random.uniform(kb, (o,), jnp.float32, -a, a),
        }

    return {
        "linear1": torch_linear(k1, emb_size, hidden_size),
        "linear2": torch_linear(k2, hidden_size, num_cls),
    }


def spk_cls_logits(params, x):
    h = jax.nn.relu(x @ params["linear1"]["weight"].T + params["linear1"]["bias"])
    return h @ params["linear2"]["weight"].T + params["linear2"]["bias"]


def spk_cls_forward(params, x):
    """Softmax posterior (the reference applies softmax in forward)."""
    return jax.nn.softmax(spk_cls_logits(params, x), axis=-1)


def train_classifier(
    embs: np.ndarray,
    labels: np.ndarray,
    num_cls: int,
    *,
    hidden_size: int = 256,
    n_epochs: int = 50,
    batch_size: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Train one classifier; returns (params, train_acc_history)."""
    rng = jax.random.PRNGKey(seed)
    params = init_spk_cls(rng, embs.shape[1], hidden_size, num_cls)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = spk_cls_logits(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(embs)
    np_rng = np.random.default_rng(seed)
    accs = []
    for epoch in range(n_epochs):
        order = np_rng.permutation(n)
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(embs[sel]), jnp.asarray(labels[sel]),
            )
        pred = np.asarray(
            jnp.argmax(spk_cls_logits(params, jnp.asarray(embs)), axis=-1)
        )
        accs.append(float((pred == labels).mean()))
    return params, accs


def evaluate(params, embs: np.ndarray, labels: np.ndarray) -> float:
    pred = np.asarray(
        jnp.argmax(spk_cls_logits(params, jnp.asarray(embs)), axis=-1)
    )
    return float((pred == labels).mean())


def train_spk_cls(params: dict):
    """Stream-prefix protocol (reference train_spk_cls.py:39-146): for
    each prefix of the shuffled speaker list train a classifier on the
    per-utterance embeddings and report train/test accuracy.

    ``spk_emb.pkl`` layout: {speaker: {utterance_id: emb, ...}} (the
    per-utterance variant) — the "mean" key, if present, is excluded.
    Returns {prefix_len: {"train_acc", "test_acc", "speakers"}}.
    """
    with open(params["spk_emb_path"], "rb") as f:
        spk_embs = pickle.load(f)

    speakers = list(params["dataset_train"]["speakers_list"])
    random.Random(int(params.get("spk_seed", 0))).shuffle(speakers)
    print("Target speakers in order:")
    print(speakers)

    perc_train = float(params.get("perc_train", 0.9))
    results = {}
    for prefix in range(1, len(speakers) + 1):
        target = speakers[:prefix]
        spk_to_id = {s: i for i, s in enumerate(target)}
        tr_x, tr_y, te_x, te_y = [], [], [], []
        for spk in target:
            elements = [
                k for k in spk_embs[spk].keys() if k != "mean"
            ]
            random.Random(prefix).shuffle(elements)
            cut = int(perc_train * len(elements))
            for e in elements[:cut]:
                tr_x.append(np.asarray(spk_embs[spk][e], np.float32))
                tr_y.append(spk_to_id[spk])
            for e in elements[cut:]:
                te_x.append(np.asarray(spk_embs[spk][e], np.float32))
                te_y.append(spk_to_id[spk])
        tr_x, tr_y = np.stack(tr_x), np.asarray(tr_y)
        cls_params, accs = train_classifier(
            tr_x, tr_y, num_cls=prefix,
            hidden_size=int(params.get("hidden_size", 256)),
            n_epochs=int(params.get("n_epochs_cls", 50)),
            seed=int(params.get("spk_seed", 0)),
        )
        test_acc = (
            evaluate(cls_params, np.stack(te_x), np.asarray(te_y))
            if te_x
            else float("nan")
        )
        results[prefix] = {
            "train_acc": accs[-1],
            "test_acc": test_acc,
            "speakers": target,
        }
        print(
            f"prefix {prefix}: train_acc={accs[-1]:.3f} "
            f"test_acc={test_acc:.3f}"
        )
    return results
