"""Import reference PyTorch Tacotron2NV checkpoints into our param pytrees.

The reference saves plain ``model.state_dict()`` files
(msa_tts/baseline.py:131-134).  Because our parameter layouts are
torch-compatible by construction (ops/nn.py), importing is a pure
key-mapping; this both gives users a migration path for trained
checkpoints and lets tests validate bit-level output parity against the
reference model.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from ..models.tacotron2nv import ModelConfig


def _np(t):
    """torch.Tensor | np.ndarray → np.float32 array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def state_dict_to_pytrees(sd: Mapping[str, "np.ndarray"], cfg: ModelConfig):
    """Convert a reference ``state_dict`` to ``(params, state)``.

    ``sd`` maps the reference's parameter names to tensors/arrays.
    Unknown keys are ignored with a warning list returned as third value.
    """
    import jax.numpy as jnp

    get = lambda k: jnp.asarray(_np(sd[k]))

    params: dict = {"embedding": {"weight": get("embedding.weight")}}
    state: dict = {}

    # ---- encoder convs + batchnorm
    n_enc = cfg.encoder_n_convolutions
    enc_convs, enc_bn_state = [], []
    for i in range(n_enc):
        base = f"encoder.convolutions.{i}"
        enc_convs.append(
            {
                "conv": {
                    "weight": get(f"{base}.0.conv.weight"),
                    "bias": get(f"{base}.0.conv.bias"),
                },
                "bn": {
                    "weight": get(f"{base}.1.weight"),
                    "bias": get(f"{base}.1.bias"),
                },
            }
        )
        enc_bn_state.append(
            {
                "running_mean": get(f"{base}.1.running_mean"),
                "running_var": get(f"{base}.1.running_var"),
            }
        )
    lstm = {
        "forward": {
            "weight_ih": get("encoder.lstm.weight_ih_l0"),
            "weight_hh": get("encoder.lstm.weight_hh_l0"),
            "bias_ih": get("encoder.lstm.bias_ih_l0"),
            "bias_hh": get("encoder.lstm.bias_hh_l0"),
        },
        "backward": {
            "weight_ih": get("encoder.lstm.weight_ih_l0_reverse"),
            "weight_hh": get("encoder.lstm.weight_hh_l0_reverse"),
            "bias_ih": get("encoder.lstm.bias_ih_l0_reverse"),
            "bias_hh": get("encoder.lstm.bias_hh_l0_reverse"),
        },
    }
    params["encoder"] = {"convolutions": enc_convs, "lstm": lstm}
    state["encoder"] = {"convolutions": enc_bn_state}

    # ---- speaker conditioning
    if cfg.speaker_emb_type == "learnable_lookup":
        params["speaker_embedder"] = {
            "weight": get("speaker_embedder.weight")
        }
    elif cfg.speaker_emb_type == "static+linear":
        params["speaker_lin"] = {
            "weight": get("speaker_lin.weight"),
            "bias": get("speaker_lin.bias"),
        }

    # ---- decoder
    dec: dict = {}
    dec["prenet"] = {
        "layers": [
            {"weight": get(f"decoder.prenet.layers.{i}.linear_layer.weight")}
            for i in range(2)
        ]
    }
    for rnn_name in ("attention_rnn", "decoder_rnn"):
        dec[rnn_name] = {
            "weight_ih": get(f"decoder.{rnn_name}.weight_ih"),
            "weight_hh": get(f"decoder.{rnn_name}.weight_hh"),
            "bias_ih": get(f"decoder.{rnn_name}.bias_ih"),
            "bias_hh": get(f"decoder.{rnn_name}.bias_hh"),
        }

    attn_type = cfg.attention_params["attention_type"]
    al = "decoder.attention_layer"
    if attn_type == "ForwardAttention":
        attn = {
            "query_layer": {
                "weight": get(f"{al}.query_layer.linear_layer.weight")
            },
            "inputs_layer": {
                "weight": get(f"{al}.inputs_layer.linear_layer.weight")
            },
            "v": {
                "weight": get(f"{al}.v.linear_layer.weight"),
                "bias": get(f"{al}.v.linear_layer.bias"),
            },
        }
        if f"{al}.ta.weight" in sd:
            attn["ta"] = {
                "weight": get(f"{al}.ta.weight"),
                "bias": get(f"{al}.ta.bias"),
            }
        if f"{al}.location_layer.location_conv1d.weight" in sd:
            attn["location_layer"] = {
                "location_conv1d": {
                    "weight": get(
                        f"{al}.location_layer.location_conv1d.weight"
                    )
                },
                "location_dense": {
                    "weight": get(
                        f"{al}.location_layer.location_dense."
                        "linear_layer.weight"
                    )
                },
            }
    else:  # LSA
        attn = {
            "query_layer": {
                "weight": get(f"{al}.query_layer.linear_layer.weight")
            },
            "memory_layer": {
                "weight": get(f"{al}.memory_layer.linear_layer.weight")
            },
            "v": {"weight": get(f"{al}.v.linear_layer.weight")},
            "location_layer": {
                "location_conv1d": {
                    "weight": get(
                        f"{al}.location_layer.location_conv.conv.weight"
                    )
                },
                "location_dense": {
                    "weight": get(
                        f"{al}.location_layer.location_dense."
                        "linear_layer.weight"
                    )
                },
            },
        }
    dec["attention_layer"] = attn
    dec["linear_projection"] = {
        "weight": get("decoder.linear_projection.linear_layer.weight"),
        "bias": get("decoder.linear_projection.linear_layer.bias"),
    }
    dec["gate_layer"] = {
        "weight": get("decoder.gate_layer.linear_layer.weight"),
        "bias": get("decoder.gate_layer.linear_layer.bias"),
    }
    params["decoder"] = dec

    # ---- postnet
    post_convs, post_bn_state = [], []
    i = 0
    while f"postnet.convolutions.{i}.0.conv.weight" in sd:
        base = f"postnet.convolutions.{i}"
        post_convs.append(
            {
                "conv": {
                    "weight": get(f"{base}.0.conv.weight"),
                    "bias": get(f"{base}.0.conv.bias"),
                },
                "bn": {
                    "weight": get(f"{base}.1.weight"),
                    "bias": get(f"{base}.1.bias"),
                },
            }
        )
        post_bn_state.append(
            {
                "running_mean": get(f"{base}.1.running_mean"),
                "running_var": get(f"{base}.1.running_var"),
            }
        )
        i += 1
    params["postnet"] = {"convolutions": post_convs}
    state["postnet"] = {"convolutions": post_bn_state}

    return params, state


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``.pt`` state_dict checkpoint from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_pytrees(sd, cfg)


def pytrees_to_state_dict(params, state, cfg: ModelConfig) -> dict:
    """Inverse of :func:`state_dict_to_pytrees`: export our pytrees as a
    reference-layout ``state_dict`` (numpy arrays), so models trained
    here can be consumed by reference tooling."""
    sd: dict = {"embedding.weight": _np(params["embedding"]["weight"])}

    for i, (layer, bn_s) in enumerate(
        zip(
            params["encoder"]["convolutions"],
            state["encoder"]["convolutions"],
        )
    ):
        base = f"encoder.convolutions.{i}"
        sd[f"{base}.0.conv.weight"] = _np(layer["conv"]["weight"])
        sd[f"{base}.0.conv.bias"] = _np(layer["conv"]["bias"])
        sd[f"{base}.1.weight"] = _np(layer["bn"]["weight"])
        sd[f"{base}.1.bias"] = _np(layer["bn"]["bias"])
        sd[f"{base}.1.running_mean"] = _np(bn_s["running_mean"])
        sd[f"{base}.1.running_var"] = _np(bn_s["running_var"])
        sd[f"{base}.1.num_batches_tracked"] = np.zeros((), np.int64)

    for direction, suffix in (("forward", ""), ("backward", "_reverse")):
        p = params["encoder"]["lstm"][direction]
        for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"encoder.lstm.{k}_l0{suffix}"] = _np(p[k])

    if cfg.speaker_emb_type == "learnable_lookup":
        sd["speaker_embedder.weight"] = _np(
            params["speaker_embedder"]["weight"]
        )
    elif cfg.speaker_emb_type == "static+linear":
        sd["speaker_lin.weight"] = _np(params["speaker_lin"]["weight"])
        sd["speaker_lin.bias"] = _np(params["speaker_lin"]["bias"])

    dec = params["decoder"]
    for i, layer in enumerate(dec["prenet"]["layers"]):
        sd[f"decoder.prenet.layers.{i}.linear_layer.weight"] = _np(
            layer["weight"]
        )
    for rnn in ("attention_rnn", "decoder_rnn"):
        for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"decoder.{rnn}.{k}"] = _np(dec[rnn][k])

    attn = dec["attention_layer"]
    al = "decoder.attention_layer"
    if cfg.attention_params["attention_type"] == "ForwardAttention":
        sd[f"{al}.query_layer.linear_layer.weight"] = _np(
            attn["query_layer"]["weight"]
        )
        sd[f"{al}.inputs_layer.linear_layer.weight"] = _np(
            attn["inputs_layer"]["weight"]
        )
        sd[f"{al}.v.linear_layer.weight"] = _np(attn["v"]["weight"])
        sd[f"{al}.v.linear_layer.bias"] = _np(attn["v"]["bias"])
        if "ta" in attn:
            sd[f"{al}.ta.weight"] = _np(attn["ta"]["weight"])
            sd[f"{al}.ta.bias"] = _np(attn["ta"]["bias"])
        if "location_layer" in attn:
            sd[f"{al}.location_layer.location_conv1d.weight"] = _np(
                attn["location_layer"]["location_conv1d"]["weight"]
            )
            sd[
                f"{al}.location_layer.location_dense.linear_layer.weight"
            ] = _np(attn["location_layer"]["location_dense"]["weight"])
    else:
        sd[f"{al}.query_layer.linear_layer.weight"] = _np(
            attn["query_layer"]["weight"]
        )
        sd[f"{al}.memory_layer.linear_layer.weight"] = _np(
            attn["memory_layer"]["weight"]
        )
        sd[f"{al}.v.linear_layer.weight"] = _np(attn["v"]["weight"])
        sd[f"{al}.location_layer.location_conv.conv.weight"] = _np(
            attn["location_layer"]["location_conv1d"]["weight"]
        )
        sd[
            f"{al}.location_layer.location_dense.linear_layer.weight"
        ] = _np(attn["location_layer"]["location_dense"]["weight"])

    sd["decoder.linear_projection.linear_layer.weight"] = _np(
        dec["linear_projection"]["weight"]
    )
    sd["decoder.linear_projection.linear_layer.bias"] = _np(
        dec["linear_projection"]["bias"]
    )
    sd["decoder.gate_layer.linear_layer.weight"] = _np(
        dec["gate_layer"]["weight"]
    )
    sd["decoder.gate_layer.linear_layer.bias"] = _np(
        dec["gate_layer"]["bias"]
    )

    for i, (layer, bn_s) in enumerate(
        zip(
            params["postnet"]["convolutions"],
            state["postnet"]["convolutions"],
        )
    ):
        base = f"postnet.convolutions.{i}"
        sd[f"{base}.0.conv.weight"] = _np(layer["conv"]["weight"])
        sd[f"{base}.0.conv.bias"] = _np(layer["conv"]["bias"])
        sd[f"{base}.1.weight"] = _np(layer["bn"]["weight"])
        sd[f"{base}.1.bias"] = _np(layer["bn"]["bias"])
        sd[f"{base}.1.running_mean"] = _np(bn_s["running_mean"])
        sd[f"{base}.1.running_var"] = _np(bn_s["running_var"])
        sd[f"{base}.1.num_batches_tracked"] = np.zeros((), np.int64)
    return sd


def save_torch_checkpoint(path: str, params, state, cfg: ModelConfig):
    """Write a reference-consumable ``.pt`` checkpoint."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in pytrees_to_state_dict(params, state, cfg).items()
    }
    torch.save(sd, path)
