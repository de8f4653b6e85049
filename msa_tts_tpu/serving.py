"""High-level few-shot TTS serving API.

A deployment-oriented wrapper over the framework (beyond the reference's
script-only interface): load a trained checkpoint once, adapt to a new
speaker from a handful of reference clips in one compiled call
(~0.26 s on a v5e chip — see BENCHMARKS.md), then synthesize arbitrary
text as that speaker.

    tts = AdaptiveTTS.from_experiment("output/maml/vctk_maml",
                                      checkpoint_id="0")
    voice = tts.adapt(wav_paths=["a.wav", "b.wav"], texts=None,
                      phonemes=["...", "..."], spk_emb=dvec)
    wav = tts.synthesize("Hello there.", voice)
"""

from __future__ import annotations

import os
import weakref
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import load_params
from .dataloaders.collate import collate
from .dataloaders.dataset import Item, compute_logmel
from .meta.maml import make_metatest_fn
from .models import (
    config_from_params,
    init_tacotron2nv,
    tacotron2nv_forward,
    tacotron2nv_infer,
)
from .models.loss import tacotron2_loss
from .ops.audio import griffinlim_logmelspec, load_wav, trim_margin_silence
from .optim import make_optimizer
from .utils.checkpoint import load_checkpoint, restore_like
from .utils.g2p import Grapheme2Phoneme, N_SYMBOLS


@dataclass(eq=False)
class Voice:
    """An adapted speaker: params + state + d-vector.

    ``eq=False``: voices are identity-keyed so :class:`AdaptiveTTS` can
    cache their device placement in a WeakKeyDictionary (adapted
    checkpoints typically arrive as host numpy; without the cache every
    request re-uploads the full ~50 MB parameter tree, which dominated
    adapted-voice TTFA)."""

    params: dict
    model_state: dict
    spk_emb: np.ndarray
    support_loss: float


class AdaptiveTTS:
    def __init__(self, params: dict, model_params, model_state):
        self.params = params
        mp = dict(params["model"])
        mp.setdefault("n_mel_channels", params["audio_params"]["n_mels"])
        mp.setdefault("n_symbols", N_SYMBOLS)
        mp.setdefault("num_speakers", 1)
        # Serving pads and co-batches requests, so its exactness
        # contract (batched == single == streamed, independent of the
        # bucket and of co-batched requests) needs attention-energy
        # masking on top of mask_pad below: with mask_energies=False
        # (the training-side reference-parity default — the reference
        # comments the mask out, forward_attn.py:193-194) padded text
        # columns receive softmax mass and a request's mel would change
        # with its batch.  Masking is a no-op on unpadded rows, so this
        # IS the reference's single-utterance inference semantic; an
        # explicit attention_params.mask_energies still wins.
        ap = dict(mp.get("attention_params") or {})
        ap.setdefault("mask_energies", True)
        mp["attention_params"] = ap
        self.cfg = config_from_params(mp)
        self.model_params = model_params
        self.model_state = model_state
        self.g2p = Grapheme2Phoneme()
        # adapted-voice params device-placed ONCE per Voice (weak: a
        # dropped Voice frees its device copy) — see Voice docstring
        self._voice_cache: weakref.WeakKeyDictionary = (
            weakref.WeakKeyDictionary()
        )

        crit = params.get(
            "criterion", {"reduction": "none", "pos_weight": 1.0}
        )

        def loss_fn(p, ms, batch, rng):
            outs, new_ms = tacotron2nv_forward(
                p, ms, self.cfg,
                batch["inputs"], batch["input_lengths"],
                batch["melspecs"], batch["melspec_lengths"],
                batch["speaker_vecs"], rng, train=True,
            )
            loss = tacotron2_loss(
                tuple(outs),
                (batch["melspecs"], batch["stop_labels"]),
                batch["melspec_lengths"],
                n_frames_per_step=self.cfg.n_frames_per_step,
                reduction=crit.get("reduction", "none"),
                pos_weight=float(crit.get("pos_weight", 1.0)),
            )
            return loss, new_ms

        inner_tx = make_optimizer(
            params.get("optim_inner", {"optimizer_type": "SGD", "lr": 1e-2})
        )
        self._adapt_jit = jax.jit(
            make_metatest_fn(
                loss_fn, inner_tx, int(params.get("n_inner_test", 5)),
                remat=False,
            )
        )
        # infer_dtype: bfloat16 — opt-in half-width weights/compute for
        # the autoregressive decode.  The AR scan is HBM-bound streaming
        # the decoder weights every step (BENCHMARKS.md MFU analysis),
        # so bf16 halves the per-step traffic; outputs return as fp32.
        # Same cast the trainers' compute_dtype uses (trainers/base.py).
        # infer_dtype: auto — route by decode backend AND batch size:
        # bf16 where the decode is weight-streaming-bound (the XLA
        # while-loop at small B — measured 1.23× at B=1/r=2, a LOSS by
        # B=2; under the Pallas kernel the weights are VMEM-resident
        # and fp32 measured faster, BENCHMARKS.md round-5 re-bench).
        # The decision is made at trace time from the batch dimension
        # (each bucket is its own XLA program anyway), so the dynamic
        # batcher gets best-of-both with no per-deployment flag.
        # Streaming paths decode B=1-independent rows and take the same
        # backend-routed dtype — solo and multiplexed streams therefore
        # stay byte-matched.
        # infer_bf16_max_batch overrides the measured crossover bucket.
        #
        # DEFAULT (round 5): ``auto`` — same precedent as
        # ``decode_backend``: the measured-best route is on by default
        # on the hardware where it was measured, and a no-op elsewhere.
        # Off-TPU, ``auto`` resolves to fp32-everywhere (bf16 is
        # emulated on CPU — slower AND it would break cross-batch-size
        # mel parity for hosts that never see the win).  On TPU the
        # only behavior change vs fp32 is that mels from a ≤crossover
        # batch differ from a >crossover batch by bf16 rounding
        # (max |Δlog-mel| ~0.2 at random init, MCD 0.77 — BENCHMARKS.md);
        # solo == streamed == muxed parity is preserved because every
        # streaming path resolves the same per-row bf16.  Deployments
        # that need strict dtype uniformity across batch sizes set
        # ``infer_dtype: float32`` (or ``bfloat16``) explicitly.
        from .utils.backend import on_tpu

        idt = params.get("infer_dtype", "auto")
        if idt not in (None, "auto", "float32", "fp32",
                       "bfloat16", "bf16"):
            raise ValueError(
                f"unknown infer_dtype {idt!r}: expected 'auto', "
                "'float32' or 'bfloat16'"
            )
        self._infer_auto = idt == "auto" and on_tpu()
        # crossover re-measured at the shipped r=2 (round 5): the XLA
        # decode's bf16 win holds only at B=1 (1.23×; B=2 measured a
        # loss, 106 vs 72 µs/step)
        self._bf16_max_batch = int(params.get("infer_bf16_max_batch", 1))
        self._infer_dtype = (
            jnp.bfloat16 if idt in ("bfloat16", "bf16") else None
        )
        # decode_backend: the whole-loop Pallas decoder kernel
        # (models/pallas_decoder.py) keeps the AR decoder weights
        # VMEM-resident instead of re-reading ~38 MB from HBM per step.
        # auto → kernel on TPU hardware (it falls back internally when
        # the attention config isn't lowered), XLA while-loop elsewhere.
        from .utils.backend import resolve_kernel_backend

        self.decode_backend = resolve_kernel_backend(
            params.get("decode_backend")
        )

        # mask_pad: serving pads/buckets text lengths for shape reuse —
        # masking the encoder convs makes each row's output independent
        # of that padding, so batched == single == streamed synthesis
        def _infer(p, s, i, il, sv, rng):
            # batch read from the traced shape — static per XLA program,
            # so `auto` picks the dtype per batch bucket
            p, s, sv = self._cast_infer(p, s, sv, batch=i.shape[0])
            mel, mel_len, align = tacotron2nv_infer(
                p, s, self.cfg, i, il, sv, rng, mask_pad=True,
                decoder_backend=self.decode_backend,
            )
            return (
                mel.astype(jnp.float32), mel_len,
                align.astype(jnp.float32),
            )

        # parallel: {dp: N} — shard the batched decode across an ICI
        # mesh.  Rows are independent (pad-invariant encode, per-row
        # gates), so shard_map over the batch axis with replicated
        # weights is exact N-way serving throughput; inside each shard
        # the decode is the ordinary single-device program (the Pallas
        # decoder kernel included — shard_map gives it a per-shard
        # B/dp batch Mosaic can compile).
        pcfg = params.get("parallel") or {}
        self._dp = int(pcfg.get("dp", 1))
        # parallel: {tp: M} — tensor-parallel serving: the DECODER
        # WEIGHTS shard over an M-chip tp axis (parallel/tp.py) and the
        # per-step matmuls split across chips, cutting the weight-read
        # time that bounds small-batch AR decode.  Pure GSPMD: params
        # arrive as tp-sharded arrays and jit propagates the layout —
        # the decode program is unchanged.  Composes with serving dp as
        # either/or (dp = batch throughput, tp = per-stream latency);
        # the Pallas whole-loop kernel is single-device by construction,
        # so tp forces the XLA decode backend.
        self._tp = int(pcfg.get("tp", 1))
        self._tp_mesh = None
        if self._tp > 1:
            if self._dp > 1:
                raise NotImplementedError(
                    "serving parallel: use {dp: N} (batch throughput) "
                    "or {tp: M} (per-stream latency), not both"
                )
            from .parallel.mesh import make_mesh
            from .parallel.tp import shard_tree_tp

            self._tp_mesh = make_mesh(dp=1, task=1, tp=self._tp)
            self._tp_min_dim = int(pcfg.get("tp_min_dim", 128))
            self.decode_backend = "xla"
            self.model_params = shard_tree_tp(
                self.model_params, self._tp_mesh, self._tp_min_dim
            )
            self.model_state = shard_tree_tp(
                self.model_state, self._tp_mesh, self._tp_min_dim
            )
        self._infer_jit = jax.jit(_infer)     # single-utterance path
        self._infer_sharded = None
        if self._dp > 1:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.mesh import make_mesh

            self._mesh = make_mesh(dp=self._dp, task=1)

            def _infer_shard(p, s, i, il, sv, rng):
                # fold the shard index into the key: the prenet's
                # always-on dropout would otherwise draw byte-identical
                # noise in every shard (the rng is replicated), making
                # same-local-index rows of different shards correlated
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index("dp")
                )
                return _infer(p, s, i, il, sv, rng)

            self._infer_sharded = jax.jit(
                shard_map(
                    _infer_shard, mesh=self._mesh,
                    in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P()),
                    out_specs=(P("dp"), P("dp"), P("dp")),
                    check_rep=False,
                )
            )
        # Optional neural vocoders (attach_vocoder); Griffin-Lim needs none.
        self._vocoders: dict = {}

    def _resolve_infer_dtype(self, batch: int | None = None):
        """The compute dtype for a decode at ``batch`` rows: the static
        setting, or — under ``infer_dtype: auto`` — bf16 exactly where
        it measures a win: the XLA while-loop decode at ≤ the crossover
        batch, i.e. where the AR step is HBM-bound streaming the
        decoder weights (halving the weight width halves the binding
        traffic — tp serving, kernel-unsupported configs, non-kernel
        hosts).  Under the Pallas whole-loop kernel the weights are
        VMEM-resident, the streaming cost is already gone, and fp32
        measured faster end-to-end (round-5 r=2 re-bench: fp32 single
        0.058 s vs bf16 0.067 s), so auto resolves fp32 there.
        ``batch=None`` means a streaming/per-row context (bf16 under
        auto only on the XLA backend, same rule)."""
        if self._infer_auto:
            if self.decode_backend != "xla":
                return None
            if batch is None or batch <= self._bf16_max_batch:
                return jnp.bfloat16
            return None
        return self._infer_dtype

    def _cast_infer(self, p, s, sv, batch: int | None = None):
        """Cast fp32 params/state/speaker-vec to the inference compute
        dtype (identity when ``infer_dtype`` is unset, batch-routed
        under ``auto``)."""
        dt = self._resolve_infer_dtype(batch)
        if dt is None:
            return p, s, sv

        def cast(t):
            return jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )

        return cast(p), cast(s), sv.astype(dt)

    def _voice_arrays(self, voice: "Voice | None"):
        """Device-resident (params, model_state) for ``voice`` (the
        base model when None).  Placed on device once per Voice and
        memoized — a race between request threads at worst uploads
        twice (idempotent)."""
        if voice is None:
            return self.model_params, self.model_state
        ent = self._voice_cache.get(voice)
        if ent is None:
            if self._tp_mesh is not None:
                from .parallel.tp import shard_tree_tp

                ent = (
                    shard_tree_tp(
                        voice.params, self._tp_mesh, self._tp_min_dim
                    ),
                    shard_tree_tp(
                        voice.model_state, self._tp_mesh,
                        self._tp_min_dim
                    ),
                )
            else:
                ent = (
                    jax.device_put(voice.params),
                    jax.device_put(voice.model_state),
                )
            self._voice_cache[voice] = ent
        return ent

    # ------------------------------------------------------------- load
    @classmethod
    def from_experiment(cls, experiment_path: str, checkpoint_id: str = "0",
                        **overrides):
        params = load_params(os.path.join(experiment_path, "params.yml"))
        params.update(overrides)
        mp = dict(params["model"])
        mp["n_mel_channels"] = params["audio_params"]["n_mels"]
        mp["n_symbols"] = N_SYMBOLS
        mp["num_speakers"] = 1
        params["model"] = mp
        cfg = config_from_params(mp)
        model_params, model_state = init_tacotron2nv(
            jax.random.PRNGKey(0), cfg
        )
        ckpt = os.path.join(
            experiment_path, "checkpoints", f"checkpoint_{checkpoint_id}"
        )
        if os.path.exists(ckpt + ".ckpt"):
            raw = load_checkpoint(ckpt + ".ckpt")
            model_params = restore_like(model_params, raw["params"])
            model_state = restore_like(model_state, raw["model_state"])
        elif os.path.exists(ckpt + ".pt"):
            from .utils.torch_import import load_torch_checkpoint

            model_params, model_state = load_torch_checkpoint(
                ckpt + ".pt", cfg
            )
        else:
            raise FileNotFoundError(ckpt + ".{ckpt,pt}")
        return cls(params, model_params, model_state)

    # ------------------------------------------------------------ adapt
    def adapt(
        self,
        wav_paths: Sequence[str],
        phonemes: Sequence[str],
        spk_emb: np.ndarray,
        *,
        rng: jax.Array | None = None,
    ) -> Voice:
        """k-shot adaptation from reference clips + their phonemizations."""
        assert len(wav_paths) == len(phonemes)
        ap = self.params["audio_params"]
        items = []
        spk_emb = np.asarray(spk_emb, np.float32)
        for i, (path, ph) in enumerate(zip(wav_paths, phonemes)):
            wav = load_wav(path, target_sample_rate=ap["sample_rate"])
            if self.params.get("dataset_train", {}).get(
                "trim_margin_silence", False
            ):
                wav = trim_margin_silence(wav)
            mel = compute_logmel(
                wav, self.params.get("audio_processor", "ap"), ap
            )
            seq, _ = self.g2p.convert(ph, convert_mode="phone_to_idx")
            items.append(
                Item(
                    item_id=f"adapt_{i}",
                    speaker="adapt",
                    speaker_id=0,
                    phonemes=np.asarray(seq, np.int32),
                    mel=mel,
                    duration=len(wav) / ap["sample_rate"],
                    spk_emb=spk_emb,
                )
            )
        batch = collate(
            items,
            reduction_factor=self.cfg.n_frames_per_step,
            text_pad_multiple=16,
            mel_pad_multiple=32,
        )
        inputs = {
            "inputs": batch.inputs,
            "input_lengths": batch.input_lengths,
            "melspecs": batch.mels,
            "melspec_lengths": batch.mel_lengths,
            "speaker_vecs": batch.spk_embs,
            "stop_labels": batch.stop_labels,
        }
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        qloss, adapted, ms, _ = self._adapt_jit(
            self.model_params, self.model_state, inputs, inputs, rng
        )
        return Voice(
            params=adapted,
            model_state=ms,
            spk_emb=spk_emb,
            support_loss=float(qloss),
        )

    # ---------------------------------------------------- voice storage
    def save_voice(self, voice: Voice, path: str) -> None:
        """Persist an adapted voice (full adapted params + BN state +
        d-vector) as one atomic msgpack file — adapt once at onboarding,
        serve forever."""
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(path, {
            "params": voice.params,
            "model_state": voice.model_state,
            "spk_emb": np.asarray(voice.spk_emb, np.float32),
            "support_loss": np.float32(voice.support_loss),
        })

    def load_voice(self, path: str) -> Voice:
        from .utils.checkpoint import load_checkpoint, restore_like

        raw = load_checkpoint(path)
        return Voice(
            params=restore_like(self.model_params, raw["params"]),
            model_state=restore_like(
                self.model_state, raw["model_state"]
            ),
            spk_emb=np.asarray(raw["spk_emb"], np.float32),
            support_loss=float(raw["support_loss"]),
        )

    # -------------------------------------------------------- synthesize
    def synthesize(self, text: str, voice: Voice | None = None,
                   *, vocoder: str = "griffinlim",
                   rng: jax.Array | None = None,
                   spk_emb: np.ndarray | None = None) -> np.ndarray:
        """Text → waveform as the adapted speaker (or the base model with
        an explicit ``spk_emb``)."""
        params, state = self._voice_arrays(voice)
        emb = voice.spk_emb if voice else np.asarray(spk_emb, np.float32)
        seq, _ = self.g2p.convert(
            text,
            convert_mode="text_to_phone_to_idx",
            language=self.params.get("language", "en-us"),
        )
        inputs = jnp.asarray(np.asarray(seq, np.int32)[None])
        in_len = jnp.asarray([len(seq)])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mel, mel_len, _ = self._infer_jit(
            params, state, inputs, in_len, jnp.asarray(emb[None]), rng
        )
        n = max(int(mel_len[0]), 1) * self.cfg.n_frames_per_step
        mel = np.asarray(mel)[0, :, :n]
        return self._vocode([mel], vocoder, rng)[0]

    def synthesize_batch(
        self, texts: Sequence[str], voice: Voice | None = None,
        *, vocoder: str = "griffinlim", rng: jax.Array | None = None,
        spk_emb: np.ndarray | None = None,
        text_pad_multiple: int = 1, pad_batch_to: int | None = None,
    ) -> list[np.ndarray]:
        """Batched text → waveforms: ONE compiled autoregressive decode
        over all texts (2,000×-realtime aggregate at B=16, BENCHMARKS.md)
        and, with the wavernn vocoder, one batched sample scan over all
        utterances' folds (``WaveRNN.generate_batch``).

        ``text_pad_multiple`` / ``pad_batch_to`` quantize the padded
        (B, T) shape so a serving deployment compiles a bounded set of
        XLA programs instead of one per request mix; padded rows
        replicate row 0 and are discarded from the result.
        """
        params, state = self._voice_arrays(voice)
        emb = voice.spk_emb if voice else np.asarray(spk_emb, np.float32)
        seqs = [
            self.g2p.convert(
                t, convert_mode="text_to_phone_to_idx",
                language=self.params.get("language", "en-us"),
            )[0]
            for t in texts
        ]
        B = len(seqs)
        Bp = max(B, pad_batch_to or B)
        # a dp-sharded decode needs the batch divisible across the mesh
        Bp = ((Bp + self._dp - 1) // self._dp) * self._dp
        T = max(len(s) for s in seqs)
        m = max(int(text_pad_multiple), 1)
        T = ((T + m - 1) // m) * m
        inputs = np.zeros((Bp, T), np.int32)
        in_len = np.empty((Bp,), np.int32)
        for i, s in enumerate(seqs):
            inputs[i, : len(s)] = s
            in_len[i] = len(s)
        for i in range(B, Bp):  # filler rows: replicate row 0
            inputs[i] = inputs[0]
            in_len[i] = in_len[0]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        infer = self._infer_sharded or self._infer_jit
        mel, mel_len, _ = infer(
            params, state, jnp.asarray(inputs), jnp.asarray(in_len),
            jnp.asarray(np.tile(emb[None], (Bp, 1))), rng,
        )
        mel = np.asarray(mel)
        mels = [
            mel[i, :, : max(int(mel_len[i]), 1) * self.cfg.n_frames_per_step]
            for i in range(B)
        ]
        return self._vocode(mels, vocoder, rng)

    # ------------------------------------------------------------ vocoders
    def attach_vocoder(self, name: str, vocoder) -> None:
        """Register a neural vocoder: ``name`` in {"wavernn", "hifigan"},
        ``vocoder`` a ``vocoders.wavernn.WaveRNN`` / ``vocoders.hifigan
        .HiFiGAN`` instance (reference vocoder selection:
        msa_tts/infer.py:311-328)."""
        if name not in ("wavernn", "hifigan"):
            raise ValueError(f"unknown vocoder name: {name}")
        self._vocoders[name] = vocoder

    def _vocode(self, mels: list[np.ndarray], vocoder: str, rng):
        if vocoder == "none":
            return mels
        if vocoder == "griffinlim":
            # jitted + cached per mel shape: eager Griffin-Lim dispatches
            # dozens of ops per call, which a high-latency device link
            # turns into seconds (serving-path measurement, BENCHMARKS.md)
            ap = self.params["audio_params"]
            if not hasattr(self, "_gl_jit"):
                self._gl_jit = jax.jit(
                    lambda m: griffinlim_logmelspec(m, ap)
                )
                self._gl_batch_jit = jax.jit(
                    jax.vmap(lambda m: griffinlim_logmelspec(m, ap))
                )
            if len(mels) == 1:
                return [np.asarray(self._gl_jit(jnp.asarray(mels[0])))]
            # ONE batched inversion for the whole group: pad every mel
            # to a common (multiple-quantized) frame count with its own
            # silence floor, snap the batch to a power-of-two bucket
            # (bounds compile count), vmap, and cut each wav back to
            # hop·(T−1) samples — the exact length the single-mel path
            # produces (centered istft), so batching never changes a
            # request's output length
            from .utils.batching import pad_mel_batch

            hop = ap.get("hop_length", ap.get("hop_size"))
            wavs = np.asarray(
                self._gl_batch_jit(jnp.asarray(pad_mel_batch(mels)))
            )
            return [
                wavs[i][: (m.shape[1] - 1) * hop]
                for i, m in enumerate(mels)
            ]
        if vocoder == "wavernn":
            voc = self._vocoders.get("wavernn")
            if voc is None:
                raise ValueError(
                    "attach_vocoder('wavernn', WaveRNN(...)) first"
                )
            return voc.generate_batch(mels, rng=rng, verbose=False)
        if vocoder == "hifigan":
            voc = self._vocoders.get("hifigan")
            if voc is None:
                raise ValueError(
                    "attach_vocoder('hifigan', HiFiGAN(...)) first"
                )
            if len(mels) > 1 and hasattr(voc, "inference_batch"):
                return voc.inference_batch(mels)
            return [np.asarray(voc.inference(m)) for m in mels]
        raise ValueError(f"unknown vocoder: {vocoder}")


# ---------------------------------------------------------------------------
# Streaming synthesis
# ---------------------------------------------------------------------------

class _StreamingPostnet:
    """Delayed-exact streaming postnet.

    The postnet is a stack of same-padded time convolutions with a
    finite receptive field of ``ctx = n_convs · (kernel // 2)`` frames
    per side.  Emitting a frame only once ``ctx`` future frames exist
    (and carrying ``ctx`` past frames as left context) reproduces the
    offline postnet EXACTLY, at the cost of ``ctx`` frames of
    algorithmic delay.  Window sizes are quantized so steady-state
    streaming runs one compiled XLA program.
    """

    def __init__(self, apply_fn, ctx: int, pad_to: int = 0):
        # apply_fn: (B, n_mel, W), true_width -> (B, n_mel, W); columns
        # >= true_width of the input are quantization padding the
        # postnet masks out (postnet_apply(width=...)), so every window
        # — the data-dependent final one included — runs through one
        # compiled program of width pad_to instead of compiling per
        # residue at request time.
        self.apply = apply_fn
        self.ctx = int(ctx)
        self.pad_to = int(pad_to)
        self.left: np.ndarray | None = None   # (n_mel, <=ctx) raw
        self.pending: np.ndarray | None = None

    def _cat(self, *xs):
        xs = [x for x in xs if x is not None and x.shape[-1]]
        if not xs:
            return None
        return np.concatenate(xs, axis=-1)

    def push(self, raw: np.ndarray, final: bool = False) -> np.ndarray:
        """Feed raw mel frames (n_mel, t); returns the postnet-processed
        frames that became exact (possibly empty)."""
        self.pending = self._cat(self.pending, raw)
        if self.pending is None:
            return np.zeros((raw.shape[0], 0), raw.dtype)
        n_pend = self.pending.shape[-1]
        m = n_pend if final else n_pend - self.ctx
        if m <= 0:
            return np.zeros((raw.shape[0], 0), raw.dtype)
        n_left = 0 if self.left is None else self.left.shape[-1]
        window = self._cat(self.left, self.pending)
        w = window.shape[-1]
        if self.pad_to > w:
            window = np.pad(window, ((0, 0), (0, self.pad_to - w)))
        out = np.asarray(self.apply(window[None], w)[0])
        emitted = out[:, n_left : n_left + m]
        keep = self._cat(self.left, self.pending[:, :m])
        self.left = keep[:, -self.ctx :]
        self.pending = self.pending[:, m:]
        return emitted


class _StreamingVocoder:
    """Chunked vocoding with ±ctx frames of context, trimmed from the
    output.  Exactness depends on the vocoder: HiFi-GAN (feed-forward
    conv) reproduces its offline output wherever the receptive field
    fits inside the context; Griffin-Lim estimates phase per chunk
    (boundary approximation); WaveRNN is sample-level autoregressive,
    so each chunk restarts its GRU state/sampling noise — an
    independent generation of that span, not the offline samples."""

    def __init__(self, vocode_fn, hop: int, chunk: int, ctx: int,
                 tail_frames: int = 0):
        self.vocode = vocode_fn       # (n_mel, W) -> wav np.ndarray
        self.hop, self.chunk, self.ctx = int(hop), int(chunk), int(ctx)
        # frames the vocoder comes up short per window (the jitted
        # Griffin-Lim returns (W-1)·hop samples for W frames — centered
        # istft tail trim).  An unpadded final window self-truncates;
        # a quantization-padded one must trim explicitly to keep the
        # streamed total identical to the offline wav length.
        self.tail_frames = int(tail_frames)
        self.buf: np.ndarray | None = None   # all emitted mel frames
        self.done = 0                        # frames already vocoded

    def push(self, mel: np.ndarray, final: bool = False):
        """Feed exact mel frames; yields wav chunks (np.float32)."""
        if mel is not None and mel.shape[-1]:
            self.buf = (
                mel if self.buf is None
                else np.concatenate([self.buf, mel], axis=-1)
            )
        if self.buf is None:
            return
        T = self.buf.shape[-1]
        # Every window is vocoded at ONE fixed width ``chunk + 2·ctx``:
        # the window is grown toward whatever real frames exist (extra
        # true context never hurts), and only an utterance shorter than
        # the window pads — with its own silence floor, the same
        # convention as the batched path (utils/batching.pad_mel_batch).
        # Data-dependent final-residue widths would otherwise compile a
        # fresh vocoder program at request time for every new length.
        W = self.chunk + 2 * self.ctx
        while True:
            e = self.done + self.chunk
            if e + self.ctx > T:       # need future context (or final)
                if not (final and self.done < T):
                    break
                e = T
            s = self.done
            a = max(0, min(s - self.ctx, T - W))
            b = min(T, a + W)
            win = self.buf[:, a:b]
            padded = b - a < W         # whole utterance shorter than W
            if padded:
                win = np.pad(
                    win, ((0, 0), (0, W - (b - a))),
                    constant_values=float(win.min()),
                )
            wav = np.asarray(self.vocode(win), dtype=np.float32)
            if padded:
                wav = wav[: (b - a - self.tail_frames) * self.hop]
            o = (s - a) * self.hop
            n = (e - s) * self.hop
            chunk = wav[o : o + n]
            self.done = e
            if chunk.size:
                yield chunk
            if e >= T:
                break


def _postnet_ctx(cfg) -> int:
    return cfg.postnet_n_convolutions * (cfg.postnet_kernel_size // 2)


def _stream_cursor(self, params, state, post_jit, vocoder, rng,
                   segment_steps, chunk_frames, vocode_ctx_frames):
    """One stream's host-side stage stack (postnet → vocoder →
    :class:`_StreamCursor`), shared by :meth:`synthesize_stream` and the
    multiplexer so both produce byte-identical per-stream pipelines."""
    cfg = self.cfg
    r = cfg.n_frames_per_step
    hop = self.params["audio_params"].get(
        "hop_length", self.params["audio_params"].get("hop_size")
    )
    # One compiled postnet program per segment_steps: windows are padded
    # to the widest a segment stream can produce (left ctx + held-back
    # ctx + a segment's raw frames + final-push zeros ≤ 3·ctx) and the
    # true width is masked inside the jit (postnet_apply(width=...)), so
    # the data-dependent final residue never compiles at request time.
    pctx = _postnet_ctx(cfg)
    post = _StreamingPostnet(
        lambda w, n: post_jit(
            params, state, jnp.asarray(w), jnp.asarray(n, jnp.int32)
        ),
        pctx,
        pad_to=segment_steps * r + 3 * pctx,
    )
    if vocoder == "none":      # stream exact mel chunks directly
        class voc:  # noqa: N801 - tiny inline namespace
            @staticmethod
            def push(mel, final=False):
                if mel is not None and mel.shape[-1]:
                    yield mel
    else:
        if vocoder in ("griffinlim", "wavernn") and vocode_ctx_frames < 1:
            # Griffin-Lim (centered-istft tail trim) and WaveRNN
            # (generate_batch returns (W-1)·hop samples for a W-frame
            # window) both come up one hop short per window; with zero
            # context every non-final chunk would silently lose a hop
            raise ValueError(
                f"vocoder={vocoder!r} needs vocode_ctx_frames >= 1"
            )
        voc = _StreamingVocoder(
            lambda m: self._vocode([np.asarray(m)], vocoder, rng)[0],
            hop, chunk_frames, vocode_ctx_frames,
            # hifigan's generator emits exactly W·hop samples; the other
            # two emit (W-1)·hop (see the ValueError above)
            tail_frames=0 if vocoder == "hifigan" else 1,
        )
    return _StreamCursor(cfg, r, post, voc)


def _encpost_jits(self):
    """The streaming encoder and width-masked postnet jits, built once
    per :class:`AdaptiveTTS` and shared by :meth:`synthesize_stream`
    and the stream multiplexer (stream_mux.py) — both must run the
    exact same encode/postnet programs for their outputs to chain.

    infer_dtype casts mirror the offline _infer jit so streamed mel
    stays the exact offline mel: the encoder/decoder run in the compute
    dtype end-to-end (enc_cond and the carried stream state stay bf16
    between segments), the postnet re-casts its host-fp32 input (fp32
    holds bf16 exactly, so the round-trip is lossless), and everything
    returns fp32 to the host."""
    from .models.tacotron2nv import _encode, postnet_apply

    if not hasattr(self, "_stream_jits"):
        self._stream_jits = {}
    if "encpost" not in self._stream_jits:
        cfg = self.cfg

        def enc_fn(p, s, i, il, sv, k):
            p, s, sv = self._cast_infer(p, s, sv, batch=1)
            return _encode(p, s, cfg, i, il, sv, k, False, mask_pad=True)

        def post_fn(p, s, x, width):
            dt = self._resolve_infer_dtype(1)
            p, s, _ = self._cast_infer(
                p, s, jnp.zeros((), jnp.float32), batch=1
            )
            if dt is not None:
                x = x.astype(dt)
            res, _ = postnet_apply(
                p["postnet"], s["postnet"], x, rng=None, train=False,
                kernel_size=cfg.postnet_kernel_size, width=width,
            )
            return (x + res).astype(jnp.float32)

        self._stream_jits["encpost"] = (jax.jit(enc_fn), jax.jit(post_fn))
    return self._stream_jits["encpost"]


class _StreamCursor:
    """Per-stream host-side segment bookkeeping: raw decoder frames →
    (postnet-exact, offline-trimmed, vocoded) wav chunks.

    Shared verbatim by :meth:`AdaptiveTTS.synthesize_stream` (one
    stream) and :class:`msa_tts_tpu.stream_mux.StreamMultiplexer`
    (one cursor per slot) so the offline-equivalence contract — what
    frames the postnet sees, where the output is trimmed, when the
    stream ends — cannot diverge between the two."""

    def __init__(self, cfg, r: int, post: "_StreamingPostnet", voc):
        self.cfg = cfg
        self.r = int(r)
        self.post = post
        self.voc = voc
        self.produced = 0   # raw frames fed to the postnet
        self.emitted = 0    # exact frames forwarded to the vocoder

    def advance(self, raw: np.ndarray, ml: int, finished: bool,
                n_steps: int):
        """Consume one segment's raw frames; returns
        ``(wav_chunk_iterator, final)``.

        ``raw``: (n_mel, seg·r) this segment's decoder output;
        ``ml``: the stream's mel_lengths counter; ``finished``: the
        gate has fired; ``n_steps``: total decoder steps taken."""
        cfg, r, post, voc = self.cfg, self.r, self.post, self.voc
        at_cap = n_steps >= cfg.max_decoder_steps
        raw = np.asarray(raw)                        # (n_mel, seg·r)
        # The segment scan decodes in fixed ``segment_steps`` strides,
        # so it can overshoot max_decoder_steps by up to seg−1 steps the
        # offline while-loop never runs — drop those frames and their
        # mel_lengths increments (per-step +1, so min() reproduces the
        # offline count exactly)
        cap_frames = cfg.max_decoder_steps * r
        if self.produced + raw.shape[-1] > cap_frames:
            raw = raw[:, : max(0, cap_frames - self.produced)]
        L = min(max(ml, 1) * r, cap_frames)
        if finished:
            # offline trims output to mel_lengths·r frames regardless of
            # early_stopping (synthesize above).  The postnet must see
            # the same raw context offline saw beyond L:
            #   early_stopping=True  — the while-loop exits once every
            #     gate fired, so the buffer holds mel_lengths+1 real
            #     steps (the firing step still writes its frame — for a
            #     step-0 gate that's 1 real step at mel_lengths=0) and
            #     literal zeros beyond; feed exactly those real frames,
            #     then explicit zeros out to L+ctx so every emitted
            #     frame's receptive field holds what offline's buffer
            #     held (conv zero-PADDING is not the same as zero INPUT
            #     frames past the first conv layer);
            #   early_stopping=False — offline decodes to the step cap,
            #     so frames past L are REAL context → keep decoding
            #     until every vocoded frame (< L) has its true postnet
            #     receptive field, then stop (decoding further changes
            #     nothing the client hears).
            if cfg.early_stopping:
                need = min(ml + 1, cfg.max_decoder_steps) * r
            else:
                need = min(L + post.ctx, cap_frames)
            final = at_cap or (self.produced + raw.shape[-1] >= need)
            if final:
                raw = raw[:, : max(0, need - self.produced)]
                n_zero = min(L + post.ctx, cap_frames) - need
                if n_zero > 0:
                    raw = np.concatenate(
                        [raw,
                         np.zeros((raw.shape[0], n_zero), raw.dtype)],
                        axis=-1,
                    )
        else:
            final = at_cap
        self.produced += raw.shape[-1]
        exact = post.push(raw, final=final)
        # vocoder sees ≤ L·r total — while un-finished L == produced,
        # and once the gate fires L freezes (offline trim), so post-gate
        # frames never reach the client even with early_stopping off
        take = max(0, min(exact.shape[-1], L - self.emitted))
        self.emitted += take
        return voc.push(exact[:, :take], final=final), final


def synthesize_stream(
    self,
    text: str,
    voice: Voice | None = None,
    *,
    vocoder: str = "griffinlim",
    spk_emb: np.ndarray | None = None,
    rng: jax.Array | None = None,
    segment_steps: int = 16,
    chunk_frames: int = 40,
    vocode_ctx_frames: int = 16,
    text_pad_multiple: int = 1,
):
    """Generator: text → wav chunks (np.float32), start-to-first-chunk
    ≪ start-to-last (the TTFA win; see benchmarks/serving_stream.py).

    Pipeline: one jitted encode → autoregressive decode in
    ``segment_steps``-step jitted segments (bit-exact chaining of the
    offline decoder — models/decoder.py:decoder_infer_segment) →
    delayed-exact streaming postnet → chunked vocoding.  The mel path
    is identical to :meth:`synthesize`.  Audio exactness per vocoder:
    hifigan reproduces its offline samples wherever the conv receptive
    field fits inside ``vocode_ctx_frames``; Griffin-Lim estimates phase
    per chunk (boundary approximation); wavernn is sample-level
    autoregressive, so each chunk is an independent generation — same
    voice/quality, not the offline sample sequence.

    Backend note: under ``decode_backend: pallas`` the stream decodes
    through the segment variant of the whole-loop kernel
    (models/pallas_decoder.py), which shares the offline kernel's step
    body — so offline and streamed stay matched per backend.  Separately
    compiled programs still differ at the fp-noise level (same caveat
    as the XLA path, whose exactness tests use small tolerances); when
    the kernel's segment footprint doesn't fit VMEM the stream falls
    back to the XLA segment path and offline/streamed then agree within
    fp tolerance rather than bit-exactly.

    ``text_pad_multiple`` > 1 quantizes the padded phoneme length
    (masked in the encoder convs/BiLSTM/attention — tacotron2nv.py:
    ``_encode(mask_pad=True)`` — so the padding changes no math) so a
    serving deployment compiles a bounded set of encode/segment
    programs instead of one per distinct text length; server.py passes
    its ``text_pad_multiple``.  The default 1 keeps the streamed mel
    fp-identical to :meth:`synthesize` (padding is mathematically
    inert, but a different padded T is a different XLA program, and
    that fp noise grows through the autoregressive feedback).
    """
    from .models.decoder import decoder_infer_segment, decoder_stream_init
    from .models.tacotron2nv import _encode, postnet_apply

    params, state = self._voice_arrays(voice)
    emb = voice.spk_emb if voice else np.asarray(spk_emb, np.float32)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    seq, _ = self.g2p.convert(
        text, convert_mode="text_to_phone_to_idx",
        language=self.params.get("language", "en-us"),
    )
    m = max(int(text_pad_multiple), 1)
    T = ((len(seq) + m - 1) // m) * m
    padded = np.zeros((1, T), np.int32)
    padded[0, : len(seq)] = seq
    inputs = jnp.asarray(padded)
    in_len = jnp.asarray([len(seq)], jnp.int32)

    cfg = self.cfg
    dcfg = cfg.decoder_config()
    r = cfg.n_frames_per_step

    enc_jit, post_jit = _encpost_jits(self)
    key = ("seg", segment_steps, self.decode_backend)
    if key not in self._stream_jits:
        # decode_backend=pallas streams through the segment variant of
        # the whole-loop kernel (models/pallas_decoder.py — same shared
        # step body, so segments chain to the offline kernel's decode).
        # The gate is decided at TRACE time from the traced encoder
        # shape (jax.jit retraces per padded text length), so every
        # length gets its own correct pallas/XLA decision — a decision
        # frozen at closure build would reuse the first call's T_in.
        want_pallas_seg = self.decode_backend == "pallas"

        def seg_fn(p, w, enc, il, k, st):
            # p arrives pre-cast and w pre-split (ONCE per stream, by
            # the caller below) — inlining either here would repeat the
            # cast + transposed weight repack inside every segment's
            # compiled program
            use_pallas = want_pallas_seg
            if use_pallas:
                from .models.pallas_decoder import (
                    fits_vmem, profitable, supports_config,
                )

                use_pallas = (
                    supports_config(dcfg)
                    and profitable(
                        int(enc.shape[0]), dcfg.n_frames_per_step
                    )
                    and fits_vmem(
                        dcfg._replace(max_decoder_steps=segment_steps),
                        int(enc.shape[0]), int(enc.shape[1]),
                        p["decoder"]["attention_rnn"]["weight_ih"].dtype,
                    )
                )
            if use_pallas:
                from .models.pallas_decoder import pallas_decoder_segment

                st2, mels, gates, align = pallas_decoder_segment(
                    p["decoder"], dcfg, enc, il, k, st, segment_steps,
                    prepacked_w=w,
                )
            else:
                st2, mels, gates, align = decoder_infer_segment(
                    p["decoder"], dcfg, enc, il, k, st, segment_steps
                )
            return (
                st2, mels.astype(jnp.float32),
                gates.astype(jnp.float32), align,
            )

        self._stream_jits[key] = jax.jit(seg_fn)
    seg_jit = self._stream_jits[key]
    p_cast, _, _ = self._cast_infer(
        params, {}, jnp.zeros((), jnp.float32), batch=1
    )
    if self.decode_backend == "pallas":
        from .models.pallas_decoder import split_decoder_params

        w_pre = jax.jit(
            lambda pd: split_decoder_params(pd, dcfg)
        )(p_cast["decoder"])
    else:
        w_pre = None

    enc_cond, _ = enc_jit(
        params, state, inputs, in_len, jnp.asarray(emb[None]),
        rng,
    )
    k_dec = jax.random.fold_in(rng, 2)
    # Pallas segments carry f32 state BETWEEN segments by design (AR
    # exactness — pallas_decoder.py); seeding the stream with a bf16
    # state would compile the jitted segment program twice per bucket
    # (bf16-state signature for segment 1, f32 for the rest).  Start in
    # f32 whenever the pallas backend is selected so one program serves
    # every segment.
    st_dtype = (
        jnp.float32 if self.decode_backend == "pallas"
        else enc_cond.dtype
    )
    st = decoder_stream_init(dcfg, 1, enc_cond.shape[1], st_dtype)

    hop = self.params["audio_params"].get(
        "hop_length", self.params["audio_params"].get("hop_size")
    )
    cursor = _stream_cursor(
        self, params, state, post_jit, vocoder, rng,
        segment_steps, chunk_frames, vocode_ctx_frames,
    )
    while True:
        st, mels, gates, _ = seg_jit(
            p_cast, w_pre, enc_cond, in_len, k_dec, st
        )
        # ONE coalesced device→host fetch per segment: on a high-latency
        # device link (the reason _vocode is jitted — see above) separate
        # int()/np.asarray() pulls would each pay a full round trip,
        # adding 3-4 RTTs to every chunk's cadence and to TTFA.
        n_steps, nf, ml_host, raw = jax.device_get(
            (st["step"], st["not_finished"], st["mel_lengths"], mels[0])
        )
        chunks, final = cursor.advance(
            raw, ml=int(ml_host[0]), finished=int(nf.sum()) == 0,
            n_steps=int(n_steps),
        )
        yield from chunks
        if final:
            break


AdaptiveTTS.synthesize_stream = synthesize_stream
