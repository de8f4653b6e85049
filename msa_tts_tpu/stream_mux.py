"""Continuous-batching stream multiplexer: N concurrent HTTP streams
decoded in ONE batched segment call per cadence tick.

Why: `server.stream_chunks` time-slices concurrent streams — each
`next()` takes the device lock, so K clients each get 1/K of the chip
and aggregate streaming capacity equals single-stream capacity.  The
decoder's batch rows are mathematically independent, so decoding up to
N live streams per launch multiplies streaming capacity ~N× at roughly
single-stream cadence.  This is the autoregressive-TTS analogue of LLM
serving's continuous batching: fixed device-resident slots, streams
join at segment boundaries mid-flight and retire when their gate
fires, no re-bucketing and no per-segment state transfers.

Two decode engines, auto-routed by the measured crossover
(BENCHMARKS.md — the Pallas whole-segment kernel wins up to B=4 and
loses past B=8):

- ``backend="pallas"`` (`_KernelEngine`) — all slots advance in one
  whole-segment `pallas_call` (models/pallas_decoder.py), weights
  VMEM-resident.  The high-capacity default at n_slots ≤ 4.
- ``backend="xla"`` (`_XlaEngine`) — `decoder_infer_segment` (the solo
  streaming scan, models/decoder.py:540) vmapped over per-slot
  (state, rng, step) so every slot keeps its OWN absolute-step key
  schedule.  No VMEM cap and no attention-config restrictions; routes
  automatically for n_slots > 4 or kernel-unsupported configs.

Exactness: a multiplexed stream produces byte-identical audio to the
same request through :meth:`AdaptiveTTS.synthesize_stream` at the same
padded text length (tests/test_stream_mux.py).  Three properties make
that hold:

- slot rows are computed independently (the same independence the
  dp-sharded batched decode relies on);
- each slot's prenet-dropout masks are drawn with the SOLO path's
  per-stream key schedule — the kernel engine stacks
  ``_prenet_masks(rng_slot, B=1, start=step_slot)``, the XLA engine
  vmaps ``fold_in(rng_slot, absolute_step)`` — so a stream's noise
  never depends on which slot it landed in or who its neighbours are;
- the per-stream host pipeline (postnet window, offline trim, vocoder
  chunking) is the same ``_StreamCursor`` object the solo path runs.

Adapted voices (the few-shot product — reference
msa_tts/infer.py:266-281): with ``per_slot_params=True`` the XLA
engine carries a device-resident STACKED decoder-params table — one
full decoder parameter set per slot — and ``stream(..., voice=...)``
admits a stream under its own adapted weights.  The per-slot encode
and postnet already run per stream (same jitted programs, voice params
passed as arguments), so a muxed adapted stream is the solo adapted
stream bit-for-bit.  The cost is decoder-weight HBM traffic ×
n_slots per tick (vmapped weights can't be shared), which is why it's
an engine mode, not the default: base-voice deployments keep the
shared-weight engines (Pallas kernel ≤ 4 slots).  The kernel engine
keeps ONE weight set VMEM-resident by construction, so it never serves
per-slot params.  Per-stream speaker embeddings are fine either way:
the speaker conditions the ENCODER, which runs per stream at join
time.  Texts longer than the multiplexer's ``t_cap`` fall back to the
solo path (server.py handles the routing).

The reference has no serving runtime at all; this is TPU-native
operational surface on top of the reference's inference semantics
(msa_tts/infer.py:311-328).
"""

from __future__ import annotations

import queue
import threading
import weakref
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from .models.decoder import decoder_infer_segment, decoder_stream_init
from .models.pallas_decoder import (
    _preprocess,
    _prenet_masks,
    fits_vmem,
    make_pallas_decoder_segment,
    profitable,
    split_decoder_params,
    supports_config,
)
from .ops.masking import sequence_mask
from .serving import _encpost_jits, _stream_cursor
from .utils.backend import on_tpu


class _Slot:
    __slots__ = ("active", "cursor", "out", "step", "gen")

    def __init__(self):
        self.active = False
        self.cursor = None
        self.out: queue.SimpleQueue | None = None
        self.step = 0          # decoder steps taken (host-side)
        self.gen = 0           # admission generation (stale-output guard)


class _KernelEngine:
    """All slots advance in ONE whole-segment Pallas kernel call.

    Device state mirrors the kernel's st_shapes tuple plus per-slot
    conditioning tables; per-slot prenet masks are drawn OUTSIDE the
    kernel with each slot's solo key schedule and streamed in (the
    kernel's exactness contract — models/pallas_decoder.py).
    """

    def __init__(self, tts, dcfg, B, t_cap, n_seg, interpret):
        if not supports_config(dcfg):
            raise ValueError(
                "kernel engine requires a kernel-lowered attention "
                "config (pallas_decoder.supports_config) — windowing / "
                "forward_attn_mask configs need backend='xla'"
            )
        self.dcfg = dcfg
        self.B, self.t_cap, self.n_seg = B, t_cap, n_seg
        p_cast, _, _ = tts._cast_infer(
            tts.model_params, {}, jnp.zeros((), jnp.float32), batch=1
        )
        wdt = p_cast["decoder"]["attention_rnn"]["weight_ih"].dtype
        if not interpret and not fits_vmem(
            dcfg._replace(max_decoder_steps=n_seg), B, t_cap, wdt,
        ):
            raise ValueError(
                f"mux shape (B={B}, T={t_cap}, seg={n_seg}) exceeds "
                f"the kernel VMEM budget — use backend='xla'"
            )
        self._p_cast = p_cast
        self._w = jax.jit(
            lambda pd: split_decoder_params(pd, dcfg)
        )(p_cast["decoder"])
        self._pin_jit = jax.jit(
            lambda p, e: _preprocess(p["decoder"], dcfg, e)
        )
        self._run = make_pallas_decoder_segment(
            dcfg, B, t_cap, n_seg, interpret=interpret,
        )
        self._seg_jit = jax.jit(self._seg_fn)
        self._insert_jit = jax.jit(self._insert_fn, donate_argnums=(0,))
        self.dev = self._init_device_state(p_cast)

    # ------------------------------------------------------------ state
    def _init_device_state(self, p_cast):
        cfg, B, T = self.dcfg, self.B, self.t_cap
        E = cfg.encoder_embedding_dim
        H, Hd = cfg.attention_rnn_dim, cfg.decoder_rnn_dim
        MR = cfg.n_mel_channels * cfg.n_frames_per_step
        A = cfg.attention_params["attention_dim"]
        edt = p_cast["decoder"]["attention_rnn"]["weight_ih"].dtype
        z = jnp.zeros
        alpha0 = jnp.concatenate(
            [jnp.ones((B, 1), jnp.float32),
             z((B, T - 1), jnp.float32) + 1e-7], axis=1
        )
        # order: enc, pin, maskf, nf, mlen, then the kernel's st_shapes
        # order (din, ah, ac, dh, dc, ctx, aw, cum, alpha, u); rngs and
        # steps drive the per-slot prenet-mask schedule
        return dict(
            enc=z((B, T, E), edt),
            pin=z((B, T, A), jnp.float32),
            maskf=z((B, T), jnp.float32),
            nf=z((B, 1), jnp.int32),
            mlen=z((B, 1), jnp.int32),
            st=(
                z((B, MR), jnp.float32),
                z((B, H), jnp.float32), z((B, H), jnp.float32),
                z((B, Hd), jnp.float32), z((B, Hd), jnp.float32),
                z((B, E), jnp.float32),
                z((B, T), jnp.float32), z((B, T), jnp.float32),
                alpha0, 0.5 * jnp.ones((B, 1), jnp.float32),
            ),
            rngs=jnp.zeros((B, 2), jnp.uint32),
            steps=z((B,), jnp.int32),
        )

    def _seg_fn(self, w, dev):
        """One multiplexed segment: per-slot prenet masks (each slot's
        SOLO key schedule) + the batched segment kernel."""
        S = self.n_seg

        def per_slot(rng, step):
            return _prenet_masks(self.dcfg, rng, S, 1, start=step)[:, :, 0]

        pre = jnp.moveaxis(
            jax.vmap(per_slot)(dev["rngs"], dev["steps"]), 0, 2
        )  # (S, 2, B, P)
        outs = self._run(
            w, dev["enc"], dev["pin"], dev["maskf"], pre,
            dev["nf"], dev["mlen"], *dev["st"],
        )
        mels, gates, aligns, nf, mlen = outs[:5]
        st = outs[5:]
        new_dev = dict(
            dev, nf=nf, mlen=mlen, st=tuple(st),
            steps=dev["steps"] + S,
        )
        return new_dev, mels, nf, mlen

    def _insert_fn(self, dev, idx, enc_row, pin_row, mask_row, rng_row):
        """Admit a stream into slot ``idx``: fresh decoder state, its
        encoder conditioning, its rng, step 0."""
        B, T = self.B, self.t_cap

        def put(arr, row):
            return jax.lax.dynamic_update_slice_in_dim(
                arr, row.astype(arr.dtype), idx, axis=0
            )

        onehot = (jnp.arange(B) == idx)
        st0 = []
        for i, s in enumerate(dev["st"]):
            if i == 8:     # alpha: [1, 1e-7, ...]
                row = jnp.concatenate(
                    [jnp.ones((1, 1), s.dtype),
                     jnp.zeros((1, T - 1), s.dtype) + 1e-7], axis=1
                )
            elif i == 9:   # transition agent u: 0.5
                row = jnp.full((1, s.shape[1]), 0.5, s.dtype)
            else:
                row = jnp.zeros((1,) + s.shape[1:], s.dtype)
            st0.append(put(s, row))
        return dict(
            dev,
            enc=put(dev["enc"], enc_row),
            pin=put(dev["pin"], pin_row),
            maskf=put(dev["maskf"], mask_row),
            nf=put(dev["nf"], jnp.ones((1, 1), jnp.int32)),
            mlen=put(dev["mlen"], jnp.zeros((1, 1), jnp.int32)),
            st=tuple(st0),
            rngs=put(dev["rngs"], rng_row[None]),
            steps=jnp.where(onehot, 0, dev["steps"]),
        )

    # ---------------------------------------------------------- public
    def insert(self, idx: int, enc_row, n_in: int, rng_row,
               dec_params=None):
        if dec_params is not None:
            raise ValueError(
                "the kernel engine shares ONE VMEM-resident weight set; "
                "adapted voices need the XLA engine with "
                "per_slot_params=True"
            )
        pin_row = self._pin_jit(self._p_cast, enc_row)
        mask_row = sequence_mask(
            jnp.asarray([n_in], jnp.int32), self.t_cap
        ).astype(jnp.float32)
        self.dev = self._insert_jit(
            self.dev, jnp.asarray(idx, jnp.int32),
            enc_row, pin_row, mask_row, rng_row,
        )

    def seg(self):
        """Advance every slot one segment; returns host arrays
        ``(mels, nf (B,1), mlen (B,1))``."""
        self.dev, mels, nf, mlen = self._seg_jit(self._w, self.dev)
        return jax.device_get((mels, nf, mlen))

    def raw(self, mels_h, i):
        """Slot ``i``'s (n_mel, seg·r) raw frames from the kernel's
        (n_seg, B, MR) output layout — the solo wrapper's reshape
        applied to one row."""
        r = self.dcfg.n_frames_per_step
        return (
            np.asarray(mels_h[:, i])
            .reshape(self.n_seg * r, self.dcfg.n_mel_channels).T
        )


class _XlaEngine:
    """`decoder_infer_segment` vmapped over per-slot (state, rng).

    Each slot's state carries its OWN absolute ``step`` counter and key,
    so ``fold_in(rng_slot, step_slot)`` inside the shared step body
    (models/decoder.py:_infer_step) reproduces the solo stream's exact
    per-step dropout keys regardless of when the slot joined.  XLA
    batches the vmapped rows into single matmuls, so a tick costs close
    to one solo segment — no VMEM cap, no attention-config limits,
    usable at any n_slots.

    ``per_slot_params=True`` additionally vmaps over a stacked
    decoder-params table (one parameter set per slot, slot rows written
    at admission), so each slot decodes under its OWN adapted weights —
    the mode that serves concurrent few-shot adapted voices.  The
    matmuls become per-slot batched matmuls (weights can no longer be
    shared across rows), trading ~n_slots× decoder-weight HBM traffic
    for adapted-voice continuous batching.
    """

    def __init__(self, tts, dcfg, B, t_cap, n_seg,
                 per_slot_params: bool = False):
        self.dcfg = dcfg
        self.B, self.t_cap, self.n_seg = B, t_cap, n_seg
        self.per_slot = bool(per_slot_params)
        p_cast, _, _ = tts._cast_infer(
            tts.model_params, {}, jnp.zeros((), jnp.float32), batch=1
        )
        self._p_cast = p_cast
        self.edt = p_cast["decoder"]["attention_rnn"]["weight_ih"].dtype
        E = dcfg.encoder_embedding_dim
        st0 = decoder_stream_init(dcfg, 1, t_cap, self.edt)
        self.dev = dict(
            enc=jnp.zeros((B, 1, t_cap, E), self.edt),
            # il=1 (not 0) for empty slots: an all-masked attention row
            # would softmax to NaN; inactive rows must stay finite junk
            il=jnp.ones((B, 1), jnp.int32),
            st=jax.tree.map(
                lambda leaf: jnp.broadcast_to(
                    leaf[None], (B,) + leaf.shape
                ), st0,
            ),
            rngs=jnp.zeros((B, 2), jnp.uint32),
        )
        if self.per_slot:
            # stacked decoder weights, slot rows overwritten at insert;
            # initialized to the base model so empty slots stay finite
            self.dev["pdec"] = jax.tree.map(
                lambda leaf: jnp.stack([leaf] * B),
                p_cast["decoder"],
            )
        self._seg_jit = jax.jit(self._seg_fn)
        self._insert_jit = jax.jit(self._insert_fn, donate_argnums=(0,))

    def _seg_fn(self, dev):
        def one(pd, enc, il, rng, st):
            st2, mels, _, _ = decoder_infer_segment(
                pd, self.dcfg, enc, il, rng, st, self.n_seg,
            )
            return st2, mels[0].astype(jnp.float32)

        if self.per_slot:
            st2, mels = jax.vmap(one)(
                dev["pdec"], dev["enc"], dev["il"], dev["rngs"],
                dev["st"],
            )
        else:
            st2, mels = jax.vmap(
                lambda enc, il, rng, st: one(
                    self._p_cast["decoder"], enc, il, rng, st
                )
            )(dev["enc"], dev["il"], dev["rngs"], dev["st"])
        new_dev = dict(dev, st=st2)
        return new_dev, mels, st2["not_finished"], st2["mel_lengths"]

    def _insert_fn(self, dev, idx, enc_row, il_row, rng_row, pdec_row):
        def put(arr, row):
            return jax.lax.dynamic_update_slice_in_dim(
                arr, row.astype(arr.dtype), idx, axis=0
            )

        st0 = decoder_stream_init(self.dcfg, 1, self.t_cap, self.edt)
        new = dict(
            dev,
            enc=put(dev["enc"], enc_row[None]),
            il=put(dev["il"], il_row[None]),
            st=jax.tree.map(
                lambda leaf, r0: put(leaf, r0[None]), dev["st"], st0,
            ),
            rngs=put(dev["rngs"], rng_row[None]),
        )
        if self.per_slot:
            new["pdec"] = jax.tree.map(
                lambda leaf, row: put(leaf, row[None]),
                dev["pdec"], pdec_row,
            )
        return new

    # ---------------------------------------------------------- public
    def insert(self, idx: int, enc_row, n_in: int, rng_row,
               dec_params=None):
        if dec_params is not None and not self.per_slot:
            raise ValueError(
                "per-stream decoder params need per_slot_params=True"
            )
        if self.per_slot and dec_params is None:
            dec_params = self._p_cast["decoder"]
        # non-per-slot mode: _insert_fn never reads pdec_row, so don't
        # flatten/dispatch the whole decoder tree as a dead argument on
        # every admission — a scalar keeps the jit signature stable
        self.dev = self._insert_jit(
            self.dev, jnp.asarray(idx, jnp.int32), enc_row,
            jnp.asarray([n_in], jnp.int32), rng_row,
            dec_params if self.per_slot else jnp.zeros((), jnp.float32),
        )

    def seg(self):
        self.dev, mels, nf, mlen = self._seg_jit(self.dev)
        return jax.device_get((mels, nf, mlen))

    def raw(self, mels_h, i):
        return np.asarray(mels_h[i])    # already (n_mel, seg·r)


class _BaseVoiceKey:
    """Weakref-able stand-in key for voice=None in the per-Voice
    decoder-table cache (kept alive by the multiplexer itself)."""


class MuxSaturated(RuntimeError):
    """All slots busy AND the pending queue is at ``max_pending`` —
    the caller should shed load (server.py falls back to the solo
    time-sliced path and counts it in /stats)."""


class StreamMultiplexer:
    """Batch up to ``n_slots`` concurrent synthesize streams into one
    batched segment decode per tick.

    ``backend``: ``"pallas"`` (whole-segment kernel), ``"xla"``
    (vmapped segment scan), or ``"auto"`` — the kernel where it is
    supported, fits VMEM, and its measured batch gate says it wins
    (``pallas_decoder.profitable``: B ≤ 8 at every measured r), the
    XLA engine otherwise.

    ``per_slot_params=True`` selects the XLA engine with a stacked
    per-slot decoder-weights table so ``stream(..., voice=...)`` can
    serve concurrent few-shot ADAPTED voices (serving.Voice) with
    continuous batching — each slot decodes under its own weights.

    ``max_pending`` bounds the admission queue: beyond it ``stream()``
    raises :class:`MuxSaturated` instead of queueing unboundedly, so a
    server can shed to the solo path and report backpressure
    (``metrics()``: queue depth, active slots, rejected count).

    Construction compiles nothing; the first admitted stream pays the
    one-time segment/encode compiles (or loads them from the persistent
    cache).  ``stream()`` is thread-safe; a background worker owns all
    device calls, guarded by ``device_lock`` so it interleaves cleanly
    with the server's batched endpoint.
    """

    def __init__(self, tts, *, n_slots: int = 4, t_cap: int = 64,
                 segment_steps: int = 16, chunk_frames: int = 40,
                 vocode_ctx_frames: int = 16,
                 device_lock: threading.Lock | None = None,
                 backend: str = "auto",
                 per_slot_params: bool = False,
                 max_pending: int | None = None,
                 interpret: bool | None = None):
        cfg = tts.cfg
        dcfg = cfg.decoder_config()
        self.tts = tts
        self.cfg = cfg
        self.dcfg = dcfg
        self.B = int(n_slots)
        self.t_cap = int(t_cap)
        self.n_seg = int(segment_steps)
        self.chunk_frames = int(chunk_frames)
        self.vocode_ctx_frames = int(vocode_ctx_frames)
        self.per_slot_params = bool(per_slot_params)
        self.max_pending = None if max_pending is None else int(max_pending)
        self.interpret = (not on_tpu()) if interpret is None else interpret
        self.lock = device_lock or threading.Lock()
        self._rejected_total = 0
        self._admitted_total = 0
        # completed counts every terminated stream (errored included, so
        # in-flight = admitted - completed - queue_depth always balances);
        # errored counts the subset that ended with an exception
        self._completed_total = 0
        self._errored_total = 0
        # per-Voice cast decoder tables (weak — dropping a Voice frees
        # its device copies); _base_key stands in for voice=None
        self._dec_cache: weakref.WeakKeyDictionary = (
            weakref.WeakKeyDictionary()
        )
        self._base_key = _BaseVoiceKey()

        if self.per_slot_params and backend == "pallas":
            raise ValueError(
                "per_slot_params (adapted-voice mux) needs the XLA "
                "engine — the kernel engine shares one VMEM weight set"
            )
        if backend == "auto":
            p_cast, _, _ = tts._cast_infer(
                tts.model_params, {}, jnp.zeros((), jnp.float32),
                batch=1,
            )
            wdt = p_cast["decoder"]["attention_rnn"]["weight_ih"].dtype
            backend = "pallas" if (
                not self.per_slot_params
                and supports_config(dcfg)
                and profitable(self.B, dcfg.n_frames_per_step)
                and (self.interpret or fits_vmem(
                    dcfg._replace(max_decoder_steps=self.n_seg),
                    self.B, self.t_cap, wdt,
                ))
            ) else "xla"
        if backend == "pallas":
            self.engine = _KernelEngine(
                tts, dcfg, self.B, self.t_cap, self.n_seg,
                self.interpret,
            )
        elif backend == "xla":
            self.engine = _XlaEngine(
                tts, dcfg, self.B, self.t_cap, self.n_seg,
                per_slot_params=self.per_slot_params,
            )
        else:
            raise ValueError(f"unknown mux backend {backend!r}")
        self.backend = backend
        self._enc_jit, self._post_jit = _encpost_jits(tts)

        self._slots = [_Slot() for _ in range(self.B)]
        self._pending: list[tuple] = []
        self._cond = threading.Condition()
        self._stop = False
        # Per-slot advance work (postnet window + vocoder relay — each a
        # host→device round trip) overlaps across slots; compiled jax
        # executables are thread-safe and the per-tick barrier in _loop
        # keeps each stream's chunks ordered.
        self._adv_pool = ThreadPoolExecutor(
            max_workers=self.B, thread_name_prefix="mux-adv"
        )
        self._worker = threading.Thread(
            target=self._loop, name="stream-mux", daemon=True
        )
        self._worker.start()

    # ---------------------------------------------------------- public
    def metrics(self) -> dict:
        """Backpressure/observability snapshot (served under /stats)."""
        with self._cond:
            return {
                "n_slots": self.B,
                "backend": self.backend,
                "per_slot_params": self.per_slot_params,
                "active_slots": sum(s.active for s in self._slots),
                "queue_depth": len(self._pending),
                "max_pending": self.max_pending,
                "admitted_total": self._admitted_total,
                "completed_total": self._completed_total,
                "errored_total": self._errored_total,
                "rejected_total": self._rejected_total,
            }

    def stream(self, text: str, *, spk_emb=None, voice=None,
               vocoder: str = "griffinlim",
               rng: jax.Array | None = None):
        """Iterator of float32 wav chunks — the multiplexed equivalent
        of :meth:`AdaptiveTTS.synthesize_stream` (same audio bytes).

        ``voice`` (a :class:`serving.Voice`) streams under that voice's
        ADAPTED parameters: its encode/postnet run with the voice's
        params (per-stream jitted calls, same programs) and its decoder
        weights are written into the slot's row of the engine's stacked
        params table — requires ``per_slot_params=True``.

        Validation is EAGER (this is a plain function returning an
        iterator, not a generator): a too-long text raises ValueError
        and a full queue raises MuxSaturated here, before any slot is
        consumed, so a server can fall back to the solo path.  Once
        this returns, the stream decodes to completion whether or not
        the iterator is drained."""
        tts = self.tts
        if voice is not None and not self.per_slot_params:
            raise ValueError(
                "adapted voices need a per_slot_params=True multiplexer "
                "(per-slot decoder weights); this mux shares one "
                "parameter set"
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seq, _ = tts.g2p.convert(
            text, convert_mode="text_to_phone_to_idx",
            language=tts.params.get("language", "en-us"),
        )
        if len(seq) > self.t_cap:
            raise ValueError(
                f"text phonemizes to {len(seq)} symbols > mux t_cap "
                f"{self.t_cap}"
            )
        # shed load BEFORE paying the per-stream encode: the whole point
        # of backpressure is not spending device time on work we refuse.
        # The check is advisory under concurrency (two racers may both
        # pass), which is fine — max_pending bounds pressure, it is not
        # an exact semaphore.
        if self.max_pending is not None:
            with self._cond:
                # capacity = free slots + allowed queue: a burst that
                # arrives between worker ticks must not queue past
                # max_pending behind the streams that will grab the
                # free slots (gating on all-slots-busy alone lets the
                # queue grow unboundedly whenever one slot is free)
                free = sum(not s.active for s in self._slots)
                if len(self._pending) >= self.max_pending + free:
                    self._rejected_total += 1
                    raise MuxSaturated(
                        f"{self.B - free}/{self.B} slots busy and "
                        f"{len(self._pending)} streams already queued "
                        f"(max_pending={self.max_pending})"
                    )
        # device-resident per-Voice params (uploaded once, serving.py
        # _voice_arrays — re-uploading ~50 MB per admission dominated
        # adapted TTFA before this cache)
        params, state = tts._voice_arrays(voice)
        emb = np.asarray(
            voice.spk_emb if voice is not None else spk_emb, np.float32
        )
        padded = np.zeros((1, self.t_cap), np.int32)
        padded[0, : len(seq)] = seq

        dec_params = None
        if self.per_slot_params:
            # the engine table holds infer-dtype weights (same cast the
            # solo path applies before decoding); memoized per Voice —
            # the cast result is immutable and re-streaming the same
            # adapted voice is the common serving pattern
            key = voice if voice is not None else self._base_key
            dec_params = self._dec_cache.get(key)
            if dec_params is None:
                p_cast, _, _ = tts._cast_infer(
                    params, {}, jnp.zeros((), jnp.float32), batch=1
                )
                dec_params = p_cast["decoder"]
                self._dec_cache[key] = dec_params

        # encode OUTSIDE the worker tick (it's per-stream work and the
        # same jitted program the solo path runs — exactness contract);
        # adapted voices encode under THEIR params (params are program
        # arguments, so no new compile)
        with self.lock:
            enc_row, _ = self._enc_jit(
                params, state, jnp.asarray(padded),
                jnp.asarray([len(seq)], jnp.int32),
                jnp.asarray(emb[None]), rng,
            )
        k_dec = jax.random.fold_in(rng, 2)
        cursor = _stream_cursor(
            tts, params, state, self._post_jit,
            vocoder, rng, self.n_seg, self.chunk_frames,
            self.vocode_ctx_frames,
        )
        out: queue.SimpleQueue = queue.SimpleQueue()
        with self._cond:
            # old-style uint32 keys throughout the codebase — the key
            # rows live in the (B, 2) device table the engine consumes
            self._pending.append(
                (enc_row, len(seq), jnp.asarray(k_dec, jnp.uint32),
                 cursor, out, dec_params)
            )
            self._admitted_total += 1
            self._cond.notify()

        def drain():
            while True:
                item = out.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item

        return drain()

    def close(self):
        with self._cond:
            self._stop = True
            self._cond.notify()
        self._worker.join(timeout=10)
        self._adv_pool.shutdown(wait=False)

    # ---------------------------------------------------------- worker
    def _admit(self):
        """Move pending requests into free slots (device insert)."""
        for i, slot in enumerate(self._slots):
            with self._cond:
                if not self._pending:
                    break
                if slot.active:
                    continue
                (enc_row, n_in, rng_row, cursor, out,
                 dec_params) = self._pending.pop(0)
                # reserve the slot BEFORE the device insert: between the
                # pop and activation the stream would otherwise be
                # invisible to the admission bound (neither queued nor
                # active), letting a burst slip past max_pending
                slot.active = True
            try:
                with self.lock:
                    self.engine.insert(
                        i, enc_row, n_in, rng_row, dec_params=dec_params
                    )
            except BaseException as e:  # deliver to THIS stream only
                with self._cond:
                    self._errored_total += 1
                    self._completed_total += 1
                slot.active = False
                out.put(e)
                out.put(None)
                continue
            slot.cursor = cursor
            slot.out = out
            slot.step = 0
            slot.gen += 1

    def _loop(self):
        while True:
            with self._cond:
                while (not self._stop and not self._pending
                       and not any(s.active for s in self._slots)):
                    self._cond.wait()
                if self._stop:
                    for s in self._slots:
                        if s.active and s.out is not None:
                            s.out.put(None)
                    # pending (queued, never admitted) streams must get
                    # a terminal too, or their clients block in drain()
                    # forever when close() races an un-admitted stream
                    for p in self._pending:
                        p[4].put(None)
                    self._pending.clear()
                    return
            try:
                self._admit()
                with self.lock:
                    mels_h, nf_h, mlen_h = self.engine.seg()
            except BaseException as e:  # surface to every waiting client
                for s in self._slots:
                    if s.active and s.out is not None:
                        out = s.out
                        # account + free the slot BEFORE the client can
                        # observe the terminal chunk (same ordering as
                        # _advance_slot; keeps admitted==completed+inflight
                        # and drops the cursor's postnet/vocoder state)
                        with self._cond:
                            self._errored_total += 1
                            self._completed_total += 1
                        s.active = False
                        s.cursor = None
                        s.out = None
                        out.put(e)
                        out.put(None)
                continue
            futs = []
            for i, slot in enumerate(self._slots):
                if not slot.active:
                    continue
                slot.step += self.n_seg
                futs.append(self._adv_pool.submit(
                    self._advance_slot, slot, self.engine.raw(mels_h, i),
                    int(mlen_h[i, 0]), int(nf_h[i, 0]) == 0,
                ))
            for f in futs:      # barrier: keeps per-stream chunk order
                f.result()

    def _advance_slot(self, slot, raw, ml, finished):
        """Run one slot's host pipeline for this tick (postnet window →
        vocoder → chunk emit) — slots run concurrently in _adv_pool."""
        try:
            chunks, final = slot.cursor.advance(
                raw, ml=ml, finished=finished, n_steps=slot.step,
            )
            for c in chunks:
                slot.out.put(np.asarray(c, np.float32))
        except BaseException as e:
            with self._cond:
                self._errored_total += 1
            slot.out.put(e)
            final = True
        if final:
            # record completion BEFORE the terminal chunk is observable —
            # a client that drains the stream and immediately reads
            # /stats must see itself counted (same race class as
            # ServerStats' record-before-respond ordering)
            with self._cond:
                self._completed_total += 1
            out = slot.out
            slot.active = False
            slot.cursor = None
            slot.out = None
            out.put(None)
