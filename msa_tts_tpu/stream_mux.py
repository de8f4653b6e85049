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

Scope: all streams share ONE parameter set (the server's base model —
per-stream adapted-voice params would need per-slot weights, defeating
the shared-weights batching).  Per-stream speaker embeddings are fine:
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
            tts.model_params, {}, jnp.zeros((), jnp.float32)
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
    def insert(self, idx: int, enc_row, n_in: int, rng_row):
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
    """

    def __init__(self, tts, dcfg, B, t_cap, n_seg):
        self.dcfg = dcfg
        self.B, self.t_cap, self.n_seg = B, t_cap, n_seg
        p_cast, _, _ = tts._cast_infer(
            tts.model_params, {}, jnp.zeros((), jnp.float32)
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
        self._seg_jit = jax.jit(self._seg_fn)
        self._insert_jit = jax.jit(self._insert_fn, donate_argnums=(0,))

    def _seg_fn(self, dev):
        def one(enc, il, rng, st):
            st2, mels, _, _ = decoder_infer_segment(
                self._p_cast["decoder"], self.dcfg, enc, il, rng, st,
                self.n_seg,
            )
            return st2, mels[0].astype(jnp.float32)

        st2, mels = jax.vmap(one)(
            dev["enc"], dev["il"], dev["rngs"], dev["st"]
        )
        new_dev = dict(dev, st=st2)
        return new_dev, mels, st2["not_finished"], st2["mel_lengths"]

    def _insert_fn(self, dev, idx, enc_row, il_row, rng_row):
        def put(arr, row):
            return jax.lax.dynamic_update_slice_in_dim(
                arr, row.astype(arr.dtype), idx, axis=0
            )

        st0 = decoder_stream_init(self.dcfg, 1, self.t_cap, self.edt)
        return dict(
            dev,
            enc=put(dev["enc"], enc_row[None]),
            il=put(dev["il"], il_row[None]),
            st=jax.tree.map(
                lambda leaf, r0: put(leaf, r0[None]), dev["st"], st0,
            ),
            rngs=put(dev["rngs"], rng_row[None]),
        )

    # ---------------------------------------------------------- public
    def insert(self, idx: int, enc_row, n_in: int, rng_row):
        self.dev = self._insert_jit(
            self.dev, jnp.asarray(idx, jnp.int32), enc_row,
            jnp.asarray([n_in], jnp.int32), rng_row,
        )

    def seg(self):
        self.dev, mels, nf, mlen = self._seg_jit(self.dev)
        return jax.device_get((mels, nf, mlen))

    def raw(self, mels_h, i):
        return np.asarray(mels_h[i])    # already (n_mel, seg·r)


class StreamMultiplexer:
    """Batch up to ``n_slots`` concurrent synthesize streams into one
    batched segment decode per tick.

    ``backend``: ``"pallas"`` (whole-segment kernel), ``"xla"``
    (vmapped segment scan), or ``"auto"`` — the kernel where it is
    supported, fits VMEM, and its measured batch gate says it wins
    (``pallas_decoder.profitable``: B ≤ 4), the XLA engine otherwise.

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
        self.interpret = (not on_tpu()) if interpret is None else interpret
        self.lock = device_lock or threading.Lock()

        if backend == "auto":
            p_cast, _, _ = tts._cast_infer(
                tts.model_params, {}, jnp.zeros((), jnp.float32)
            )
            wdt = p_cast["decoder"]["attention_rnn"]["weight_ih"].dtype
            backend = "pallas" if (
                supports_config(dcfg) and profitable(self.B)
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
                tts, dcfg, self.B, self.t_cap, self.n_seg
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
    def stream(self, text: str, *, spk_emb=None, vocoder: str = "griffinlim",
               rng: jax.Array | None = None):
        """Iterator of float32 wav chunks — the multiplexed equivalent
        of :meth:`AdaptiveTTS.synthesize_stream` (same audio bytes).

        Validation is EAGER (this is a plain function returning an
        iterator, not a generator): a too-long text raises ValueError
        here, before any slot is consumed, so a server can fall back to
        the solo path.  Once this returns, the stream decodes to
        completion whether or not the iterator is drained."""
        tts = self.tts
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
        padded = np.zeros((1, self.t_cap), np.int32)
        padded[0, : len(seq)] = seq
        emb = np.asarray(spk_emb, np.float32)

        # encode OUTSIDE the worker tick (it's per-stream work and the
        # same jitted program the solo path runs — exactness contract)
        with self.lock:
            enc_row, _ = self._enc_jit(
                tts.model_params, tts.model_state, jnp.asarray(padded),
                jnp.asarray([len(seq)], jnp.int32),
                jnp.asarray(emb[None]), rng,
            )
        k_dec = jax.random.fold_in(rng, 2)
        cursor = _stream_cursor(
            tts, tts.model_params, tts.model_state, self._post_jit,
            vocoder, rng, self.n_seg, self.chunk_frames,
            self.vocode_ctx_frames,
        )
        out: queue.SimpleQueue = queue.SimpleQueue()
        with self._cond:
            # old-style uint32 keys throughout the codebase — the key
            # rows live in the (B, 2) device table the engine consumes
            self._pending.append(
                (enc_row, len(seq), jnp.asarray(k_dec, jnp.uint32),
                 cursor, out)
            )
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
            if not self._pending:
                break
            if slot.active:
                continue
            enc_row, n_in, rng_row, cursor, out = self._pending.pop(0)
            with self.lock:
                self.engine.insert(i, enc_row, n_in, rng_row)
            slot.active = True
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
                    return
            try:
                self._admit()
                with self.lock:
                    mels_h, nf_h, mlen_h = self.engine.seg()
            except BaseException as e:  # surface to every waiting client
                for s in self._slots:
                    if s.active and s.out is not None:
                        s.out.put(e)
                        s.out.put(None)
                        s.active = False
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
            slot.out.put(e)
            final = True
        if final:
            slot.out.put(None)
            slot.active = False
            slot.cursor = None
            slot.out = None
