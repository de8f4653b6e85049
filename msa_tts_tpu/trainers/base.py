"""Trainer base: experiment setup, jitted train/eval steps, checkpoints.

Plays the role of the reference's ``JointTrainer`` scaffolding
(msa_tts/baseline.py:22-175) with the TPU-native execution model: the
whole optimization step — forward, loss, backward, clip, optimizer
update, and the MCD metric — is one jitted XLA program; the host only
feeds cached numpy batches and logs scalars.

Behavioral parity notes:
  * Test/eval passes run the model in train mode like the reference
    (``model.train()`` + ``no_grad`` — baseline.py:254-260), i.e.
    batch-norm uses batch statistics and dropout stays active.
  * Gradient clipping is applied to fresh gradients (the reference
    clips before ``backward()``, a latent bug — see train_state.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import save_params
from ..dataloaders.collate import Batch
from ..models import (
    config_from_params,
    init_tacotron2nv,
    tacotron2nv_forward,
)
from ..models.loss import tacotron2_loss
from ..ops.metrics import mcd_batch
from ..utils.checkpoint import (
    load_checkpoint,
    load_partial_params,
    restore_like,
    save_checkpoint,
)
from ..utils.g2p.char_list import N_SYMBOLS
from ..utils.logging_utils import MetricsLogger
from ..utils.paths import PathManager
from .train_state import TrainState, clip_by_global_norm, make_optimizer


class TrainerBase:
    def __init__(self, **params):
        self.params = params
        if params.get("compilation_cache", True):
            from ..utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(
                params.get("compilation_cache_dir") or None
            )
        output_path = os.path.join(
            params["output_path"], params["method"], params["experiment_name"]
        )
        self.path_manager = PathManager(output_path)
        save_params(params, os.path.join(output_path, "params.yml"))
        self.logger = MetricsLogger(
            self.path_manager.logs_path,
            use_tensorboard=params.get("use_tensorboard", True),
        )
        self.step_global = 0

        # -------- failure detection (reference has none — SURVEY §5)
        self._preempt_guard = None
        if params.get("handle_preemption", True):
            from ..utils.preemption import PreemptionGuard

            self._preempt_guard = PreemptionGuard.shared()
        self._watchdog = None

        self._init_dataloaders()
        self._init_model()
        self._init_criterion_optimizer()
        self._init_parallel()

        if params.get("finetune", False):
            self._load_finetune_checkpoint()

    # ------------------------------------------------------------ setup
    def _init_dataloaders(self):  # overridden by subclasses
        raise NotImplementedError

    def _num_speakers(self) -> int:
        raise NotImplementedError

    def _init_model(self):
        params = self.params
        mp = dict(params["model"])
        mp["num_speakers"] = self._num_speakers()
        mp["n_symbols"] = N_SYMBOLS
        mp["n_mel_channels"] = params["audio_params"]["n_mels"]
        for k in ("freeze_charemb", "freeze_encoder", "freeze_decoder"):
            mp[k] = params.get(k, False)
        params["model"] = mp

        self.model_name = params.get("model_name", "Tacotron2NV")
        if self.model_name != "Tacotron2NV":
            raise NotImplementedError(self.model_name)
        self.speaker_emb_type = mp["speaker_emb_type"]
        self.cfg = config_from_params(mp)
        seed = params.get("model_seed", 0)
        self.init_rng = jax.random.PRNGKey(seed)
        self.model_params, self.model_state = init_tacotron2nv(
            self.init_rng, self.cfg
        )

    def _init_criterion_optimizer(self):
        params = self.params
        crit = params["criterion"]
        if crit.get("criterion_type", "Tacotron2Loss") != "Tacotron2Loss":
            raise RuntimeError(f"Criterion {crit} not defined.")
        self.loss_kwargs = dict(
            n_frames_per_step=self.cfg.n_frames_per_step,
            reduction=crit.get("reduction", "none"),
            pos_weight=float(crit.get("pos_weight", 1.0)),
        )
        self.tx = make_optimizer(params["optim"])
        self.inner_optim_cfg = params.get(
            "optim_inner", {"optimizer_type": "SGD", "lr": 1e-2}
        )
        self.train_state = TrainState(
            params=self.model_params,
            model_state=self.model_state,
            opt_state=self.tx.init(self.model_params),
            step=0,
        )
        self._train_step_jit = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval_step_jit = jax.jit(self._eval_step)

    # ------------------------------------------------------- step funcs
    def _cast_for_compute(self, params, model_state, batch):
        """Mixed precision: with ``compute_dtype: bfloat16`` the forward
        runs in bf16 (params cast inside the differentiated graph, so
        gradients land back on the fp32 master weights); the loss is
        always accumulated in fp32."""
        dtype = self.params.get("compute_dtype")
        if dtype not in ("bfloat16", "bf16"):
            return params, model_state, batch

        def cast(t):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )

        batch = dict(batch)
        for k in ("melspecs", "speaker_vecs"):
            if k in batch and batch[k].dtype == jnp.float32:
                batch[k] = batch[k].astype(jnp.bfloat16)
        return cast(params), cast(model_state), batch

    def _loss_for_batch(self, params, model_state, batch: dict, rng,
                        train: bool = True):
        # hold the PRE-cast ground truth for the loss: under bf16 the
        # teacher-forcing input may be cast, but the loss target must be
        # the original fp32 mels or gradients pull toward bf16-quantized
        # targets and eval losses stop being comparable to fp32 runs
        target_mels = batch["melspecs"]
        params, model_state, batch = self._cast_for_compute(
            params, model_state, batch
        )
        outs, new_state = tacotron2nv_forward(
            params,
            model_state,
            self.cfg,
            batch["inputs"],
            batch["input_lengths"],
            batch["melspecs"],
            batch["melspec_lengths"],
            batch["speaker_vecs"],
            rng,
            train=train,
        )
        # loss + carried state in fp32 regardless of compute dtype
        outs = [o.astype(jnp.float32) for o in outs]
        new_state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
            else x,
            new_state,
        )
        mel_out, mel_post, gate, align = outs
        loss = tacotron2_loss(
            (mel_out, mel_post, gate, align),
            (target_mels.astype(jnp.float32), batch["stop_labels"]),
            batch["melspec_lengths"],
            **self.loss_kwargs,
        )
        return loss, (outs, new_state)

    def _train_step(self, state: TrainState, batch: dict, rng):
        def loss_fn(p):
            return self._loss_for_batch(
                p, state.model_state, batch, rng, train=True
            )

        (loss, (outs, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if self.params.get("clip_grad_norm", False):
            grads, grad_norm = clip_by_global_norm(
                grads, float(self.params.get("grad_clip_thresh", 1.0))
            )
        else:
            grad_norm = jnp.asarray(0.0)

        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        mel_post = outs[1]
        mcd = mcd_batch(
            jnp.swapaxes(mel_post, 1, 2),
            jnp.swapaxes(batch["melspecs"], 1, 2),
            batch["melspec_lengths"],
        )
        metrics = {
            "loss": loss,
            "mcd": mcd,
            "grad_norm": grad_norm,
        }
        new_state = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics, outs

    def _eval_step(self, state: TrainState, batch: dict, rng):
        loss, (outs, new_model_state) = self._loss_for_batch(
            state.params, state.model_state, batch, rng, train=True
        )
        mel_post = outs[1]
        mcd = mcd_batch(
            jnp.swapaxes(mel_post, 1, 2),
            jnp.swapaxes(batch["melspecs"], 1, 2),
            batch["melspec_lengths"],
        )
        # The reference's eval runs in train mode, so batch-norm running
        # stats advance during testing as well; keep that behavior.
        new_state = state._replace(model_state=new_model_state)
        return new_state, {"loss": loss, "mcd": mcd}, outs

    # ------------------------------------------------------ parallelism
    def _init_parallel(self):
        """Multi-chip SPMD from config (the reference has no distributed
        training at all — SURVEY §2.8).  A ``parallel: {dp: N, task: K}``
        block builds a named device mesh; the train state is replicated,
        batches are sharded data-parallel on their leading axis and
        meta-episodes on the task axis, and GSPMD inserts the gradient
        psums — the step functions are unchanged."""
        self.mesh = None
        pcfg = self.params.get("parallel")
        if not pcfg:
            return
        from ..parallel import make_mesh, replicate_state
        from ..parallel.sharding import (
            batch_sharding,
            replicated,
            task_batch_sharding,
        )

        tp = int(pcfg.get("tp", 1))
        self.mesh = make_mesh(
            dp=pcfg.get("dp"), task=int(pcfg.get("task", 1)), tp=tp
        )
        self._batch_sharding = batch_sharding(self.mesh)
        self._task_sharding = task_batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        if tp > 1:
            # tensor parallel: weights/optimizer moments sharded over
            # the tp axis (parallel/tp.py), batch still over dp·task —
            # the step programs are unchanged; GSPMD partitions the
            # matmuls and inserts the tp collectives
            from ..parallel.tp import shard_tree_tp

            if int(pcfg.get("task", 1)) > 1:
                raise NotImplementedError(
                    "parallel: tp composes with dp, not with the "
                    "task axis (the shard_map meta layout manages its "
                    "own mesh) — use {dp, tp} or {dp, task}"
                )
            self.train_state = shard_tree_tp(self.train_state, self.mesh)
        else:
            self.train_state = replicate_state(self.train_state, self.mesh)
        shape_desc = "x".join(
            f"{k}={v}" for k, v in self.mesh.shape.items()
        )
        print(f"[parallel] SPMD mesh {shape_desc} "
              f"({self.mesh.size} devices)")

    @property
    def _data_axes_size(self) -> int:
        """Number of devices the batch axis is actually sharded over:
        dp·task only — NOT mesh.size, which also counts the tp axis
        (batch specs are P(("dp","task")); with dp=2,tp=4 a batch of 6
        must fall back on 6 % 2, not 6 % 8)."""
        return int(
            self.mesh.shape.get("dp", 1) * self.mesh.shape.get("task", 1)
        )

    def _put_batch(self, batch: dict) -> dict:
        """Place a host batch with the data-parallel layout (no-op
        without a mesh; a tail batch not divisible by the data axes is
        replicated — correct, just not parallel)."""
        if self.mesh is None:
            return batch
        B = int(next(iter(batch.values())).shape[0])
        sh = (
            self._batch_sharding
            if B % self._data_axes_size == 0 else self._replicated
        )
        return jax.device_put(batch, sh)

    def _put_task_batch(self, batch: dict) -> dict:
        """Place stacked (K, S, ...) episodes with the task-parallel
        layout (same divisibility fallback on K).  Single-device runs
        device_put explicitly too so a prefetching caller's upload is
        dispatched ahead of the step instead of inside it."""
        if self.mesh is None:
            return jax.device_put(batch)
        K = int(next(iter(batch.values())).shape[0])
        sh = (
            self._task_sharding
            if K % self._data_axes_size == 0 else self._replicated
        )
        return jax.device_put(batch, sh)

    # ----------------------------------------------------------- batches
    def _unpack_batch(self, batch: Batch) -> dict:
        """Build the jit-ready input dict from a host batch
        (reference _unpack_batch — msa_tts/baseline.py:107-129)."""
        return self._put_batch({
            "inputs": batch.inputs,
            "input_lengths": batch.input_lengths,
            "melspecs": batch.mels,
            "melspec_lengths": batch.mel_lengths,
            "speaker_vecs": batch.speaker_vecs(self.speaker_emb_type),
            "stop_labels": batch.stop_labels,
        })

    # ------------------------------------------------------ checkpoints
    def _ckpt_payload(self) -> dict:
        return {
            "params": self.train_state.params,
            "model_state": self.train_state.model_state,
            "opt_state": self.train_state.opt_state,
            "step": self.step_global,
        }

    def _save_checkpoint(self, name: str | None = None):
        if name is None:
            name = f"checkpoint_{self.step_global // 100}.ckpt"
        path = os.path.join(self.path_manager.checkpoints_path, name)
        save_checkpoint(path, self._ckpt_payload())
        return path

    def _load_finetune_checkpoint(self):
        path = self.params["finetune_checkpoint_path"]
        print(f"Loading checkpoint from  {path}")
        if path.endswith(".pt"):
            from ..utils.torch_import import load_torch_checkpoint

            ckpt_params, ckpt_state = load_torch_checkpoint(path, self.cfg)
            new_params = load_partial_params(
                self.train_state.params, ckpt_params
            )
            self.train_state = self.train_state._replace(
                params=new_params, model_state=ckpt_state
            )
        else:
            raw = load_checkpoint(path)
            new_params = load_partial_params(
                self.train_state.params,
                restore_like(self.train_state.params, raw["params"]),
            )
            # restore model_state (batch-norm running stats) too, like
            # the .pt branch — finetuning must not restart from init
            # statistics while using trained params
            new_ms = self.train_state.model_state
            if raw.get("model_state") is not None:
                new_ms = restore_like(new_ms, raw["model_state"])
            self.train_state = self.train_state._replace(
                params=new_params, model_state=new_ms
            )
        self._reshard_state()

    # ------------------------------------------------- preemption resume
    # Epoch-granular auto-resume for the epoch-loop trainers (baseline /
    # MAML / Reptile): the latest full-fidelity state plus a sidecar with
    # the epoch counter is persisted at every checkpoint interval, and
    # ``resume: true`` skips the completed epochs while replaying the rng
    # splits so the remaining stream is identical to an uninterrupted
    # run.  (The reference has no resume at all; its checkpoints are
    # params-only, msa_tts/baseline.py:150-158.)

    _AUTO_CKPT = "auto_resume.ckpt"
    _AUTO_STATE = "auto_resume_state.pkl"

    def _save_epoch_state(self, epoch: int, extra: dict | None = None):
        resume_state = {"epoch": epoch, "step_global": self.step_global}
        resume_state.update(extra or {})
        # ONE atomic file: the resume metadata rides inside the
        # checkpoint payload, so a kill can never leave a newer
        # checkpoint paired with an older epoch counter (or vice versa).
        payload = dict(self._ckpt_payload(), resume_state=resume_state)
        ckpt_path = os.path.join(
            self.path_manager.checkpoints_path, self._AUTO_CKPT
        )
        if self.params.get("async_checkpoint", True):
            # serialization + disk IO off-thread; the train loop pays
            # only the device→host snapshot
            if not hasattr(self, "_async_ckpt"):
                from ..utils.checkpoint import AsyncCheckpointer

                self._async_ckpt = AsyncCheckpointer()
            self._async_ckpt.save(ckpt_path, payload)
        else:
            save_checkpoint(ckpt_path, payload)

    def _finish_checkpoints(self):
        """Drain pending async checkpoint writes AND stop the worker
        thread (call at run() end and before anything reads the
        auto-resume files in-process).  Closing — not just waiting —
        matters for in-process sequential trainers (test suites, sweeps):
        each AsyncCheckpointer otherwise leaks a live thread for the
        process lifetime.  A later save lazily re-creates one."""
        if hasattr(self, "_async_ckpt"):
            self._async_ckpt.close()
            del self._async_ckpt

    def _try_resume_epoch(self):
        """Returns ``(completed_epochs, resume_state_dict | None)``."""
        import pickle

        if not self.params.get("resume", False):
            return 0, None
        from ..utils.checkpoint import wait_all_checkpoints

        wait_all_checkpoints()  # a prior in-process trainer may still write
        ckpt_path = os.path.join(
            self.path_manager.checkpoints_path, self._AUTO_CKPT
        )
        if not os.path.exists(ckpt_path):
            print("resume requested but no auto-resume state found; "
                  "starting fresh")
            return 0, None
        raw = load_checkpoint(ckpt_path)
        d = raw.get("resume_state")
        if d is None:
            # legacy two-file layout: epoch counter in a pickle sidecar
            state_path = os.path.join(
                self.path_manager.checkpoints_path, self._AUTO_STATE
            )
            if not os.path.exists(state_path):
                print("resume requested but no auto-resume state found; "
                      "starting fresh")
                return 0, None
            with open(state_path, "rb") as f:
                d = pickle.load(f)
        self.restore(ckpt_path)
        self.step_global = int(d["step_global"])
        print(
            f"Resuming after epoch {d['epoch']} (step {self.step_global})"
        )
        return int(d["epoch"]), d

    def restore(self, path: str):
        """Full-fidelity resume (params + optimizer + step)."""
        self.restore_raw(load_checkpoint(path))

    def restore_raw(self, raw: dict):
        self.train_state = TrainState(
            params=restore_like(self.train_state.params, raw["params"]),
            model_state=restore_like(
                self.train_state.model_state, raw["model_state"]
            ),
            opt_state=restore_like(
                self.train_state.opt_state, raw["opt_state"]
            ),
            step=int(raw["step"]),
        )
        self.step_global = int(raw["step"])
        self._reshard_state()

    def _reshard_state(self):
        """Re-place a freshly restored (host) train state on the mesh.
        Checkpoints are mesh-shape-agnostic numpy trees, so this is also
        the elastic-recovery path: restore on any device count."""
        if getattr(self, "mesh", None) is not None:
            if "tp" in self.mesh.shape and self.mesh.shape["tp"] > 1:
                from ..parallel.tp import shard_tree_tp

                self.train_state = shard_tree_tp(
                    self.train_state, self.mesh
                )
            else:
                from ..parallel import replicate_state

                self.train_state = replicate_state(
                    self.train_state, self.mesh
                )

    # ------------------------------------------------ failure detection
    def _preempt_requested(self) -> bool:
        """True once a preemption notice (SIGTERM) arrived; trainers
        poll this at safe boundaries and exit cleanly — ``resume: true``
        then continues bit-identically from the last saved state."""
        return (
            self._preempt_guard is not None
            and self._preempt_guard.should_stop
        )

    def _start_watchdog(self):
        """Arm the stall watchdog when ``stall_timeout_s`` is set: a
        train step that makes no progress for that long gets an
        all-thread stack dump in ``logs/stall_dump.txt``."""
        timeout = self.params.get("stall_timeout_s")
        if timeout:
            from ..utils.preemption import StallWatchdog

            self._watchdog = StallWatchdog(
                float(timeout),
                dump_path=os.path.join(
                    self.path_manager.logs_path, "stall_dump.txt"
                ),
            ).start()

    def _heartbeat(self):
        if self._watchdog is not None:
            self._watchdog.beat()

    def _stop_watchdog(self):
        if self._watchdog is not None:
            self._watchdog.stop()
            self._watchdog = None

    # ---------------------------------------------------------- logging
    def log_writer(self, logs: dict, type: str = "scalar"):
        if type == "scalar":
            self.logger.log_scalars(logs)
        elif type == "hist":
            self.logger.log_histograms(logs)
        else:
            raise NotImplementedError(type)

    def get_module_grads_flattened(self, grads, step):
        """Per-module flattened gradient vectors for histogram logging
        (reference baseline.py:160-175)."""
        out = {}
        for mod, sub in grads.items():
            leaves = jax.tree_util.tree_leaves(sub)
            if leaves:
                out["grad_" + mod] = (
                    np.concatenate(
                        [np.asarray(l).ravel() for l in leaves]
                    ),
                    step,
                )
        return out
