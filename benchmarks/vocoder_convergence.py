"""Vocoder-trainer convergence evidence: WaveRNN (MoL) and HiFi-GAN
trained on synthetic harmonic speech until reconstruction measurably
improves.

The reference ships only vocoder *inference* on externally-trained
checkpoints (msa_tts/utils/wavernn/wavernn.py:95, utils/hifigan);
the trainers here are beyond-reference capability, so this script is
their quality proof: train on a synthetic corpus, reconstruct held-out
segments from ground-truth mels at init / mid / end, and report

  * the training loss curve (WaveRNN NLL; HiFi-GAN mel-L1 component),
  * reconstruction mel-L1 (log-mel distance between vocoded audio and
    ground truth) decreasing from init to trained.

Run:  python benchmarks/vocoder_convergence.py [--wavernn_steps 400]
                                               [--hifigan_steps 400]
Prints one JSON line per row.  CPU-friendly tiny dims; the same
assertions run (smaller budget) in tests/test_vocoder_convergence.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _mel_l1(wav_a: np.ndarray, wav_b: np.ndarray, ap: dict) -> float:
    """Log-mel L1 distance between two waveforms (trimmed to the common
    length) — the standard vocoder reconstruction metric."""
    from msa_tts_tpu.ops.audio import melspec_ap2

    n = min(len(wav_a), len(wav_b))
    if n < ap["n_fft"]:
        return float("inf")
    _, _, ma = melspec_ap2(np.asarray(wav_a[:n], np.float32), ap, xp=np)
    _, _, mb = melspec_ap2(np.asarray(wav_b[:n], np.float32), ap, xp=np)
    return float(np.mean(np.abs(np.asarray(ma) - np.asarray(mb))))


AP2 = {
    "n_fft": 1024, "hop_size": 256, "win_size": 1024, "n_mels": 80,
    "sample_rate": 22050, "fmin": 0.0, "fmax": 8000.0, "center": False,
}


def _corpus(tmp: str, n_utts: int = 6):
    from msa_tts_tpu.dataloaders.synthetic import (
        make_synthetic_corpus,
        synthetic_params,
    )

    root = os.path.join(tmp, "corpus")
    if not os.path.isdir(root):
        make_synthetic_corpus(
            root, n_speakers=2, utterances_per_speaker=n_utts, seed=5,
            min_dur=0.5, max_dur=0.8,
        )
    return root, synthetic_params


def _eval_segments(root: str, n: int = 3, seg: int = 22050 // 2):
    """Held-out audio segments (not used as training crops verbatim)."""
    import glob

    from msa_tts_tpu.ops.audio import load_wav

    wavs = sorted(glob.glob(os.path.join(root, "wavs", "*", "*.wav")))
    segs = []
    for p in wavs[:n]:
        w = load_wav(p, target_sample_rate=22050)
        if len(w) >= seg:
            segs.append(np.asarray(w[:seg], np.float32))
    return segs


# ------------------------------------------------------------- WaveRNN
def run_wavernn(tmp: str, n_steps: int, eval_every: int | None = None):
    from msa_tts_tpu.trainers.wavernn_train import WaveRNNTrainer
    from msa_tts_tpu.vocoders.wavernn import WaveRNN

    root, synthetic_params = _corpus(tmp)
    params = synthetic_params(root, n_speakers=2, batch_size=4)
    params.update(
        method="wavernn", experiment_name="conv",
        use_tensorboard=False,
        voc_mode="MOL", rnn_dims=64, fc_dims=64, compute_dims=32,
        res_out_dims=32, res_blocks=2, pad=2,
        upsample_factors=(4, 8, 8), seq_len=1024,
        n_steps=n_steps, batch_size=4, lr=3e-3,
        tb_log_interval=max(1, n_steps // 50), print_interval=10 ** 9,
        ckpt_save_step_interval=10 ** 9,
        output_path=os.path.join(tmp, "wavernn_out"),
    )
    t = WaveRNNTrainer(**params)
    segs = _eval_segments(root)

    def recon_l1(model_params):
        voc = WaveRNN(params=model_params, state=t.model_state, cfg=t.cfg)
        from msa_tts_tpu.ops.audio import melspec_ap

        ap = params["audio_params"]
        dists = []
        for w in segs:
            _, _, mel = melspec_ap(w, ap, xp=np)
            out = np.asarray(voc.generate(
                np.asarray(mel, np.float32)[None], batched=False,
                verbose=False, rng=jax.random.PRNGKey(0),
            ))
            dists.append(_mel_l1(out.astype(np.float32), w, AP2))
        return float(np.mean(dists))

    l1_init = recon_l1(t.model_params)
    final_nll = t.run()
    l1_end = recon_l1(t.model_params)

    losses = [
        rec["value"]
        for rec in map(json.loads, open(t.logger.jsonl_path))
        if rec["tag"] == "train/nll"
    ]
    return {
        "vocoder": "wavernn", "steps": n_steps,
        "nll_first": round(losses[0], 4),
        "nll_last": round(float(final_nll), 4),
        "recon_mel_l1_init": round(l1_init, 4),
        "recon_mel_l1_trained": round(l1_end, 4),
    }


# ------------------------------------------------------------- HiFi-GAN
def run_hifigan(tmp: str, n_steps: int):
    from msa_tts_tpu.trainers.hifigan_train import HiFiGANTrainer
    from msa_tts_tpu.vocoders.hifigan import HiFiGAN

    root, synthetic_params = _corpus(tmp)
    params = synthetic_params(root, n_speakers=2, batch_size=4)
    params.update(
        method="hifigan", experiment_name="conv",
        use_tensorboard=False,
        audio_processor="ap2",
        audio_params=dict(AP2),
        hifigan={
            "resblock": "2",
            "upsample_rates": [8, 8, 4],
            "upsample_kernel_sizes": [16, 16, 8],
            "upsample_initial_channel": 64,
            "resblock_kernel_sizes": [3, 5],
            "resblock_dilation_sizes": [[1, 3], [1, 3]],
        },
        segment_size=4096, n_steps=n_steps, batch_size=4, lr=2e-4,
        tb_log_interval=max(1, n_steps // 50), print_interval=10 ** 9,
        ckpt_save_step_interval=10 ** 9,
        output_path=os.path.join(tmp, "hifigan_out"),
    )
    t = HiFiGANTrainer(**params)
    segs = _eval_segments(root)

    def recon_l1(gen_params):
        voc = HiFiGAN.from_params(gen_params, params["hifigan"])
        from msa_tts_tpu.ops.audio import melspec_ap2

        dists = []
        for w in segs:
            _, _, mel = melspec_ap2(w, AP2, xp=np)
            out = np.asarray(voc.inference(np.asarray(mel, np.float32)))
            dists.append(_mel_l1(out.astype(np.float32), w, AP2))
        return float(np.mean(dists))

    l1_init = recon_l1(t.gen_params)
    t.run()
    l1_end = recon_l1(t.gen_params)

    mel_losses = [
        json.loads(line)["value"]
        for line in open(t.logger.jsonl_path)
        if json.loads(line)["tag"] == "train/loss_mel"
    ]
    return {
        "vocoder": "hifigan", "steps": n_steps,
        "mel_loss_first": round(mel_losses[0], 4),
        "mel_loss_last": round(mel_losses[-1], 4),
        "recon_mel_l1_init": round(l1_init, 4),
        "recon_mel_l1_trained": round(l1_end, 4),
    }


def main():
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--wavernn_steps", type=int, default=400)
    ap.add_argument("--hifigan_steps", type=int, default=400)
    ap.add_argument("--skip_wavernn", action="store_true")
    ap.add_argument("--skip_hifigan", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="voc_conv_")
    if not args.skip_wavernn:
        print(json.dumps(run_wavernn(tmp, args.wavernn_steps)))
    if not args.skip_hifigan:
        print(json.dumps(run_hifigan(tmp, args.hifigan_steps)))


if __name__ == "__main__":
    main()
