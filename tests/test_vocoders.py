"""Vocoder tests: HiFi-GAN torch parity, WaveRNN shapes/generation,
fold/xfade math, MoL distribution sanity, denoiser."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tts_tpu.vocoders import wavernn as W
from msa_tts_tpu.vocoders.hifigan import (
    generator_apply,
    init_generator,
)

H_TINY = {
    "resblock": "1",
    "upsample_rates": [4, 4],
    "upsample_kernel_sizes": [8, 8],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
}


def test_hifigan_shapes(rng):
    params = init_generator(rng, H_TINY, n_mels=20)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 13)),
                      dtype=jnp.float32)
    wav = generator_apply(params, H_TINY, mel)
    assert wav.shape == (2, 13 * 16)  # total upsample 4·4
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_hifigan_matches_torch_generator():
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from msa_tts.utils.hifigan.models import Generator
    except Exception:
        pytest.skip("reference hifigan not importable")
    from msa_tts_tpu.vocoders.hifigan import (
        AttrDict,
        generator_params_from_state_dict,
    )

    h = AttrDict(dict(H_TINY))
    torch.manual_seed(0)
    # reference Generator hard-codes 80 input mels
    gen = Generator(h)
    gen.eval()
    gen.remove_weight_norm()
    sd = {k: v.numpy() for k, v in gen.state_dict().items()}
    params = generator_params_from_state_dict(sd, h)

    mel = np.random.default_rng(1).standard_normal((1, 80, 11)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = gen(torch.from_numpy(mel)).numpy()[:, 0, :]
    ours = np.asarray(generator_apply(params, dict(h), jnp.asarray(mel)))
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


TINY_WRNN = W.WaveRNNConfig(
    mode="MOL",
    n_mels=20,
    rnn_dims=24,
    fc_dims=24,
    compute_dims=16,
    res_out_dims=16,
    res_blocks=2,
    hop_length=32,
    sample_rate=8000,
    pad=2,
    upsample_factors=(4, 8),
)


def test_wavernn_forward_shapes(rng):
    params, state = W.init_wavernn(rng, TINY_WRNN)
    T_mel = 12
    T = (T_mel - 2 * TINY_WRNN.pad) * TINY_WRNN.hop_length
    mels = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, T_mel)),
        dtype=jnp.float32,
    )
    x = jnp.zeros((2, T))
    logits = W.wavernn_forward(params, state, TINY_WRNN, x, mels)
    assert logits.shape == (2, T, 30)


def test_wavernn_generate(rng):
    voc = W.WaveRNN(cfg=TINY_WRNN, rng=rng)
    mels = np.random.default_rng(0).standard_normal((1, 20, 10)).astype(
        np.float32
    )
    wav = voc.generate(
        mels, batched=True, target=64, overlap=16,
        rng=jax.random.PRNGKey(0), verbose=False,
    )
    assert wav.shape == ((10 - 1) * TINY_WRNN.hop_length,)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_wavernn_generate_unbatched(rng):
    voc = W.WaveRNN(cfg=TINY_WRNN, rng=rng)
    mels = np.random.default_rng(0).standard_normal((1, 20, 8)).astype(
        np.float32
    )
    wav = voc.generate(
        mels, batched=False, rng=jax.random.PRNGKey(0), verbose=False
    )
    assert wav.shape == ((8 - 1) * TINY_WRNN.hop_length,)


def test_fold_and_xfade_geometry():
    """Fold windows share `overlap` frames; unfold restores the original
    timeline outside the crossfade regions (the fade windows carve a
    deliberate silence gap for RNN warmup, reference wavernn.py:282-285)."""
    target, overlap = 32, 8
    T = 200
    x = np.arange(T, dtype=np.float32).reshape(1, T, 1)
    folded = W.fold_with_overlap(x, target, overlap)
    # each fold starts target+overlap after the previous, spans +2·overlap
    assert folded.shape[1] == target + 2 * overlap
    np.testing.assert_array_equal(
        folded[1, :overlap, 0], folded[0, target + overlap :, 0]
    )

    y = folded[:, :, 0].astype(np.float64)
    rec = W.xfade_and_unfold(y.copy(), target, overlap)
    assert len(rec) >= T
    # interior of each fold (between crossfade regions) is untouched
    np.testing.assert_allclose(
        rec[overlap : target + overlap - overlap],
        np.arange(overlap, target, dtype=np.float64),
    )


def test_mol_sampling_statistics(rng):
    """Sampling from a single sharp logistic recovers its mean."""
    B, K = 512, 10
    logits = np.zeros((B, 3 * K), np.float32)
    logits[:, 0] = 10.0          # mixture 0 dominates
    logits[:, K] = 0.3           # mean of mixture 0
    logits[:, 2 * K :] = -6.0    # small scale
    s = W.sample_from_discretized_mix_logistic(
        jnp.asarray(logits), jax.random.PRNGKey(0)
    )
    assert abs(float(s.mean()) - 0.3) < 0.01


def test_mol_loss_prefers_correct_mean():
    K = 10
    y = jnp.full((4, 16, 1), 0.25)
    good = np.zeros((4, 16, 3 * K), np.float32)
    good[..., K:2 * K] = 0.25
    bad = good.copy()
    bad[..., K:2 * K] = -0.75
    lg = float(W.discretized_mix_logistic_loss(jnp.asarray(good), y))
    lb = float(W.discretized_mix_logistic_loss(jnp.asarray(bad), y))
    assert lg < lb


@pytest.mark.slow
def test_mol_loss_gradient_recovers_mean():
    """Minimizing the MoL NLL by gradient descent on the mean heads must
    converge to the data value (functional correctness of the loss)."""
    K = 10
    y = jnp.full((2, 8, 1), 0.4)
    logits0 = jnp.zeros((2, 8, 3 * K))

    def loss(lg):
        return W.discretized_mix_logistic_loss(lg, y)

    l0 = float(loss(logits0))
    lg = logits0
    for _ in range(200):
        lg = lg - 0.5 * jax.grad(loss)(lg)
    means = np.asarray(lg[..., K : 2 * K])
    # loss decreases and the mixture means move toward the data value
    assert float(loss(lg)) < l0
    assert means.mean() > 0.1
    assert (np.diff([0.0, means.mean()]) > 0).all()


def test_denoiser_reduces_noise():
    from msa_tts_tpu.vocoders.denoiser import reduce_noise

    sr = 8000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    clean = 0.5 * np.sin(2 * np.pi * 440 * t)
    noise = 0.1 * rng.standard_normal(sr)
    noisy = (clean + noise).astype(np.float32)
    out = reduce_noise(
        noisy, noise.astype(np.float32),
        n_fft=512, win_length=512, hop_length=128, n_std_thresh=1.0,
    )
    assert out.shape == noisy.shape

    # Noise-band energy (away from the 440 Hz tone) must drop sharply
    # while the tone's band survives.
    def band_energy(x, lo, hi):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        sel = (freqs >= lo) & (freqs < hi)
        return float((spec[sel] ** 2).sum())

    noise_band_before = band_energy(noisy, 1500, 3500)
    noise_band_after = band_energy(out, 1500, 3500)
    tone_before = band_energy(noisy, 400, 480)
    tone_after = band_energy(out, 400, 480)
    assert noise_band_after < 0.05 * noise_band_before
    assert tone_after > 0.08 * tone_before


@pytest.mark.parametrize("use_aux_net", [True, False])
def test_wavernn_basic_upsample_matches_torch(use_aux_net):
    """use_upsample_net=False path vs the reference's basic ``Upsample``
    (linear interpolation, align_corners, 0.045 scale —
    msa_tts/utils/wavernn/modules.py:95-115)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from msa_tts.utils.wavernn.modules import Upsample
    except Exception:
        pytest.skip("reference wavernn modules not importable")

    cfg = W.WaveRNNConfig(
        mode="MOL", n_mels=20, rnn_dims=24, fc_dims=24, compute_dims=16,
        res_out_dims=16, res_blocks=2, hop_length=32, sample_rate=8000,
        pad=2, upsample_factors=(4, 8), use_upsample_net=False,
        use_aux_net=use_aux_net,
    )
    ref = Upsample(
        scale=cfg.hop_length, pad=cfg.pad, res_blocks=cfg.res_blocks,
        feat_dims=cfg.n_mels, compute_dims=cfg.compute_dims,
        res_out_dims=cfg.res_out_dims, use_aux_net=use_aux_net,
    ).eval()

    params, state = W.init_wavernn(jax.random.PRNGKey(0), cfg)
    # copy the torch resnet weights into our pytree so aux matches
    if use_aux_net:
        fake = {f"upsample.{k}": v.detach().numpy()
                for k, v in ref.state_dict().items()
                if k.startswith("resnet")}
        import numpy as _np

        def g(k):
            return jnp.asarray(_np.asarray(fake[k], _np.float32))

        rn = "upsample.resnet"
        bn_p = {"weight": g(f"{rn}.batch_norm.weight"),
                "bias": g(f"{rn}.batch_norm.bias")}
        bn_s = {"running_mean": g(f"{rn}.batch_norm.running_mean"),
                "running_var": g(f"{rn}.batch_norm.running_var")}
        layers, layer_states = [], []
        i = 0
        while f"{rn}.layers.{i}.conv1.weight" in fake:
            layers.append({
                "conv1": {"weight": g(f"{rn}.layers.{i}.conv1.weight")},
                "conv2": {"weight": g(f"{rn}.layers.{i}.conv2.weight")},
                "batch_norm1": {
                    "weight": g(f"{rn}.layers.{i}.batch_norm1.weight"),
                    "bias": g(f"{rn}.layers.{i}.batch_norm1.bias")},
                "batch_norm2": {
                    "weight": g(f"{rn}.layers.{i}.batch_norm2.weight"),
                    "bias": g(f"{rn}.layers.{i}.batch_norm2.bias")},
            })
            layer_states.append({
                "batch_norm1": {
                    "running_mean":
                        g(f"{rn}.layers.{i}.batch_norm1.running_mean"),
                    "running_var":
                        g(f"{rn}.layers.{i}.batch_norm1.running_var")},
                "batch_norm2": {
                    "running_mean":
                        g(f"{rn}.layers.{i}.batch_norm2.running_mean"),
                    "running_var":
                        g(f"{rn}.layers.{i}.batch_norm2.running_var")},
            })
            i += 1
        params["upsample"]["resnet"] = {
            "conv_in": {"weight": g(f"{rn}.conv_in.weight")},
            "batch_norm": bn_p,
            "layers": layers,
            "conv_out": {"weight": g(f"{rn}.conv_out.weight"),
                         "bias": g(f"{rn}.conv_out.bias")},
        }
        state["upsample"]["resnet"] = {
            "batch_norm": bn_s, "layers": layer_states,
        }

    T_mel = 12
    mels = np.random.default_rng(0).standard_normal(
        (1, cfg.n_mels, T_mel)
    ).astype(np.float32)
    with torch.no_grad():
        m_ref, aux_ref = ref(torch.from_numpy(mels))
    m_jax, aux_jax = W.upsample_apply(
        params["upsample"], state["upsample"], cfg,
        jnp.asarray(mels), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(m_jax), m_ref.numpy(), atol=1e-5
    )
    if use_aux_net:
        np.testing.assert_allclose(
            np.asarray(aux_jax), aux_ref.numpy(), atol=1e-4
        )
    else:
        assert aux_jax is None and aux_ref is None


def test_wavernn_basic_upsample_generate(rng):
    """End-to-end generation with use_upsample_net=False produces the
    contract-length waveform."""
    cfg = W.WaveRNNConfig(
        mode="MOL", n_mels=20, rnn_dims=24, fc_dims=24, compute_dims=16,
        res_out_dims=16, res_blocks=2, hop_length=32, sample_rate=8000,
        pad=2, upsample_factors=(4, 8), use_upsample_net=False,
    )
    voc = W.WaveRNN(cfg=cfg, rng=rng)
    T_mel = 10
    mels = np.random.default_rng(1).standard_normal(
        (1, cfg.n_mels, T_mel)
    ).astype(np.float32)
    wav = voc.generate(mels, batched=False, rng=rng, verbose=False)
    assert wav.shape == ((T_mel - 1) * cfg.hop_length,)
    assert np.isfinite(wav).all()


def test_wavernn_scan_matches_teacher_forced_forward(rng):
    """The generation scan (hoisted conditioning projection, _mm-based
    cells) must be exactly the same function as the batched
    teacher-forced forward when fed its own samples — this pins the
    hoisting/casting refactor to the reference computation."""
    voc = W.WaveRNN(cfg=TINY_WRNN, rng=rng, gen_dtype=None)
    cfg = TINY_WRNN
    T_mel = 8
    mels = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (1, cfg.n_mels, T_mel)
        ).astype(np.float32)
    )
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (cfg.pad, cfg.pad)))
    mels_up, aux = voc._upsample(
        voc.params["upsample"], voc.state["upsample"], mels_p
    )
    gen_rng = jax.random.PRNGKey(42)
    samples = np.asarray(
        voc._run(voc._gen_params, mels_up, aux, gen_rng)
    )[0]
    T = samples.shape[0]

    # teacher-forced forward with the scan's own sample history
    x_prev = jnp.asarray(
        np.concatenate([[0.0], samples[:-1]]).astype(np.float32)
    )[None]
    logits = W.wavernn_forward(
        voc.params, voc.state, cfg, x_prev, mels_p, train=False
    )
    gumbel, logistic = W._generation_noise(cfg, gen_rng, T, 1)
    resampled = jax.vmap(
        lambda lg, g, lo: W._sample_mol_noise(lg[None], g, lo)[0]
    )(logits[0], gumbel[:, 0:1], logistic[:, 0])
    np.testing.assert_allclose(
        np.asarray(resampled), samples, atol=1e-4,
        err_msg="scan diverges from the batched forward",
    )


def test_wavernn_bf16_generation_close_to_fp32(rng):
    """bf16-weight generation must produce a waveform in range with the
    same contract length; first samples should track fp32 closely (the
    autoregressive paths may diverge later by sampling)."""
    mels = np.random.default_rng(5).standard_normal(
        (1, TINY_WRNN.n_mels, 10)
    ).astype(np.float32)
    v32 = W.WaveRNN(cfg=TINY_WRNN, rng=rng, gen_dtype=None)
    v16 = W.WaveRNN(cfg=TINY_WRNN, rng=rng, gen_dtype="bfloat16")
    w32 = v32.generate(mels, batched=False,
                       rng=jax.random.PRNGKey(7), verbose=False)
    w16 = v16.generate(mels, batched=False,
                       rng=jax.random.PRNGKey(7), verbose=False)
    assert w16.shape == w32.shape
    assert np.isfinite(w16).all() and np.abs(w16).max() <= 1.0
    assert abs(w16[0] - w32[0]) < 0.15


def test_hifigan_inference_batch_matches_single(rng):
    """inference_batch pads/stacks variably-sized mels into one
    generator pass and must agree with per-mel inference over the FULL
    waveform, tail included: zero-fill padding + per-layer length
    masking reproduce the single path's implicit conv zero padding
    exactly, so a request's audio cannot depend on its batchmates."""
    from msa_tts_tpu.vocoders.hifigan import HiFiGAN, init_generator

    params = init_generator(rng, H_TINY, n_mels=20)
    voc = HiFiGAN.from_params(params, H_TINY)
    r = np.random.default_rng(1)
    mels = [
        r.standard_normal((20, t)).astype(np.float32)
        for t in (13, 29, 32)
    ]
    hop = 16  # 4·4
    singles = [np.asarray(voc.inference(m)) for m in mels]
    batched = voc.inference_batch(mels)
    for s, b, m in zip(singles, batched, mels):
        n = m.shape[1] * hop
        assert b.shape == (n,)
        np.testing.assert_allclose(b, s, atol=1e-5, err_msg=f"T={m.shape[1]}")
    # and batch composition must not matter: same mel, different partner
    alt = voc.inference_batch([mels[0], mels[1][:, :17]])[0]
    np.testing.assert_allclose(alt, batched[0], atol=1e-5)


def test_resolve_kernel_backend_validates_choice():
    """Typos must raise, not silently fall back to platform detection
    (an operator forcing the kernel on would otherwise unknowingly run
    the XLA path); explicit choices are case-insensitive."""
    from msa_tts_tpu.utils.backend import resolve_kernel_backend

    assert resolve_kernel_backend("Pallas") == "pallas"
    assert resolve_kernel_backend("XLA") == "xla"
    assert resolve_kernel_backend(None) in ("pallas", "xla")
    assert resolve_kernel_backend("auto") in ("pallas", "xla")
    with pytest.raises(ValueError, match="palas"):
        resolve_kernel_backend("palas")


def test_gen_backend_auto_resolution_reaches_run(monkeypatch):
    """gen_backend='auto' must bake the RESOLVED backend into every
    generation program, the unbatched self._run included — passing the
    unresolved 'auto' string through would silently run the XLA scan on
    TPU hardware (where auto means the Pallas kernel)."""
    import inspect

    from msa_tts_tpu.utils import backend as B

    monkeypatch.setattr(B, "on_tpu", lambda: True)
    voc = W.WaveRNN(cfg=TINY_WRNN, rng=jax.random.PRNGKey(0))
    assert voc.gen_backend == "pallas"
    cv = inspect.getclosurevars(voc._run.__wrapped__)
    inner = inspect.getclosurevars(cv.nonlocals["run_with_noise"])
    assert inner.nonlocals["backend"] == "pallas"


def test_fold_sub_overlap_input_not_empty():
    """Round-5 review: a conditioning sequence SHORTER than the overlap
    used to produce zero folds (negative floor-div) — silently empty
    audio.  It must fold to one padded row instead."""
    from msa_tts_tpu.vocoders.wavernn import fold_with_overlap

    x = np.random.RandomState(0).randn(1, 200, 3).astype(np.float32)
    folded = fold_with_overlap(x, target=1375, overlap=275)
    assert folded.shape[0] == 1
    np.testing.assert_array_equal(folded[0, :200], x[0])
