"""Aux subsystem tests: speaker classifier, dataset prep, landscapes,
config parsing."""

import os
import pickle

import numpy as np
import pytest


@pytest.mark.slow
def test_spk_cls_learns_separable_speakers(tmp_path):
    from msa_tts_tpu.utils.spk_cls import train_spk_cls

    rng = np.random.default_rng(0)
    emb = {}
    for i, spk in enumerate(["a", "b", "c"]):
        center = np.zeros(16)
        center[i] = 5.0
        emb[spk] = {
            f"utt{j}": (center + 0.1 * rng.standard_normal(16)).astype(
                np.float32
            )
            for j in range(20)
        }
        emb[spk]["mean"] = center.astype(np.float32)
    path = str(tmp_path / "spk_emb.pkl")
    with open(path, "wb") as f:
        pickle.dump(emb, f)

    results = train_spk_cls(
        {
            "spk_emb_path": path,
            "dataset_train": {"speakers_list": ["a", "b", "c"]},
            "spk_seed": 0,
            "n_epochs_cls": 30,
            "hidden_size": 32,
        }
    )
    assert set(results.keys()) == {1, 2, 3}
    assert results[3]["train_acc"] > 0.95
    assert results[3]["test_acc"] > 0.9


def test_prepare_vctk_layout(tmp_path):
    """Prep script resamples into wavs/ and writes the 5-field metafile."""
    from msa_tts_tpu.data_processing.prepare_vctk import VCTKProcessor
    from msa_tts_tpu.ops.audio import save_wav

    root = str(tmp_path)
    sr = 48000
    for spk in ["p001", "p002"]:
        os.makedirs(os.path.join(root, "txt", spk), exist_ok=True)
        os.makedirs(os.path.join(root, "wav48", spk), exist_ok=True)
        for i in range(2):
            t = np.arange(sr // 4) / sr
            wav = np.sin(2 * np.pi * 220 * t).astype(np.float32)
            save_wav(
                os.path.join(root, "wav48", spk, f"{spk}_{i}.wav"), wav, sr
            )
            with open(
                os.path.join(root, "txt", spk, f"{spk}_{i}.txt"), "w"
            ) as f:
                f.write("hello world\n")

    proc = VCTKProcessor(root, workers=1)
    meta_path = proc.create_metadata()
    lines = [l.strip().split("|") for l in open(meta_path)]
    assert len(lines) == 4
    for parts in lines:
        assert len(parts) == 5
        spk, wav, text, phon, dur = parts
        assert spk in ("p001", "p002")
        assert text.endswith(".")
        assert len(phon) > 0
        assert float(dur) > 0
        # resampled wav exists at 22.05k
        from scipy.io import wavfile

        sr2, data = wavfile.read(os.path.join(root, "wavs", spk, wav))
        assert sr2 == 22050


def test_landscape_interpolation_convexity():
    """Linear interpolation of a quadratic loss is a parabola with
    minimum between the endpoints' pull."""
    import jax.numpy as jnp

    from msa_tts_tpu.analysis.landscapes import (
        linear_interpolation,
        random_plane,
    )

    target = jnp.asarray([1.0, -1.0])

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2)

    p0 = {"w": jnp.asarray([0.0, 0.0])}
    p1 = {"w": jnp.asarray([2.0, -2.0])}
    vals = linear_interpolation(loss, p0, p1, steps=21)
    assert vals.argmin() == 10  # midpoint == target
    assert vals[0] == pytest.approx(2.0)

    surf = random_plane(loss, {"w": target}, distance=2.0, steps=5)
    assert surf.shape == (5, 5)
    assert surf.min() == pytest.approx(surf[2, 2], abs=1e-5)


def test_trajectory_trackers(tmp_path):
    """Full + projecting trajectory trackers (reference
    contrib/trajectories.py parity): positions round-trip, projection
    is exact least squares onto the fixed random bases."""
    import jax
    import jax.numpy as jnp

    from msa_tts_tpu.analysis.landscapes import (
        FullTrajectoryTracker,
        ProjectingTrajectoryTracker,
        trajectory_distances,
    )

    history = [
        {"w": jnp.full((3,), float(i)), "b": jnp.asarray([[i, -i]], jnp.float32)}
        for i in range(4)
    ]

    full = FullTrajectoryTracker(str(tmp_path / "traj"))
    for p in history:
        full.save_position(p)
    traj = full.get_trajectory()
    assert len(traj) == 4 and traj[2].shape == (5,)
    # pytree flatten order: "b" leaf before "w" leaf
    np.testing.assert_allclose(traj[3], [3, -3, 3, 3, 3])
    with pytest.raises(IndexError):
        full[4]

    proj = ProjectingTrajectoryTracker(
        history[0], jax.random.PRNGKey(0), n_bases=2
    )
    for p in history:
        proj.save_position(p)
    pts = proj.get_trajectory()
    assert len(pts) == 4 and pts[0].shape == (2,)
    # exact lstsq solution for the known flat vector
    b = np.asarray([2, -2, 2, 2, 2], np.float64)
    expect = np.linalg.lstsq(proj.A, b, rcond=None)[0]
    np.testing.assert_allclose(pts[2], expect)

    d = trajectory_distances(history)
    assert d[0] == 0.0 and np.all(np.diff(d) > 0)


def test_landscape_metrics():
    """Metric library (reference metrics/{sl,rl}_metrics.py parity):
    Loss/LossGradient exact on a quadratic, LossPerturbations has the
    right shape and a zero-at-alpha-zero sanity, ExpectedReturn sums
    episodic reward on a duck-typed gym-style environment."""
    import jax
    import jax.numpy as jnp

    from msa_tts_tpu.analysis.landscapes import (
        ExpectedReturn,
        Loss,
        LossGradient,
        LossPerturbations,
    )

    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[3.0]])}

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)

    assert Loss(loss)(params) == pytest.approx(14.0)

    g = LossGradient(loss)(params)
    # flat vector over leaves ("b" before "w" in pytree order), = 2·x
    np.testing.assert_allclose(g, [6.0, 2.0, 4.0])

    deltas = LossPerturbations(loss, n_directions=5, alpha=0.3,
                               rng=jax.random.PRNGKey(1))(params)
    assert deltas.shape == (5,) and np.isfinite(deltas).all()
    zero = LossPerturbations(loss, n_directions=3, alpha=0.0)(params)
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)

    # same-shaped leaves must get INDEPENDENT directions: for the
    # antisymmetric loss sum(a) - sum(b), identical per-leaf draws
    # would cancel to an exact 0.0 delta on every direction
    anti = LossPerturbations(
        lambda p: jnp.sum(p["x"]) - jnp.sum(p["y"]),
        n_directions=6, alpha=1.0,
    )({"x": jnp.zeros(4), "y": jnp.zeros(4)})
    assert np.abs(anti).min() > 1e-4

    class Env:
        def __init__(self, horizon):
            self.h, self.t = horizon, 0

        def reset(self):
            self.t = 0
            return np.zeros(2, np.float32)

        def step(self, action):
            self.t += 1
            return (np.zeros(2, np.float32), float(self.t),
                    self.t >= self.h, {})

    # return of a 3-step episode is 1+2+3; averaged over 2 episodes
    er = ExpectedReturn(Env(3), lambda p, o: o, n_episodes=2)
    assert er(params) == pytest.approx(6.0)


def test_config_optim_vocabularies():
    from msa_tts_tpu.config import parse_optim_params
    from msa_tts_tpu.optim import make_optimizer

    # flat reference-style section with stringified values
    name, kw = parse_optim_params(
        {"optimizer_type": "Adam", "lr": "1e-3", "weight_decay": "0.01"}
    )
    assert name == "Adam"
    assert kw["lr"] == 1e-3

    # helpers.py-style section: optimizer_name + nested optim_params
    tx = make_optimizer(
        {"optimizer_name": "Adam", "optim_params": {"lr": "2e-4"}}
    )
    import jax.numpy as jnp

    state = tx.init({"w": jnp.zeros(3)})
    updates, _ = tx.update({"w": jnp.ones(3)}, state, {"w": jnp.zeros(3)})
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_cli_overrides():
    from msa_tts_tpu.config import apply_cli_overrides

    params = {"a": 1, "nested": {"x": 2}}
    out = apply_cli_overrides(
        params, ["--a", "5", "--nested.x", "7", "--new", "hello"]
    )
    assert out["a"] == 5
    assert out["nested"]["x"] == 7
    assert out["new"] == "hello"
    assert params["a"] == 1  # original untouched


def _tone(sr=22050, dur=0.25):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * 330 * t).astype(np.float32)


def test_prepare_ljspeech_layout(tmp_path):
    from msa_tts_tpu.data_processing.prepare_ljspeech import (
        LJSpeechProcessor,
    )
    from msa_tts_tpu.ops.audio import save_wav

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    rows = []
    for i in range(3):
        wav_id = f"LJ001-{i:04d}"
        save_wav(
            os.path.join(root, "wavs", wav_id + ".wav"), _tone(), 22050
        )
        rows.append(f"{wav_id}|Raw text {i}|Normalized text {i}.")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(rows))

    meta = LJSpeechProcessor(root, workers=1).create_metadata()
    lines = [l.strip().split("|") for l in open(meta)]
    assert len(lines) == 3
    for spk, wav, text, phon, dur in lines:
        assert spk == "lj"
        assert wav.startswith("wavs/")
        assert phon and float(dur) > 0


def test_prepare_css10_layout(tmp_path):
    from msa_tts_tpu.data_processing.prepare_css10 import CSS10Processor
    from msa_tts_tpu.ops.audio import save_wav

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "clips"), exist_ok=True)
    rows = []
    for i in range(2):
        rel = f"clips/utt{i}.wav"
        save_wav(os.path.join(root, rel), _tone(), 22050)
        rows.append(f"{rel}|roh text {i}|normal text {i}.|1.0")
    with open(os.path.join(root, "transcript.txt"), "w") as f:
        f.write("\n".join(rows))

    meta = CSS10Processor(root, lang="en-us", workers=1).create_metadata()
    lines = [l.strip().split("|") for l in open(meta)]
    assert len(lines) == 2
    assert all(p[0] == "css10_en-us" for p in lines)


def test_prepare_comvoice_layout(tmp_path):
    from msa_tts_tpu.data_processing.prepare_comvoice import (
        CommonVoiceProcessor,
    )
    from msa_tts_tpu.ops.audio import save_wav

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "clips_wav"), exist_ok=True)
    rows = ["client_id\tpath\tsentence"]
    for spk in ("c1", "c2"):
        for i in range(3):
            name = f"{spk}_{i}.mp3"
            save_wav(
                os.path.join(root, "clips_wav", f"{spk}_{i}.wav"),
                _tone(), 22050,
            )
            rows.append(f"{spk}\t{name}\tA sentence {i}")
    with open(os.path.join(root, "validated.tsv"), "w") as f:
        f.write("\n".join(rows))

    proc = CommonVoiceProcessor(
        root, lang="en-us", workers=1, min_per_spk=3
    )
    meta = proc.create_metadata()
    lines = [l.strip().split("|") for l in open(meta)]
    assert len(lines) == 6
    assert {p[0] for p in lines} == {"c1", "c2"}
    # The metafile must be TRAINABLE: the default loader resolves
    # <root>/wavs/<speaker>/<filename> for multi-speaker metafiles, so
    # the prep must have rewritten the flat clips into that layout.
    from msa_tts_tpu.dataloaders.metafile import resolve_audio_path

    for spk, fname, *_ in lines:
        p = resolve_audio_path(root, "wavs", spk, fname, num_speakers=2)
        assert os.path.exists(p), p


@pytest.mark.slow
def test_persistent_compilation_cache(tmp_path):
    """enable_compilation_cache points JAX's disk cache at our dir and a
    compiled program round-trips: first process writes an entry, second
    process starts with the entry present (warm start).  Threshold is
    dropped to 0 here; production keeps 1 s (only expensive programs
    persist)."""
    import subprocess
    import sys

    d = str(tmp_path / "xla_cache")
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        f"import os; os.environ['MSA_COMPILATION_CACHE_DIR']={d!r}\n"
        "from msa_tts_tpu.utils.compile_cache import "
        "enable_compilation_cache\n"
        f"assert enable_compilation_cache() == {d!r}\n"
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp, numpy as np\n"
        "f = jax.jit(lambda x: jnp.sin(x) @ x.T)\n"
        "x = jnp.asarray(np.ones((64, 64), 'float32'))\n"
        "f(x).block_until_ready()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for _ in range(2):
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, env=env, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    entries = os.listdir(d)
    assert len(entries) >= 1  # the jitted program persisted


def test_g2p_reports_backend_and_degraded_warning(caplog):
    """Auto-resolution without espeak must land on the fallback backend
    LOUDLY (warning log) and expose backend_name for /health."""
    import logging

    from msa_tts_tpu.utils.g2p.grapheme2phoneme import (
        Grapheme2Phoneme,
        find_espeak,
    )

    with caplog.at_level(logging.WARNING):
        g = Grapheme2Phoneme()
    if find_espeak():
        assert g.backend_name == "espeak"
    else:
        assert g.backend_name == "fallback"
        assert any("fallback" in r.message for r in caplog.records)
    # explicit request is not "degraded" — no warning
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        g2 = Grapheme2Phoneme(backend="fallback")
    assert g2.backend_name == "fallback"
    assert not caplog.records


def test_make_optimizer_honors_torch_options():
    """Reference configs carry torch optimizer options (nesterov,
    amsgrad, rmsprop momentum/centered); dropping one silently would
    diverge training dynamics from the reference run the config was
    copied from, so they must either take effect or raise."""
    import jax.numpy as jnp

    from msa_tts_tpu.optim import make_optimizer

    g = {"w": jnp.asarray([1.0, -2.0])}
    p = {"w": jnp.zeros(2)}

    def one_step(tx):
        st = tx.init(p)
        up, _ = tx.update(g, st, p)
        return np.asarray(up["w"])

    plain = one_step(make_optimizer(
        {"optimizer_type": "SGD", "lr": 0.1, "momentum": 0.9}
    ))
    nest = one_step(make_optimizer(
        {"optimizer_type": "SGD", "lr": 0.1, "momentum": 0.9,
         "nesterov": True}
    ))
    assert not np.allclose(plain, nest)  # nesterov actually applied
    # torch semantics on the first step: plain = -lr·g, nesterov = -lr·(1+μ)·g
    np.testing.assert_allclose(plain, -0.1 * np.asarray(g["w"]), rtol=1e-6)
    np.testing.assert_allclose(
        nest, -0.1 * 1.9 * np.asarray(g["w"]), rtol=1e-6
    )

    rms = one_step(make_optimizer(
        {"optimizer_type": "RMSprop", "lr": 0.1, "momentum": 0.9,
         "centered": True}
    ))
    assert np.isfinite(rms).all()
    ams = one_step(make_optimizer(
        {"optimizer_type": "Adam", "lr": 0.1, "amsgrad": True}
    ))
    assert np.isfinite(ams).all()

    with pytest.raises(ValueError, match="bogus_opt"):
        make_optimizer(
            {"optimizer_type": "Adam", "lr": 0.1, "bogus_opt": 1}
        )
    with pytest.raises(ValueError, match="nesterov"):
        make_optimizer(
            {"optimizer_type": "SGD", "lr": 0.1, "nesterov": True}
        )
