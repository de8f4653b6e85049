"""Differential parity of the public ``phonemize()`` API (Separator /
strip / njobs / punctuation / stress / language-switch) against the
reference's vendored ``phonemizer_api.phonemize`` — the last reference
surface without a counterpart (round-2 verdict, Missing #3).

The espeak binary is stubbed with the canned engine from test_g2p so
BOTH pipelines see identical raw espeak output; any divergence is a
pipeline-semantics bug, not an engine difference.
"""

import os
import sys
import types

import pytest

from test_g2p import _install_fake_espeak

from msa_tts_tpu.utils.g2p.phonemize import (
    Separator,
    default_separator,
    phonemize,
)

REF_AVAILABLE = os.path.isdir("/root/reference/msa_tts")


def _load_reference_phonemize(monkeypatch):
    for m in ("pkg_resources", "segments", "joblib"):
        sys.modules.setdefault(m, types.ModuleType(m))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from msa_tts.utils.g2p.phonemizer_api.backend.espeak import (
        BaseEspeakBackend,
        EspeakBackend,
    )
    from msa_tts.utils.g2p.phonemizer_api.phonemize import (
        phonemize as ref_phonemize,
    )
    from msa_tts.utils.g2p.phonemizer_api.separator import (
        Separator as RefSeparator,
    )

    monkeypatch.setattr(
        BaseEspeakBackend, "espeak_path",
        staticmethod(lambda: "/fake/espeak"),
    )
    monkeypatch.setattr(
        BaseEspeakBackend, "long_version",
        classmethod(lambda cls: "eSpeak NG text-to-speech: 1.50"),
    )
    monkeypatch.setattr(
        EspeakBackend, "supported_languages",
        classmethod(lambda cls: {"en-us": "English (America)"}),
    )
    return ref_phonemize, RefSeparator


# --------------------------------------------------------------- Separator
def test_separator_defaults_and_validation():
    s = default_separator
    assert (s.word, s.syllable, s.phone) == (" ", "", "")
    s2 = Separator(word="|", syllable=".", phone="-")
    assert (s2.word, s2.syllable, s2.phone) == ("|", ".", "-")
    assert Separator(word="|", phone="-") == Separator(word="|", phone="-")
    with pytest.raises(ValueError):
        Separator(word="|", syllable="|")       # duplicate non-empty
    # empty/None separators may repeat freely
    Separator(word=None, syllable=None, phone=None)


def test_backend_option_validation():
    with pytest.raises(RuntimeError):
        phonemize("hi", backend="espeak-mbrola")
    with pytest.raises(RuntimeError):
        phonemize("hi", backend="fallback", with_stress=True)
    with pytest.raises(RuntimeError):
        phonemize("hi", backend="fallback", language_switch="remove-flags")


# ----------------------------------------------------- espeak differential
TEXTS = [
    "hello world",
    "Hello, world!",
    "the quick brown fox jumps over the lazy dog.",
    "hello bonjour world",          # spaced language-switch flags
    "carpe diem!",                  # attached language-switch flags
    "secondary stress, secondary!",
    "dog jumps dog jumps",          # bug-694 separator artifacts
    "the extra wrap line",          # output line-wrap merge
]

SEPARATORS = [
    ("default", dict()),
    ("phone-dash", dict(word="|", phone="-")),
    ("spacy", dict(word="; ", phone=" ")),
]


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference not mounted")
@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("sep_name,sep_kw", SEPARATORS)
@pytest.mark.parametrize("strip", [False, True])
def test_espeak_separator_parity(monkeypatch, text, sep_name, sep_kw,
                                 strip):
    _install_fake_espeak(monkeypatch)
    ref_phonemize, RefSeparator = _load_reference_phonemize(monkeypatch)

    kw = dict(
        language="en-us", backend="espeak", strip=strip,
        preserve_punctuation=True, with_stress=True,
        language_switch="remove-flags", njobs=1,
    )
    ref = ref_phonemize(text, separator=RefSeparator(**sep_kw), **kw)
    ours = phonemize(text, separator=Separator(**sep_kw),
                     espeak_binary="/fake/espeak", **kw)
    assert ours == ref, f"{sep_name} strip={strip}: {ours!r} != {ref!r}"


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference not mounted")
@pytest.mark.parametrize("with_stress", [False, True])
@pytest.mark.parametrize(
    "language_switch", ["keep-flags", "remove-flags", "remove-utterance"]
)
def test_espeak_stress_and_lang_switch_parity(monkeypatch, with_stress,
                                              language_switch):
    _install_fake_espeak(monkeypatch)
    ref_phonemize, RefSeparator = _load_reference_phonemize(monkeypatch)

    text = ["hello bonjour world", "secondary hello", "carpe diem"]
    kw = dict(
        language="en-us", backend="espeak", strip=False,
        preserve_punctuation=False, with_stress=with_stress,
        language_switch=language_switch, njobs=1,
    )
    ref = ref_phonemize(text, separator=RefSeparator(), **kw)
    ours = phonemize(text, separator=Separator(),
                     espeak_binary="/fake/espeak", **kw)
    assert ours == ref


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference not mounted")
def test_espeak_list_and_njobs_parity(monkeypatch):
    """njobs chunking must preserve per-line order and equal both the
    njobs=1 run and the reference output (reference njobs>1 needs
    joblib, absent here — its njobs=1 path is the semantics oracle)."""
    _install_fake_espeak(monkeypatch)
    ref_phonemize, RefSeparator = _load_reference_phonemize(monkeypatch)

    lines = [
        "hello world",
        "the quick brown fox",
        "carpe diem",
        "twenty two",
        "secondary stress",
    ]
    kw = dict(
        language="en-us", backend="espeak", strip=False,
        preserve_punctuation=True, with_stress=True,
        language_switch="remove-flags",
    )
    ref = ref_phonemize(lines, separator=RefSeparator(), njobs=1, **kw)
    ours1 = phonemize(lines, separator=Separator(), njobs=1,
                      espeak_binary="/fake/espeak", **kw)
    ours3 = phonemize(lines, separator=Separator(), njobs=3,
                      espeak_binary="/fake/espeak", **kw)
    assert isinstance(ours1, list) and len(ours1) == len(lines)
    assert ours1 == ref
    assert ours3 == ours1


# --------------------------------------------------- festival differential
# canned SylStructure trees (the format our parser and the reference's
# lispy-based one both consume — word -> syllables -> phones)
FESTIVAL_TREES = [
    # "hello world"
    '((("hello" ((id "_1"))) '
    '(((id "_s1") (stress 0)) (("hh" ((id "_2")))) (("ax" ((id "_3"))))) '
    '(((id "_s2") (stress 1)) (("l" ((id "_4")))) (("ow" ((id "_5")))))) '
    '(("world" ((id "_6"))) '
    '(((id "_s3") (stress 1)) (("w" ((id "_7")))) (("er" ((id "_8")))) '
    '(("l" ((id "_9")))) (("d" ((id "_10")))))))',
    # single word, single syllable
    '((("a" ((id "_1"))) (((id "_s1") (stress 0)) (("ax" ((id "_2")))))))',
]


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference not mounted")
@pytest.mark.parametrize("tree", FESTIVAL_TREES)
@pytest.mark.parametrize("sep_kw", [
    dict(), dict(word="|", syllable=".", phone="-"),
    dict(word=" ", syllable="@"),
])
@pytest.mark.parametrize("strip", [False, True])
def test_festival_separator_parity(monkeypatch, tree, sep_kw, strip):
    from msa_tts_tpu.utils.g2p.phonemize import _festival_line

    for m in ("pkg_resources", "segments", "joblib"):
        sys.modules.setdefault(m, types.ModuleType(m))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from msa_tts.utils.g2p.phonemizer_api.backend.festival import (
        FestivalBackend as RefFestival,
    )
    from msa_tts.utils.g2p.phonemizer_api.separator import (
        Separator as RefSeparator,
    )

    ref = RefFestival._postprocess_line(tree, RefSeparator(**sep_kw), strip)
    ours = _festival_line(tree, Separator(**sep_kw), strip)
    assert ours == ref


# ------------------------------------------------------- fallback/segments
def test_fallback_separators_structure():
    out = phonemize(
        "hello fox", backend="fallback",
        separator=Separator(word="|", phone="-"), strip=True,
    )
    words = out.split("|")
    assert len(words) == 2
    assert all("-" in w for w in words)
    # strip=False appends trailing separators per word and line
    out2 = phonemize(
        "hello fox", backend="fallback",
        separator=Separator(word="|", phone="-"), strip=False,
    )
    assert out2.endswith("-|")


def test_segments_profile_separators(tmp_path):
    prof = tmp_path / "toy.g2p"
    prof.write_text("grapheme\tphoneme\nab\tAB\nc\tSEE\n")
    out = phonemize(
        "abc cab", backend="segments", segments_profile=str(prof),
        separator=Separator(word=" ", phone="."), strip=True,
    )
    assert out == "AB.SEE SEE.AB"
