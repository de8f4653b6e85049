"""G2P tests: vocabulary, conversion modes, backends."""

import numpy as np
import pytest

from msa_tts_tpu.utils.g2p import (
    CHAR_TO_ID,
    Grapheme2Phoneme,
    N_SYMBOLS,
    char_list,
)


def test_char_list_matches_reference():
    """The vocabulary must be byte-identical to the reference's (index
    meaning is baked into metafiles and checkpoints)."""
    import os
    import sys

    if not os.path.isdir("/root/reference/msa_tts"):
        pytest.skip("reference not mounted")
    sys.path.insert(0, "/root/reference")
    from msa_tts.utils.g2p.char_list import char_list as ref_list

    assert char_list == ref_list


def test_vocab_structure():
    assert char_list[0] == "_"  # pad at 0
    assert " " in char_list
    assert all(p in char_list for p in ".!;:,?")
    assert len(set(char_list)) == N_SYMBOLS


def test_phone_to_idx_roundtrip():
    g2p = Grapheme2Phoneme(backend="fallback")
    phones = "ˈhɛloʊ wˈɜːld."
    seq, out = g2p.convert(phones, convert_mode="phone_to_idx")
    assert out == phones
    assert all(0 < i < N_SYMBOLS for i in seq)
    # invalid/pad chars are filtered, valid ones all kept
    kept = [c for c in phones if c in CHAR_TO_ID and c != "_"]
    assert len(seq) == len(kept)


def test_text_to_phone_fallback_deterministic():
    g2p = Grapheme2Phoneme(backend="fallback")
    s1, p1 = g2p.convert(
        "hello world.", convert_mode="text_to_phone_to_idx",
        language="en-us",
    )
    s2, p2 = g2p.convert(
        "hello world.", convert_mode="text_to_phone_to_idx",
        language="en-us",
    )
    assert s1 == s2 and p1 == p2
    assert len(s1) > 0
    # punctuation preserved
    assert p1.strip().endswith(".")


def test_aligned_mode():
    g2p = Grapheme2Phoneme(backend="fallback")
    seq, word_to_idx = g2p.convert(
        "hi there", convert_mode="text_to_phone_to_idx_aligned",
        language="en-us",
    )
    assert [w for w, _ in word_to_idx] == ["hi", "there"]
    starts = [span[0] for _, span in word_to_idx]
    assert starts == sorted(starts)


def test_segments_backend(tmp_path):
    profile = tmp_path / "toy.g2p"
    profile.write_text("a\tʌ\nch\ttʃ\nb\tb\n", encoding="utf-8")
    g2p = Grapheme2Phoneme(
        backend="segments", segments_profile=str(profile)
    )
    phones = g2p.text_to_phone("abcha")
    # longest match: a b ch a → ʌ b tʃ ʌ
    assert phones.strip() == "ʌbtʃʌ"
    seq, _ = g2p.convert("abcha", convert_mode="text_to_phone_to_idx")
    # 6 vocabulary ids: ʌ b t ʃ ʌ + the trailing word separator ("tʃ"
    # is two IPA symbols; the reference's strip=False pipeline keeps the
    # final space and it IS a vocabulary symbol)
    assert len(seq) == 6
    assert seq[-1] == CHAR_TO_ID[" "]


# ---------------------------------------------------------------------------
# Punctuation preserve/restore — differential vs the reference module
# ---------------------------------------------------------------------------

def _load_reference_punctuation():
    """Load the reference's pure-Python punctuation module standalone
    (its package __init__ chain needs pkg_resources/espeak; the module
    itself does not)."""
    import importlib.util
    import sys
    import types

    sys.modules.setdefault("pkg_resources", types.ModuleType("pkg_resources"))
    base = "/root/reference/msa_tts/utils/g2p/phonemizer_api"
    pkg = types.ModuleType("refphon")
    pkg.__path__ = [base]
    sys.modules["refphon"] = pkg

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("refphon.utils", f"{base}/utils.py")
    return load("refphon.punctuation", f"{base}/punctuation.py")


PUNCT_EDGE_CASES = [
    "hello, my world!",
    "hi there",
    "...",
    "!hi",
    "a,,b",
    "one. two. three.",
    ",start and end!",
    "mid;;;dle",
    "!?",
    "  , spaced ,  marks , ",
    "word",
    "a.b.a.b.",
    "?leading! trailing?",
    "no marks at all here",
    "trailing mark then space. ",
    "double  space,  after",
]


@pytest.mark.parametrize("text", PUNCT_EDGE_CASES)
def test_punctuation_matches_reference(text):
    import pytest as _pytest

    try:
        ref_mod = _load_reference_punctuation()
    except Exception as e:  # pragma: no cover
        _pytest.skip(f"reference punctuation not loadable: {e}")
    from msa_tts_tpu.utils.g2p.char_list import PUNCTUATIONS
    from msa_tts_tpu.utils.g2p.punctuation import Punctuation

    ours = Punctuation(PUNCTUATIONS)
    ref = ref_mod.Punctuation(PUNCTUATIONS)

    chunks_o, marks_o = ours.preserve([text])
    chunks_r, marks_r = ref.preserve([text])
    assert chunks_o == chunks_r
    assert [(m.index, m.mark, m.position) for m in marks_o] == [
        (m.index, m.mark, m.position) for m in marks_r
    ]

    # restore with synthetic "phonemized" chunks (trailing word sep)
    fake = [f"PH{i} " for i in range(len(chunks_o))]
    assert ours.restore(list(fake), marks_o) == ref.restore(
        list(fake), marks_r
    )

    # remove() parity too
    assert ours.remove(text) == ref.remove(text)
    assert ours.remove([text]) == ref.remove([text])


def test_punctuation_multiline_matches_reference():
    try:
        ref_mod = _load_reference_punctuation()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference punctuation not loadable: {e}")
    from msa_tts_tpu.utils.g2p.char_list import PUNCTUATIONS
    from msa_tts_tpu.utils.g2p.punctuation import Punctuation

    lines = ["first line, with marks!", "...", "plain", "end."]
    ours = Punctuation(PUNCTUATIONS)
    ref = ref_mod.Punctuation(PUNCTUATIONS)
    chunks_o, marks_o = ours.preserve(list(lines))
    chunks_r, marks_r = ref.preserve(list(lines))
    assert chunks_o == chunks_r
    fake = [f"PH{i} " for i in range(len(chunks_o))]
    assert ours.restore(list(fake), marks_o) == ref.restore(
        list(fake), marks_r
    )


def test_text_to_phone_spacing_matches_reference_protocol():
    """The full hide→phonemize→restore pipeline must place punctuation
    space-separated, as the reference's phonemize() emits it."""
    g2p = Grapheme2Phoneme(backend="fallback")
    phones = g2p.text_to_phone("hello, world!")
    # chunk phonemizations carry a trailing word separator; the comma
    # match included its following space
    assert ", " in phones
    assert phones.endswith("!")


# ---------------------------------------------------------------------------
# Festival backend: s-expression parser + tree postprocessing
# ---------------------------------------------------------------------------

# A SylStructure relation tree in the shape festival prints for
# "hello world": each word node is (header syllable...), each syllable
# (header phone...), each phone (("name" features)).
FESTIVAL_TREE = (
    '('
    '(("hello" ((id "_1"))) '
    '(((id "_s1") (stress 0)) (("hh" ((id "_2")))) (("ax" ((id "_3"))))) '
    '(((id "_s2") (stress 1)) (("l" ((id "_4")))) (("ow" ((id "_5")))))) '
    '(("world" ((id "_6"))) '
    '(((id "_s3") (stress 1)) (("w" ((id "_7")))) (("er" ((id "_8")))) '
    '(("l" ((id "_9")))) (("d" ((id "_10"))))))'
    ')'
)


def test_festival_parse_sexpr():
    from msa_tts_tpu.utils.g2p.festival import parse_sexpr

    assert parse_sexpr("(+ 2 (* 5 2))") == ["+", "2", ["*", "5", "2"]]
    assert parse_sexpr("(a (b c) d)") == ["a", ["b", "c"], "d"]
    with pytest.raises(IndexError):
        parse_sexpr("(a (b c)")  # unbalanced


def test_festival_tree_to_phones():
    from msa_tts_tpu.utils.g2p.festival import FestivalBackend

    out = FestivalBackend.tree_to_phones(FESTIVAL_TREE)
    assert out == "hhaxlow werld "


def test_festival_clean_line():
    from msa_tts_tpu.utils.g2p.festival import FestivalBackend

    assert FestivalBackend._clean_line('say "this" (now)') == "say this now"
    assert FestivalBackend._clean_line("'''") == ""


def test_festival_backend_live():
    """Full subprocess path — only when a festival binary exists."""
    from msa_tts_tpu.utils.g2p.festival import FestivalBackend

    if not FestivalBackend.is_available():
        pytest.skip("festival binary not installed")
    g2p = Grapheme2Phoneme(backend="festival")
    seq, phones = g2p.convert(
        "hello world.", convert_mode="text_to_phone_to_idx",
        language="en-us",
    )
    assert phones.strip().endswith(".")


# ---------------------------------------------------------------------------
# Full espeak-pipeline differential parity vs the reference's vendored
# phonemizer, with the binary stubbed out (no espeak in this image).
# The reference drives ~400 lines of pipeline around the subprocess
# (chunking, separators, strip semantics, language-switch policy —
# phonemizer_api/backend/espeak.py:127-312, backend/base.py:91-133);
# ours shells the binary directly.  Both run here against the SAME fake
# espeak so any pipeline-semantics divergence shows up as a phone-string
# or index-sequence mismatch on real-ish text.
# ---------------------------------------------------------------------------

# canned lexicon: word -> list of IPA phones (as espeak-ng would emit,
# one list entry per --sep=_ separated phone)
_FAKE_LEX = {
    "hello": ["h", "ə", "l", "ˈoʊ"],
    "world": ["w", "ˈɜː", "l", "d"],
    "the": ["ð", "ə"],
    "quick": ["k", "w", "ˈɪ", "k"],
    "brown": ["b", "ɹ", "ˈaʊ", "n"],
    "fox": ["f", "ˈɒ", "k", "s"],
    "jumps": ["dʒ", "ˈʌ", "m", "p", "s"],
    "over": ["ˈoʊ", "v", "ɚ"],
    "lazy": ["l", "ˈeɪ", "z", "i"],
    "dog": ["d", "ˈɒ", "ɡ"],
    "cheese": ["t͡ʃ", "ˈiː", "z"],          # tie bar
    "church": ["tʃ", "ˈɜː", "tʃ"],
    "rendezvous": ["ɹ", "ˈɒ", "n", "d", "eɪ", "v", "uː"],
    "bonjour": ["b", "ɔ̃", "ʒ", "ˈu", "ʁ"],   # (fr) spaced flags
    "carpe": ["k", "ˈa", "ɾ", "p", "e"],       # (la) attached flag
    "diem": ["d", "ˈi", "e", "m"],
    "twenty": ["t", "w", "ˈɛ", "n", "t", "i"],
    "two": ["t", "ˈuː"],
    "secondary": ["s", "ˈɛ", "k", "ə", "n", "d", "ˌɛ", "ɹ", "i"],
    "a": ["ɐ"],
    "i": ["ˈaɪ"],
    "extra": ["ˈɛ", "k", "s", "t", "ɹ", "ə"],
    "wrap": ["ɹ", "ˈæ", "p"],
    "line": ["l", "ˈaɪ", "n"],
}
_FLAG_SPACED = {"bonjour": "fr"}     # emitted as "(fr) word (en)"
_FLAG_ATTACHED = {"carpe": "la", "diem": "la"}  # emitted as "(la)word"
_BUG694 = {"jumps", "dog"}           # extra trailing separator on sep path
_WRAP_BEFORE = {"wrap"}              # espeak line-wraps before this word

G2P_PIPELINE_CORPUS = [
    "hello world",
    "Hello, world!",
    "the quick brown fox jumps over the lazy dog.",
    "the quick brown fox; jumps over... the lazy dog!",
    "cheese!",
    "church cheese church",
    "hello bonjour world",          # spaced language-switch flags
    "carpe diem!",                  # attached language-switch flags
    "twenty-two",                   # hyphenated word
    "secondary stress, secondary!",
    "a i a",
    "hello... world??? hello!!!",   # multi-chunk punctuation runs
    "...",                          # punctuation only
    "!?",
    ",hello",
    "hello,",
    "the extra wrap line",          # fake espeak wraps mid-output
    "extra wrap, extra wrap.",
    "Hello World The Quick",        # case folding
    "dog jumps dog jumps",          # bug-694 separator artifacts
    "hello;world",
    "  hello   world  ",            # ragged whitespace
]


def _fake_word_tokens(word, sep):
    """Raw espeak output tokens for one input word (flags and quirks
    included), with phones joined by `sep`."""
    w = word.lower().strip("-")
    # espeak treats hyphenated compounds as separate words
    parts = w.split("-") if "-" in w else [w]
    toks = []
    for p in parts:
        if p not in _FAKE_LEX:
            continue
        body = sep.join(_FAKE_LEX[p])
        if p in _FLAG_SPACED:
            toks += [f"({_FLAG_SPACED[p]})", body, "(en)"]
        elif p in _FLAG_ATTACHED:
            toks.append(f"({_FLAG_ATTACHED[p]})" + body)
        else:
            if sep and p in _BUG694:   # espeak-ng issue #694
                body += sep
            toks.append(body)
    return toks


def _fake_espeak_line(line, sep):
    out_words = []
    for word in line.split():
        out_words.extend(_fake_word_tokens(word, sep))
    raw = " ".join(out_words)
    if any(w.lower().lstrip("-").startswith(tuple(_WRAP_BEFORE))
           for w in line.split()):
        # simulate espeak wrapping long output: newline + leading space
        idx = raw.find(" ɹ" + sep)
        if idx > 0:
            raw = raw[:idx] + "\n " + raw[idx + 1:]
    return raw + "\n"


def _install_fake_espeak(monkeypatch):
    """Point BOTH pipelines' subprocess layer at the canned engine."""
    import subprocess as sp

    real_run = sp.run

    def fake_run(cmd, **kw):
        if not (isinstance(cmd, list) and cmd
                and "espeak" in str(cmd[0])):
            return real_run(cmd, **kw)
        if "-f" in cmd:  # reference path: text in a temp file, --sep=_
            fname = cmd[cmd.index("-f") + 1]
            with open(fname, encoding="utf8") as f:
                line = f.read()
            sep = "_" if any(c.startswith("--sep=") for c in cmd) else ""
            out = _fake_espeak_line(line, sep)
            return sp.CompletedProcess(cmd, 0, out.encode(), b"")
        # our path: text after "--"; --sep=_ requests phone boundaries
        # (used by the phonemize() separator API, not the G2P path)
        line = cmd[cmd.index("--") + 1]
        sep = "_" if any(
            isinstance(c, str) and c.startswith("--sep=") for c in cmd
        ) else ""
        out = _fake_espeak_line(line, sep)
        if kw.get("text"):
            return sp.CompletedProcess(cmd, 0, out, "")
        return sp.CompletedProcess(cmd, 0, out.encode(), b"")

    monkeypatch.setattr(sp, "run", fake_run)


def _load_reference_g2p(monkeypatch):
    import sys
    import types

    for m in ("pkg_resources", "segments"):
        sys.modules.setdefault(m, types.ModuleType(m))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from msa_tts.utils.g2p.grapheme2phoneme import (
        Grapheme2Phoneme as RefG2P,
    )
    from msa_tts.utils.g2p.phonemizer_api.backend.espeak import (
        BaseEspeakBackend,
        EspeakBackend,
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
    return RefG2P()


@pytest.mark.parametrize("text", G2P_PIPELINE_CORPUS)
def test_espeak_pipeline_differential_parity(monkeypatch, text):
    import os

    if not os.path.isdir("/root/reference/msa_tts"):
        pytest.skip("reference not mounted")
    _install_fake_espeak(monkeypatch)
    ref = _load_reference_g2p(monkeypatch)
    ours = Grapheme2Phoneme(backend="espeak_stub_test")  # below

    ref_seq, ref_phones = ref.convert(
        text, convert_mode="text_to_phone_to_idx", language="en-us"
    )
    our_seq, our_phones = ours.convert(
        text, convert_mode="text_to_phone_to_idx", language="en-us"
    )

    # index sequences — what the model consumes — must be identical
    assert our_seq == ref_seq, (
        f"text={text!r}\nref={ref_phones!r}\nours={our_phones!r}"
    )
    # phone strings identical up to the documented tie-bar/ZWJ strip
    # (neither char is in the vocabulary; the reference keeps them in
    # the string, we drop them eagerly)
    norm = ref_phones.replace("͡", "").replace("‍", "")
    assert our_phones == norm, f"text={text!r}"


# allow constructing our G2P with a stubbed espeak binary path
@pytest.fixture(autouse=True)
def _allow_stub_backend(monkeypatch):
    from msa_tts_tpu.utils.g2p import grapheme2phoneme as G

    orig_init = G.Grapheme2Phoneme.__init__

    def patched(self, backend="auto", segments_profile=None):
        if backend == "espeak_stub_test":
            orig_init(self, backend="fallback")
            self.backend = G.EspeakBackend(binary="/fake/espeak")
            self.backend_name = "espeak"
            return
        orig_init(self, backend=backend, segments_profile=segments_profile)

    monkeypatch.setattr(G.Grapheme2Phoneme, "__init__", patched)


# ---------------------------------------------------------------------------
# Bundled segments profiles + CLI (round 4 — reference
# share/segments/*.g2p out-of-the-box parity, phonemizer_api/main.py)
# ---------------------------------------------------------------------------

def test_bundled_profiles_resolve_by_name():
    from msa_tts_tpu.utils.g2p.grapheme2phoneme import SegmentsBackend

    langs = SegmentsBackend.supported_languages()
    # the full reference segments-language surface (round 5) plus the
    # two extra languages this framework added in round 4
    assert {"japanese", "spanish", "finnish", "cree", "chintang",
            "inuktitut", "sesotho", "yucatec"} <= set(langs)
    be = SegmentsBackend("japanese")
    assert be.phonemize_chunk("konnichiwa") == "konnitɕiɰa"
    with pytest.raises(ValueError, match="neither a file nor"):
        SegmentsBackend("klingon")


@pytest.mark.parametrize(
    "lang,text,expected",
    [
        ("japanese", "sushi tokyo", "sɯɕi tokjo"),
        ("spanish", "chile qui jalapeño", "tʃile ki xalapeɲo"),
        ("finnish", "hyvää päivää", "hyʋæː pæiʋæː"),
        # SRO: circumflex long vowels, <c>=/ts/, <ê> inherently long
        ("cree", "nêhiyawêwin tânisi", "neːhijaweːwin taːnisi"),
        # ICI Latin: <q> uvular stop, <r>=/ʁ/, <ng>=/ŋ/, <&>=/ɬ/
        ("inuktitut", "inuktitut qanuq", "inuktitut qanuq"),
        # <q> is the click /ǃ/, <hl>=/ɬ/, aspirates as C+h
        ("sesotho", "sesotho le qoqa hle", "sɛsɔthɔ lɛ ǃɔǃa ɬɛ"),
        # glottalized series as C+ʔ, <x>=/ʃ/, <b>=/ɓ/
        ("yucatec", "k'aax ts'ono'ot baalam", "kʔaːʃ tsʔonoʔot ɓaːlam"),
        # <c>=/ts/, aspirates as C+h, <ng>=/ŋ/
        ("chintang", "chintang khana", "tshintaŋ khana"),
    ],
)
def test_bundled_profiles_phonemize(lang, text, expected):
    g2p = Grapheme2Phoneme(backend="segments", segments_profile=lang)
    assert g2p.text_to_phone(text).strip() == expected
    # every emitted symbol is in the framework vocabulary, so the
    # training path (phone_to_idx) loses nothing
    seq, phones = g2p.convert(text, convert_mode="text_to_phone_to_idx")
    assert len(seq) == sum(1 for c in phones if c in CHAR_TO_ID)


def test_bundled_profiles_cover_vocabulary():
    """Every phoneme emitted by every bundled profile maps into the
    IPA vocabulary (char_list) — a profile symbol outside the
    vocabulary would be silently dropped at index time."""
    from msa_tts_tpu.utils.g2p.grapheme2phoneme import SegmentsBackend

    for name in SegmentsBackend.supported_languages():
        be = SegmentsBackend(name)
        for grapheme, phoneme in be.mapping.items():
            for ch in phoneme:
                assert ch in CHAR_TO_ID, (name, grapheme, phoneme, ch)


def test_phonemizer_cli(tmp_path, capsys):
    from msa_tts_tpu.utils.g2p.__main__ import main

    # literal utterance through the fallback backend
    assert main(["hello", "-b", "fallback"]) == 0
    assert capsys.readouterr().out.strip() != ""

    # file -> file through a bundled segments profile, custom separators
    inp = tmp_path / "in.txt"
    inp.write_text("konnichiwa\nsayonara\n", encoding="utf-8")
    outp = tmp_path / "out.txt"
    assert main([str(inp), "-o", str(outp), "-b", "segments",
                 "-l", "japanese", "-p", "-", "--strip"]) == 0
    lines = outp.read_text(encoding="utf-8").splitlines()
    assert lines == ["k-o-n-n-i-tɕ-i-ɰ-a", "s-a-j-o-n-a-ɾ-a"]

    # --list-languages
    assert main(["--list-languages"]) == 0
    listed = capsys.readouterr().out
    assert "japanese" in listed and "spanish" in listed
