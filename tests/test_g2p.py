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
