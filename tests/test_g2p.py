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
    assert phones == "ʌbtʃʌ"
    seq, _ = g2p.convert("abcha", convert_mode="text_to_phone_to_idx")
    # 5 vocabulary ids: ʌ b t ʃ ʌ ("tʃ" is two IPA symbols)
    assert len(seq) == 5
