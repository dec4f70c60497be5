# -*- coding: utf-8 -*-
"""Every character the frontend can emit must exist in the model vocab
(encode() silently drops unknown chars — reference kmodel.py:38-39 — so a
vocab gap would silently skip phonemes)."""
from illufly_tts_tpu.frontend.g2p.en_g2p import _RULES, LETTER_NAMES
from illufly_tts_tpu.frontend.g2p.en_lexicon import LEXICON
from illufly_tts_tpu.frontend.g2p.ipa import (
    FINAL_IPA,
    INITIAL_IPA,
    TONE_IPA,
)
from illufly_tts_tpu.model.vocab import VOCAB


def _assert_covered(chars, context):
    missing = sorted({c for c in chars if c not in VOCAB})
    assert not missing, f"{context}: {missing}"


def test_zh_ipa_tables_covered():
    chars = "".join(INITIAL_IPA.values()) + "".join(FINAL_IPA.values())
    chars += "".join(TONE_IPA.values()) + "ɚ"
    _assert_covered(chars, "zh IPA tables")


def test_en_lexicon_covered():
    _assert_covered("".join(LEXICON.values()), "en lexicon")


def test_en_lts_rules_covered():
    chars = "".join(ipa for _, ipa, _ in _RULES)
    chars += "".join(LETTER_NAMES.values())
    _assert_covered(chars, "en LTS rules")


def test_punctuation_covered():
    _assert_covered(';:,.!?—…"()“” \'-/', "punctuation")


def test_end_to_end_no_drops():
    from illufly_tts_tpu.frontend.g2p.chinese_g2p import ChineseG2P
    from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P

    en = EnglishG2P()
    g = ChineseG2P(en_callable=en.text_to_ipa)
    texts = [
        "你好，世界！这是test one two的句子？",
        "小孩儿在玩儿，妈妈在银行。",
        "The quick brown fox jumps over the lazy dog.",
    ]
    for text in texts:
        ipa = g.convert_to_ipa(g.text_to_phonemes(text))
        dropped = [c for c in ipa if c not in VOCAB]
        assert not dropped, (text, ipa, dropped)
