# -*- coding: utf-8 -*-
"""Phoneme vocabulary for the TPU model.

The reference model consumes IPA phoneme strings through a char->id vocab
(reference: src/illufly_tts/core/kmodel.py:36-42 uses ``self.vocab`` from the
external kokoro package). Here the vocabulary is built from exactly the
symbols our frontend can emit (zh IPA + arrow tones, en IPA + stress marks,
punctuation), padded to 256 entries so embedding lookups stay MXU-friendly.

id 0 is PAD and doubles as BOS/EOS (the reference brackets sequences with 0,
kmodel.py:41).
"""
from __future__ import annotations

from typing import Dict, List

from ..frontend.g2p.ipa import ZH_IPA_CHARS

_EN_IPA = list("ɑæʌɔaʊɪieɛɝəɚoʃʒθðŋɹbdfɡhjklmnpstuvwzˈˌː")
# GB English additions (en_gb.py): LOT vowel + bare NURSE vowel (US
# writes r-colored ɝ); the rest of the GB inventory (iː uː əʊ ɪə ɛə ʊə a)
# decomposes into chars above
_EN_GB = ["ɒ", "ɜ"]
# digraphs enter the vocab per-character via the _build loop; listing
# them keeps any future digraph's constituents covered explicitly
_EN_EXTRA = ["dʒ", "tʃ", "eɪ", "aɪ", "ɔɪ", "oʊ", "aʊ"]
_PUNCT = list(';:,.!?—…"()“”/ \'-')
_MISC = list("❓$&@#%+=*~^|<>[]{} ")

PAD_ID = 0


def _build() -> Dict[str, int]:
    symbols: List[str] = ["$"]  # id 0: PAD/BOS/EOS
    seen = {"$"}
    for group in (_PUNCT, ZH_IPA_CHARS, _EN_IPA, _EN_GB, _EN_EXTRA, _MISC):
        for s in group:
            for ch in s:  # vocab is per-character, like the reference's
                if ch not in seen:
                    seen.add(ch)
                    symbols.append(ch)
    return {s: i for i, s in enumerate(symbols)}


VOCAB: Dict[str, int] = _build()
N_TOKEN = 256  # embedding rows (>= len(VOCAB)), MXU-aligned
assert len(VOCAB) <= N_TOKEN, len(VOCAB)


def encode(phonemes: str, max_len: int | None = None) -> List[int]:
    """Phoneme string -> [0] + ids + [0], dropping unknown chars
    (same policy as reference kmodel.py:38-41)."""
    ids = [VOCAB[c] for c in phonemes if c in VOCAB]
    if max_len is not None and len(ids) > max_len - 2:
        ids = ids[: max_len - 2]
    return [PAD_ID] + ids + [PAD_ID]
