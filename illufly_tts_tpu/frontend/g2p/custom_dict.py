# -*- coding: utf-8 -*-
"""User-supplied pronunciation dictionaries.

The reference ships hand-written zh/en dictionary files that no code loads
(reference: src/illufly_tts/core/resources/dictionaries/*.txt, SURVEY C22
"orphaned"). Here the capability is real: load zh word->pinyin overrides
into the phrase table and en word->IPA entries into the lexicon.

File formats (lines; '#' comments):
  zh:  <word> <pinyin1> <pinyin2> ...     e.g.  重庆 chong2 qing4
  en:  <word> <ipa>                       e.g.  kokoro koʊkoʊɹoʊ
"""
from __future__ import annotations

import logging
import re
from typing import Dict, List

logger = logging.getLogger(__name__)

_ZH_ENTRY = re.compile(r"^([一-鿿]+)\s+((?:[a-zv]+[1-5]\s*)+)$")
_EN_ENTRY = re.compile(r"^([A-Za-z][A-Za-z'\-]*)\s+(\S+)$")


def load_zh_dict(path: str) -> Dict[str, List[str]]:
    """Load zh overrides and register them in the live phrase table."""
    from .pinyin.phrases import PHRASES

    added: Dict[str, List[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            match = _ZH_ENTRY.match(line)
            if not match:
                logger.warning("ignoring malformed zh dict line: %r", line)
                continue
            word = match.group(1)
            readings = match.group(2).split()
            if len(readings) != len(word):
                logger.warning(
                    "zh dict entry %r: %d readings for %d chars, skipping",
                    word, len(readings), len(word),
                )
                continue
            PHRASES[word] = readings
            added[word] = readings
    logger.info("loaded %d zh dictionary entries from %s", len(added), path)
    return added


def load_en_dict(path: str) -> Dict[str, str]:
    """Load en word->IPA entries into the live English lexicon."""
    from .en_lexicon import LEXICON

    added: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            match = _EN_ENTRY.match(line)
            if not match:
                logger.warning("ignoring malformed en dict line: %r", line)
                continue
            word = match.group(1).lower()
            LEXICON[word] = match.group(2)
            added[word] = match.group(2)
    logger.info("loaded %d en dictionary entries from %s", len(added), path)
    return added
