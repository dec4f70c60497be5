#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Train the letter-to-sound model from the shipped lexicon.

Reads  frontend/g2p/data/en_core.tsv + en_derived.tsv
Writes frontend/g2p/data/lts_model.json  (joint trigram over aligned
grapheme>phoneme pair tokens; see lts_model.py)

Run after any lexicon change (follows scripts/build_en_lexicon.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from illufly_tts_tpu.frontend.g2p.lts_model import train  # noqa: E402

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "illufly_tts_tpu", "frontend", "g2p", "data",
)


def load(path, table):
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, _, ipa = line.partition("\t")
            if ipa and word.isalpha() and len(word) > 2:
                table[word.lower()] = ipa


def main():
    # Train on the hand-authored core only: en_derived.tsv is generated
    # regular morphology (inflections are now stripped before LTS decode,
    # en_g2p._oov), and its synthetic non-words would teach wrong patterns
    # (e.g. "ablely" -> -lli).
    entries = {}
    load(os.path.join(DATA, "en_core.tsv"), entries)
    t0 = time.time()
    model = train(entries)
    out = os.path.join(DATA, "lts_model.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(model, f, ensure_ascii=False, separators=(",", ":"))
    size = os.path.getsize(out) / 1024
    print(
        f"trained on {len(entries)} entries in {time.time() - t0:.1f}s "
        f"-> {out} ({size:.0f} KiB)"
    )


if __name__ == "__main__":
    main()
