#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Expand the hand-authored en lexicon with regular morphological forms.

Reads  frontend/g2p/data/en_core.tsv   (hand-authored, source of truth)
Writes frontend/g2p/data/en_derived.tsv (generated; do not edit)

Derivations (regular spelling + phonology only; hand entries always win):
  plural / 3rd person -s/-es/-ies     voicing-matched s/z/əz
  past -ed/-d/-ied (+CVC doubling)    voicing-matched t/d/əd
  progressive -ing (+e-drop/doubling) + ɪŋ
  adverbial -ly                        + li
  nominal -ness                        + nəs
Nonword outputs (e.g. "gos") are harmless — never looked up; real-word
collisions are avoided by the hand lexicon taking precedence at load time
(en_lexicon.py loads derived first, core second).
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from illufly_tts_tpu.frontend.g2p.en_g2p import (  # noqa: E402
    _append_past,
    _append_plural,
)
from illufly_tts_tpu.frontend.g2p.pos import COMMON_ADJECTIVES  # noqa: E402

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "illufly_tts_tpu", "frontend", "g2p", "data",
)

# never derive from these (function words, irregular forms, closed class)
SKIP = set("""
a an the and or but if of at by for with to from in on is are was were be
been am do does did done have has had i me my we our you your he him his
she her it its they them their this that these those not no nor so as
""".split())

VOWELS = "aeiou"


def double_final(word: str) -> bool:
    """CVC doubling for monosyllabic-ish stems (stop -> stopped)."""
    if len(word) < 3:
        return False
    c1, v, c2 = word[-3], word[-2], word[-1]
    if v not in VOWELS or c1 in VOWELS or c2 in VOWELS:
        return False
    if c2 in "wxy":
        return False
    # single vowel group = likely monosyllable with final stress
    return len(re.findall(r"[aeiou]+", word)) == 1


# noun-forming suffixes whose bearers never take -ly/-ness (the round-4
# table fabricated improvemently/improvementness from these)
_NOUN_SUFFIX = ("ment", "ship", "hood", "ness", "ity", "tion", "sion",
                "ism", "ist", "ing", "er", "or")
# suffixes that mark a word as an adjective with high confidence
_ADJ_SUFFIX = ("ous", "ful", "ive", "less", "ish", "able", "ible",
               "ent", "ant", "al", "ic")


def adjectivish(word: str) -> bool:
    """Conservative adjective detector for -ly/-ness derivation: the
    hand-tagged adjective lexicon plus unambiguous adjective suffixes.
    Verbs and nouns fall through -> no fabricated improvely-class rows."""
    if word in COMMON_ADJECTIVES:
        return True
    if word.endswith(_NOUN_SUFFIX):
        return False
    return word.endswith(_ADJ_SUFFIX)


def load_heteronym_verbs():
    """word -> VERB-tag IPA from the heteronym table: inflected -ed/-ing
    forms are verbs, so 'suspecting' derives from the VERB reading
    səspˈɛkt, not the citation noun sˈʌspɛkt (round-5 derived-table
    audit: noun/verb stress was a top miss class)."""
    path = os.path.join(DATA, "en_heteronyms.tsv")
    verbs = {}
    if not os.path.exists(path):
        return verbs
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, _, readings = line.partition("\t")
            for part in readings.split(";"):
                tag, _, ipa = part.partition(":")
                if tag == "VERB" and ipa:
                    verbs[word] = ipa
    return verbs


HETERONYM_VERBS = load_heteronym_verbs()


def derive(word: str, ipa: str):
    out = {}
    if (len(word) < 3 or word in SKIP or "'" in word
            or not word.isalpha() or not word.islower()):
        return out
    # plural / 3rd person
    if word.endswith(("s", "x", "z", "ch", "sh")):
        out[word + "es"] = _append_plural(ipa)
    elif word.endswith("y") and word[-2] not in VOWELS:
        out[word[:-1] + "ies"] = _append_plural(ipa)
    else:
        out[word + "s"] = _append_plural(ipa)
    # past + progressive (skip obviously non-verbal endings)
    if not word.endswith(("ness", "tion", "sion", "ment", "ity", "ous",
                          "ful", "ism", "ist", "ance", "ence", "ship",
                          "hood", "ly", "ing")):
        # -ate verbs always inflect on the full /eɪt/ form even when the
        # citation entry carries the reduced noun/adjective /ət/ reading
        # (affiliate n. əfˈɪliət but affiliating əfˈɪliˌeɪɾɪŋ in the
        # reference gold lexicon)
        vipa = HETERONYM_VERBS.get(word, ipa)
        if word.endswith("ate") and len(word) > 5 and vipa.endswith("ət"):
            vipa = vipa[:-2] + "ˌeɪt"
        if word.endswith("e") and not word.endswith(("ee", "oe", "ye")):
            out[word + "d"] = _append_past(vipa)
            out[word[:-1] + "ing"] = vipa + "ɪŋ"
        elif word.endswith("y") and word[-2] not in VOWELS:
            out[word[:-1] + "ied"] = _append_past(vipa)
            out[word + "ing"] = vipa + "ɪŋ"
        else:
            stem = word + word[-1] if double_final(word) else word
            out[stem + "ed"] = _append_past(vipa)
            out[stem + "ing"] = vipa + "ɪŋ"
    # adverb / noun-of-quality forms — adjectives only (gated), with the
    # orthography rules: -le -> -ly (simple->simply), -ic -> -ically,
    # -Cy -> -ily; attachment matches en_g2p._LTS_STRIP (-l+ly = /li/,
    # -n+ness = /əs/)
    if adjectivish(word) and not word.endswith("ly"):
        if word.endswith("le") and word[-3:-2] not in ("a", "e", "i", "o", "u"):
            adv = word[:-1] + "y"          # simple -> simply
            adv_ipa = (ipa[:-2] + "li") if ipa.endswith("əl") else ipa + "i"
        elif word.endswith("ic"):
            adv = word + "ally"            # basic -> basically
            adv_ipa = ipa + "əli"          # gold: -əkᵊli (4 syllables)
        elif word.endswith("y") and word[-2] not in VOWELS:
            adv = word[:-1] + "ily"        # happy -> happily
            adv_ipa = ipa[:-1] + "ɪli" if ipa.endswith("i") else ipa + "ɪli"
        else:
            adv = word + "ly"
            adv_ipa = ipa + ("i" if ipa.endswith("l") else "li")
        out[adv] = adv_ipa
        if word.endswith("y") and word[-2] not in VOWELS:
            out[word[:-1] + "iness"] = (
                ipa[:-1] + "inəs" if ipa.endswith("i") else ipa + "inəs"
            )
        else:
            out[word + "ness"] = ipa + ("əs" if ipa.endswith("n") else "nəs")
    return out


def main() -> None:
    core = {}
    with open(os.path.join(DATA, "en_core.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, ipa = line.split("\t")
            core[word] = ipa
    # collision policy: when two citation forms generate the same surface
    # word (improv+ed vs improve+d), the stem whose citation form ends in
    # silent e wins — English verbs in -e vastly outnumber clipped bare
    # forms (the round-4 'improved -> ˈɪmpɹɑvd' regression was exactly
    # this, resolved by dict insertion order). BARE_WINS lists the known
    # counterexamples where the bare stem is the real verb.
    BARE_WINS = {"envelop", "sever"}
    derived = {}  # surface -> (priority, ipa)
    for word, ipa in core.items():
        prio = 2 if (word.endswith("e") and word not in BARE_WINS) else \
            (3 if word in BARE_WINS else 1)
        for w, p in derive(word, ipa).items():
            if w in core:
                continue
            old = derived.get(w)
            if old is None or prio > old[0]:
                derived[w] = (prio, p)
    derived = {w: p for w, (_, p) in derived.items()}
    path = os.path.join(DATA, "en_derived.tsv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("# GENERATED by scripts/build_en_lexicon.py — do not edit\n")
        for w in sorted(derived):
            f.write(f"{w}\t{derived[w]}\n")
    print(f"core {len(core)} + derived {len(derived)} = "
          f"{len(core) + len(derived)} entries -> {path}")


if __name__ == "__main__":
    main()
