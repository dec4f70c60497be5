# -*- coding: utf-8 -*-
"""Deterministic Penn-Treebank-style POS tagger for G2P disambiguation.

The reference resolves heteronyms ("record" the noun vs "record" the verb)
with spaCy's en_core_web_sm tagger (reference:
src/illufly_tts/core/g2p/english_g2p.py:587-593) and keys lexicon entries by
tag with a VERB/NOUN/ADV/ADJ parent-tag fallback (english_g2p.py:253-293).
spaCy is not available in this environment, and a 12 MB statistical model is
the wrong tool for the 6 tag distinctions G2P actually consumes. This module
is a purpose-built deterministic tagger: a closed-class lexicon plus
suffix-shape guesses, disambiguated by ordered context rules (the same
signal a statistical tagger extracts from these positions, but auditable
and version-stable — SURVEY §7 hard-part #4 pins frontend fidelity on
deterministic behavior).

Consumers need exactly:
- VERB vs NOUN vs ADJ parent tags for tag-keyed heteronym entries
- DT ("a"), PRP ("I"), TO/IN ("to", "in"), ADV ("by"), VBD/VBN tense for
  "read"/"used", NNP for letter-spelling
"""
from __future__ import annotations

import re
from typing import List, Optional, Sequence

# --- closed-class lexicon ----------------------------------------------------

DETERMINERS = {
    "the", "a", "an", "this", "that", "these", "those", "each", "every",
    "either", "neither", "some", "any", "no", "another", "such",
}
PRP_SUBJECT = {"i", "we", "they", "you", "he", "she", "it"}
PRP_OBJECT = {"me", "us", "them", "him", "her", "myself", "yourself",
              "himself", "herself", "itself", "ourselves", "themselves"}
POSSESSIVES = {"my", "your", "his", "her", "its", "our", "their", "whose"}
MODALS = {"will", "would", "can", "could", "shall", "should", "may",
          "might", "must", "wo", "ca", "sha"}  # wo/ca/sha from won't/can't
BE_FORMS = {"am", "is", "are", "was", "were", "be", "been", "being",
            "'s", "'re", "'m"}
HAVE_FORMS = {"have", "has", "had", "having", "'ve", "'d"}
DO_FORMS = {"do", "does", "did"}
PREPOSITIONS = {
    "of", "in", "on", "at", "by", "for", "with", "about", "against",
    "between", "into", "through", "during", "before", "after", "above",
    "below", "from", "up", "down", "out", "off", "over", "under", "near",
    "without", "within", "along", "across", "behind", "beyond", "toward",
    "towards", "upon", "among", "around", "per", "via", "despite", "unless",
    "until", "since", "than", "as", "like",
}
CONJUNCTIONS = {"and", "or", "but", "nor", "so", "yet"}
SUBORDINATORS = {"because", "although", "though", "while", "whereas", "if",
                 "when", "whenever", "where", "wherever", "that", "whether"}
ADVERBS = {
    "not", "n't", "very", "too", "also", "just", "now", "then", "here",
    "there", "always", "never", "often", "sometimes", "usually", "again",
    "already", "still", "soon", "quite", "rather", "almost", "even",
    "only", "really", "well", "perhaps", "maybe", "however", "instead",
    "away", "back", "together", "yesterday", "today", "tomorrow",
}
WH_WORDS = {"who": "WP", "whom": "WP", "what": "WP", "which": "WDT",
            "why": "WRB", "how": "WRB"}
# frequent irregular verbs whose base form is not guessable from shape
COMMON_VERBS = {
    "go", "come", "get", "make", "take", "see", "know", "think", "say",
    "tell", "give", "find", "want", "need", "try", "let", "put", "keep",
    "begin", "seem", "help", "show", "hear", "run", "move", "believe",
    "bring", "happen", "write", "sit", "stand", "lose", "pay", "meet",
    "include", "continue", "set", "learn", "change", "lead", "understand",
    "speak", "read", "spend", "grow", "open", "walk", "win", "teach",
    "offer", "remember", "consider", "appear", "buy", "serve", "send",
    "build", "stay", "fall", "cut", "reach", "kill", "raise", "eat",
    "went", "came", "got", "made", "took", "saw", "knew", "thought",
    "said", "told", "gave", "found", "wanted", "needed", "tried",
    "kept", "began", "seemed", "helped", "showed", "heard", "ran",
    "moved", "believed", "brought", "wrote", "sat", "stood", "lost",
    "paid", "met", "spoke", "spent", "grew", "opened", "walked", "won",
    "taught", "bought", "sent", "built", "stayed", "fell", "ate",
}
# past-tense/perfect auxiliaries that force VBN/VBD on an ambiguous verb
PAST_AUX = HAVE_FORMS | {"was", "were", "been"}

_NUM_RE = re.compile(r"^[+-]?\d[\d,]*\.?\d*$")
_PUNCT_TAG = {
    "(": "-LRB-", ")": "-RRB-", ",": ",", ".": ".", "!": ".", "?": ".",
    ";": ":", ":": ":", "—": ":", "-": ":", '"': "''", "“": "``",
    "”": "''", "…": ".",
}


def _closed_class(lower: str) -> Optional[str]:
    if lower in DETERMINERS:
        return "DT"
    if lower in PRP_SUBJECT or lower in PRP_OBJECT:
        return "PRP"
    if lower in POSSESSIVES:
        return "PRP$"
    if lower in MODALS:
        return "MD"
    if lower in BE_FORMS or lower in DO_FORMS:
        # tag be/do forms as verbs; tense detail is irrelevant to consumers
        return "VBZ" if lower in ("is", "does", "'s") else "VBP"
    if lower in HAVE_FORMS:
        return "VBP"
    if lower == "to":
        return "TO"
    if lower in PREPOSITIONS:
        return "IN"
    if lower in CONJUNCTIONS:
        return "CC"
    if lower in SUBORDINATORS:
        return "IN"
    if lower in ADVERBS:
        return "RB"
    if lower in WH_WORDS:
        return WH_WORDS[lower]
    # 'there' tags RB via ADVERBS above; no consumer keys on EX, so the
    # existential reading needs no separate tag
    return None


def _shape_guess(word: str, lower: str, sentence_initial: bool) -> str:
    """Open-class guess from orthography alone (may be overridden by
    context rules)."""
    if word[:1].isupper() and not sentence_initial:
        return "NNP"
    if lower.endswith("ly") and len(lower) > 4:
        return "RB"
    if lower.endswith("ing") and len(lower) > 5:
        return "VBG"
    if lower.endswith(("tion", "sion", "ment", "ness", "ship", "ance",
                       "ence", "ity", "ism", "ist", "ure", "age", "hood")):
        return "NN"
    if lower.endswith(("ous", "ful", "less", "ive", "able", "ible", "al",
                       "ish", "ary")):
        return "JJ"
    if lower.endswith("ed") and len(lower) > 3:
        return "VBD"
    if lower in COMMON_VERBS:
        return "VB"
    if lower.endswith("s") and not lower.endswith("ss") and len(lower) > 3:
        return "NNS"
    return "NN"


def tag_words(words: Sequence[str]) -> List[str]:
    """Tag a token sequence (words and punctuation marks).

    Two passes: shape/lexicon guesses, then ordered context rules walking
    left-to-right (each rule fires only on words the lexicon did not pin)."""
    n = len(words)
    tags: List[str] = []
    fixed: List[bool] = []  # closed-class decisions are final
    sentence_start = True
    for word in words:
        if not word or not any(c.isalpha() for c in word):
            if _NUM_RE.match(word or ""):
                tags.append("CD")
            else:
                tags.append(_PUNCT_TAG.get(word, "NFP"))
            fixed.append(True)
            if word in (".", "!", "?", "…"):
                sentence_start = True
            continue
        lower = word.lower()
        closed = _closed_class(lower)
        if closed is not None:
            tags.append(closed)
            fixed.append(True)
        else:
            tags.append(_shape_guess(word, lower, sentence_start))
            fixed.append(False)
        sentence_start = False

    def prev_real(i: int):
        """Last non-punctuation (word, tag) before position i."""
        for j in range(i - 1, -1, -1):
            if tags[j] not in (".", ",", ":", "NFP", "``", "''", "-LRB-",
                               "-RRB-"):
                return words[j].lower(), tags[j]
        return None, None

    for i in range(n):
        if fixed[i]:
            continue
        word = words[i]
        lower = word.lower()
        pw, pt = prev_real(i)
        # context rules, most specific first
        if pw is None and tags[i] == "NN" and i + 1 < n and (
            tags[i + 1] in ("DT", "PRP$", "PRP")
        ):
            # clause-initial word heading a noun phrase or pronoun:
            # imperative ("Close the door", "Permit me")
            tags[i] = "VB"
        elif pt in ("TO", "MD") or pw in DO_FORMS:
            # "to record", "will record", "didn't record" -> verb base
            tags[i] = "VB"
        elif pw in PAST_AUX:
            # "has recorded", "was read" -> past participle
            tags[i] = "VBN"
        elif pw in BE_FORMS:
            # "is recording" kept by shape; "is live" -> adjective
            tags[i] = "VBG" if lower.endswith("ing") else "JJ"
        elif pt in ("DT", "PRP$", "JJ", "CD"):
            # "the record", "my record", "a close call" -> nominal; keep
            # plural and proper-noun shape, and keep JJ when the *next*
            # word is itself nominal ("a live concert")
            nxt_tag = tags[i + 1] if i + 1 < n else None
            if tags[i] == "JJ" and nxt_tag in ("NN", "NNS", "NNP"):
                pass  # attributive adjective survives
            elif tags[i] not in ("NNS", "NNP"):
                tags[i] = "NN"
        elif pt == "PRP" and pw in PRP_SUBJECT:
            # "they record", "I present" -> finite verb
            tags[i] = "VBZ" if lower.endswith("s") else "VBP"
        elif pt == "IN":
            if tags[i] not in ("NNS", "NNP", "VBG"):
                tags[i] = "NN"
        elif pt == "NNS" and tags[i] == "NN" and i + 1 < n and (
            tags[i + 1] in ("RB", "IN", ".", ",")
        ):
            # plural subject + verb: "muscles contract quickly",
            # "these results conflict with ours". Keyed on what FOLLOWS
            # (adverb/preposition/clause end) so noun compounds headed by
            # a plural ("sports contract was...") stay nominal.
            tags[i] = "VBP"
        # NOTE: no bare "noun noun -> verb" rule: English noun compounds
        # ("software update") are far commoner than bare-plural-subject
        # clauses, so nominal stays the default reading
    return tags


def parent_tag(tag: Optional[str]) -> Optional[str]:
    """Collapse to the families lexicon entries key on (reference
    english_g2p.py:253-265)."""
    if tag is None:
        return None
    if tag.startswith("VB"):
        return "VERB"
    if tag.startswith("NN"):
        return "NOUN"
    if tag.startswith("RB") or tag.startswith("ADV"):
        return "ADV"
    if tag.startswith("JJ") or tag.startswith("ADJ"):
        return "ADJ"
    return tag
