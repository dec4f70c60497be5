# -*- coding: utf-8 -*-
"""zh polyphone accuracy battery (round-4 task 5).

The reference disambiguates polyphones with pypinyin + the large_pinyin
phrase dictionary (~100k phrases, reference zh_frontend.py:26,85) and
jieba POS segmentation. Our own pinyin engine (frontend/g2p/pinyin/) uses
an authored phrase table; this battery measures the END-TO-END reading
(jieba segmentation + phrase lookup + tone sandhi, via ZHFrontend) for
the high-frequency polyphones on an authored >=300-target corpus.

Format of tests/data/zh_polyphone_battery.tsv: each line is a sentence
with targets marked {char:expected_pinyin}; expected tones are the
post-sandhi surface tones. A documented failure inventory is kept in
KNOWN_FAILURES (asserted exactly, so any newly-fixed or newly-broken
reading surfaces as a test diff); overall accuracy must stay >= 97%.
"""
import os
import re

import pytest

from illufly_tts_tpu.frontend.g2p.zh_frontend import ZHFrontend
from illufly_tts_tpu.frontend.g2p.zhuyin import zhuyin_syllable_to_pinyin

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "zh_polyphone_battery.tsv")

_TARGET = re.compile(r"\{(.):([a-z]+\d)\}")


def load_battery():
    cases = []  # (plain_sentence, [(char_index_in_sentence, char, pinyin)])
    with open(DATA, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            plain = []
            targets = []
            i = 0
            pos = 0
            while i < len(line):
                m = _TARGET.match(line, i)
                if m:
                    targets.append((pos, m.group(1), m.group(2)))
                    plain.append(m.group(1))
                    pos += 1
                    i = m.end()
                else:
                    plain.append(line[i])
                    pos += 1
                    i += 1
            if targets:
                cases.append(("".join(plain), targets))
    return cases


@pytest.fixture(scope="module")
def frontend():
    return ZHFrontend()


# the zhuyin inverse returns engine-internal finals; normalize to standard
# pinyin spelling (v->u after jqxy, y/w onset for standalone finals, the
# zi/ci/si (ii) and zhi/chi/shi (iii) syllabic vowels)
_STANDALONE = {
    "i": "yi", "in": "yin", "ing": "ying", "ia": "ya", "ian": "yan",
    "iao": "yao", "ie": "ye", "iong": "yong", "iou": "you", "iu": "you",
    "u": "wu", "ua": "wa", "uo": "wo", "uai": "wai", "uei": "wei",
    "ui": "wei", "uan": "wan", "uen": "wen", "un": "wen", "uang": "wang",
    "ueng": "weng", "v": "yu", "ve": "yue", "van": "yuan", "vn": "yun",
    "o": "o", "e": "e", "a": "a", "ai": "ai", "ao": "ao", "an": "an",
    "en": "en", "ang": "ang", "eng": "eng", "ou": "ou", "ei": "ei",
    "er": "er",
}
_INITIALS = (
    "zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l", "g", "k",
    "h", "j", "q", "x", "r", "z", "c", "s", "y", "w",
)


def normalize_pinyin(syllable: str) -> str:
    initial = ""
    for cand in _INITIALS:
        if syllable.startswith(cand):
            initial = cand
            break
    final = syllable[len(initial):]
    if not initial:
        return _STANDALONE.get(final, final)
    final = final.replace("iii", "i").replace("ii", "i")
    if initial in ("j", "q", "x", "y"):
        final = final.replace("v", "u")
    if final == "uei":
        final = "ui"
    elif final == "uen":
        final = "un"
    elif final == "iou":
        final = "iu"
    return initial + final


def _surface_pinyin(frontend, sentence):
    """-> per-character pinyin list (None for chars we can't align)."""
    _, tokens = frontend(sentence, with_erhua=False)
    out = {}
    pos = 0
    cursor = 0
    for tok in tokens:
        start = sentence.find(tok.text, cursor)
        if start < 0:
            continue
        cursor = start + len(tok.text)
        sylls = [s for s in re.findall(r"[^\d]+\d", tok.phonemes or "")]
        if len(sylls) != len(tok.text):
            continue
        for k, ch in enumerate(tok.text):
            conv = zhuyin_syllable_to_pinyin(sylls[k])
            if conv is None:
                continue
            initial, final_tone = conv
            tone = final_tone[-1] if final_tone[-1:].isdigit() else ""
            final = final_tone.rstrip("012345")
            out[start + k] = (
                f"{normalize_pinyin(initial + final)}{tone}"
            )
    return out


def evaluate(frontend):
    cases = load_battery()
    total = 0
    failures = []
    for sentence, targets in cases:
        per_char = _surface_pinyin(frontend, sentence)
        for pos, char, want in targets:
            total += 1
            got = per_char.get(pos)
            if got != want:
                failures.append((sentence, char, want, got))
    return total, failures


# documented failure inventory (round-4; each is a real gap to close in
# the phrase table or sandhi rules — asserted exactly so changes surface)
KNOWN_FAILURES = {
    # round-5: pinyin/context_rules.py resolved 12 of the 13 round-4
    # entries (sentence-context rules: 火着/他中/长得/当了/的将/一天假/
    # 量了/先量/结了果/想吐/绕..转/心里很闷). The one残余:
    # 得 now reads dei (fixed from particle de5) but the engine's
    # cross-word third-tone sandhi turns dei3+马(ma3) into dei2 while
    # the battery annotates the underlying dei3 — a tone-sandhi
    # convention difference, not a wrong lexical reading.
    ("我们得马上出发", "得"),
}


def test_battery_size(frontend):
    cases = load_battery()
    n = sum(len(t) for _, t in cases)
    assert n >= 300, n
    assert len(cases) >= 290, len(cases)


def test_polyphone_accuracy(frontend):
    total, failures = evaluate(frontend)
    acc = 1 - len(failures) / total
    new = [(s, c, w, g) for s, c, w, g in failures
           if (s, c) not in KNOWN_FAILURES]
    fixed = KNOWN_FAILURES - {(s, c) for s, c, _, _ in failures}
    assert acc >= 0.97, (acc, new[:30])
    assert not new, new[:30]
    assert not fixed, f"fixed (remove from KNOWN_FAILURES): {fixed}"
