# -*- coding: utf-8 -*-
"""OOV-rate and LTS-accuracy measurements (VERDICT r2 next-4).

The reference never measures its OOV quality (it spells unknown words
letter-by-letter after the silver lexicon runs out, english_g2p.py:295).
Here both halves are measured: how often real text leaves the lexicon +
derivation engine, and how accurate the trained letter-to-sound fallback
is on words it has never seen."""
import os
import re

import pytest

from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P, _lts, _stress_lts
from illufly_tts_tpu.frontend.g2p.en_lexicon import LEXICON
from illufly_tts_tpu.frontend.g2p.lts_model import LTSModel, get_model, train

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "illufly_tts_tpu", "frontend", "g2p", "data",
)

# a realistic mixed-register corpus (news, science, sports, lifestyle)
CORPUS = """
The global economy showed signs of recovery this quarter as manufacturing
output increased across several regions. Analysts at major banks expect
interest rates to remain stable through the end of the year, although
inflation concerns persist in energy and housing markets. Technology
companies reported strong earnings, driven by demand for cloud computing
and artificial intelligence services. Meanwhile, researchers announced a
breakthrough in battery chemistry that could extend electric vehicle range
by forty percent. The discovery, published in a leading scientific journal,
involves a novel electrolyte formulation that resists degradation at high
temperatures. Climate scientists warned that ocean temperatures reached
record levels for the third consecutive month, threatening coral reefs and
coastal fisheries. In sports, the championship game drew millions of
viewers worldwide, with the underdog team securing a dramatic victory in
overtime. The quarterback threw three touchdown passes despite playing
with an injured shoulder. Local communities celebrated the opening of a
new public library featuring solar panels, rainwater harvesting, and a
rooftop garden. Students from nearby schools attended workshops on
robotics, creative writing, and environmental stewardship. Doctors
recommend regular exercise, balanced nutrition, and adequate sleep for
maintaining cardiovascular health. A recent study tracked ten thousand
participants over two decades, finding significant correlations between
lifestyle choices and longevity outcomes. The museum exhibition features
paintings, sculptures, and photographs from seventeen countries, exploring
themes of migration, identity, and belonging. Visitors can experience an
immersive installation combining projected imagery with ambient soundscapes.
Investors weighed the implications of the merger announcement while
regulators examined antitrust concerns. The spacecraft completed its
orbital maneuver flawlessly, transmitting telemetry data back to mission
control throughout the descent. Engineers verified every subsystem before
authorizing the landing sequence.
"""


def _strip(s):
    return s.replace("ˈ", "").replace("ˌ", "")


def _edit(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _load_core():
    table = {}
    with open(os.path.join(DATA, "en_core.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            w, _, ipa = line.partition("\t")
            if ipa and w.isalpha() and len(w) > 2:
                table[w.lower()] = ipa
    return table


def test_oov_rate_below_2_percent():
    """Lexicon + derivation engine must cover >98% of realistic text."""
    g2p = EnglishG2P()
    words = re.findall(r"[A-Za-z]+(?:'[A-Za-z]+)?", CORPUS)
    assert len(words) > 250
    oov = [
        w.lower() for w in words
        if w.lower() not in LEXICON and g2p._derive(w.lower()) is None
    ]
    rate = len(oov) / len(words)
    assert rate < 0.02, (rate, sorted(set(oov)))


def test_shipped_model_loads_and_predicts():
    model = get_model()
    assert model is not None, "data/lts_model.json missing — run scripts/train_lts.py"
    # plausible outputs on unseen brand-like words
    for w in ("zorbafex", "quendleton", "brimstock"):
        out = model.predict(w)
        assert out and len(out) >= 4, (w, out)


@pytest.mark.slow
def test_lts_accuracy_held_out():
    """Retrain on 6/7 of the lexicon, evaluate phoneme accuracy on the
    held-out 1/7 (words the model has never seen). Measured 87-88%;
    asserted floor 84% (jitter margin). The pure rule fallback sits at
    ~78% on the same split — the trained model must beat it."""
    core = _load_core()
    items = sorted(core.items())
    held = dict(it for i, it in enumerate(items) if i % 7 == 0)
    trainset = dict(it for i, it in enumerate(items) if i % 7 != 0)
    # derived forms help, but exclude those built from held-out roots
    with open(os.path.join(DATA, "en_derived.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            w, _, ipa = line.partition("\t")
            if not ipa or not w.isalpha() or len(w) <= 2:
                continue
            w = w.lower()
            if any(w.startswith(r) for r in held if len(r) >= 3):
                continue
            trainset[w] = ipa
    model = LTSModel(train(trainset))

    def accuracy(predict):
        tot_len = tot_err = 0
        for w, gold in held.items():
            pred = predict(w)
            if pred is None:
                pred = ""
            g = _strip(gold)
            tot_err += _edit(_strip(pred), g)
            tot_len += len(g)
        return 1 - tot_err / tot_len

    model_acc = accuracy(model.predict)
    rule_acc = accuracy(lambda w: _stress_lts(w, _lts(w)))
    assert model_acc >= 0.84, model_acc
    assert model_acc > rule_acc, (model_acc, rule_acc)


def test_predict_memo_thread_safety():
    """The scheduler's split-phase dispatch runs the frontend from
    concurrent worker threads; the predict() LRU memo must not race its
    own eviction (get/move_to_end vs popitem -> KeyError)."""
    import random
    import threading

    model = get_model()
    assert model is not None
    model._memo.clear()
    model._memo_cap = 64  # force constant eviction pressure

    words = [
        "".join(random.Random(i).choices("abcdefghijklmnop", k=6))
        for i in range(200)
    ]
    errors = []

    def hammer(seed):
        rng = random.Random(seed)
        try:
            for _ in range(2000):
                model.predict(rng.choice(words))
        except Exception as exc:  # pragma: no cover - the regression
            errors.append(exc)

    threads = [threading.Thread(target=hammer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    model._memo.clear()
    model._memo_cap = 50_000
