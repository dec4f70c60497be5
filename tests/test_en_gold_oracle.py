# -*- coding: utf-8 -*-
"""English G2P word accuracy measured against the reference gold lexicon.

The reference ships a 90,201-entry gold US lexicon
(/root/reference/src/illufly_tts/core/g2p/data/us_gold.json, loaded at
english_g2p.py:160-170). Round-3 verdict task 1: use it as a TEST-TIME
ORACLE ONLY (never vendored) and measure word accuracy on (a) the
frequency-weighted top-5k sample and (b) a seeded random 2k sample, with
symbol conventions normalized on both sides (scripts/eval_en_oracle.py
documents the canon).

Skips when the reference checkout is absent (the package itself never
depends on it).
"""
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "scripts"),
)

from eval_en_oracle import (  # noqa: E402
    GOLD_PATH, SPECIAL_CASED, evaluate, load_gold, random_sample,
    top5k_words,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD_PATH),
    reason="reference gold lexicon not available",
)


@pytest.fixture(scope="module")
def gold():
    return load_gold()


@pytest.fixture(scope="module")
def g2p():
    from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P

    return EnglishG2P()


def test_top5k_accuracy(gold, g2p):
    """>=95% primary (stress-insensitive) accuracy on the frequency-
    weighted top-5k vocabulary (round-4 done criterion)."""
    words = [
        w for w in top5k_words()
        if w in gold and w.lower() not in SPECIAL_CASED
    ]
    assert len(words) > 4000
    r = evaluate(words, gold, g2p)
    assert r["primary"] >= 0.97, (
        f"top5k primary accuracy {r['primary']:.3f} < 0.97 "
        f"(round-5 measured 0.984, n={r['n']}); "
        f"first mismatches: {r['mismatches'][:10]}"
    )


def test_top5k_strict_accuracy(gold, g2p):
    """Stress-SENSITIVE accuracy on the top-5k vocabulary (round-5 task 7:
    strict >=0.80, from 0.670 in round 4 — closed by the monosyllable
    stress convention + suffix restress work). Stress marks feed the
    acoustic model (reference english_g2p.py:61-88 stress algebra), so
    this tier is a real quality contract, not a diagnostic."""
    words = [
        w for w in top5k_words()
        if w in gold and w.lower() not in SPECIAL_CASED
    ]
    r = evaluate(words, gold, g2p)
    assert r["strict"] >= 0.81, (
        f"top5k strict (stress-sensitive) accuracy {r['strict']:.3f} "
        f"< 0.81 (round-5 measured 0.831, n={r['n']})"
    )


def test_random_gold_accuracy(gold, g2p):
    """Primary accuracy on a seeded random 2k sample of the full gold
    vocabulary (round-3 measured 34.4%; round-4 target 70%; round-5
    measured 71.7% after the retrained d=288 neural LTS + suffix-tail
    override + ~1,200 authored entries). The floor asserted here is the
    measured high-water mark minus sampling slack — raise it with every
    lexicon/LTS improvement, never lower it."""
    words = random_sample(gold, 2000)
    r = evaluate(words, gold, g2p)
    assert r["primary"] >= 0.70, (
        f"random primary accuracy {r['primary']:.3f} regressed below the "
        f"measured floor (n={r['n']})"
    )


def test_derived_table_sample_accuracy(gold):
    """Audit the GENERATED derived lexicon against the oracle: a seeded
    500-row sample of en_derived.tsv rows that gold also carries must be
    >=90% primary-accurate (round-5 task 2 criterion — the generator
    shipped 'improved -> ˈɪmpɹɑvd' in round 4 because nothing sampled
    its output)."""
    import random as _random

    from eval_en_oracle import gold_variants, primary_match

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "illufly_tts_tpu", "frontend", "g2p", "data", "en_derived.tsv",
    )
    rows = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            w, _, ipa = line.partition("\t")
            if w in gold:
                rows[w] = ipa
    sample = _random.Random(20260820).sample(sorted(rows), 500)
    misses = []
    for w in sample:
        refs = gold_variants(gold[w])
        if not any(primary_match(rows[w], r) for r in refs):
            misses.append((w, rows[w], refs[0]))
    acc = 1 - len(misses) / len(sample)
    assert acc >= 0.90, (
        f"derived-table sample accuracy {acc:.3f} < 0.90; "
        f"first misses: {misses[:15]}"
    )


def test_random_gold_accuracy_unseeded_holdout(gold, g2p):
    """Generalization guard: a second sample with a DIFFERENT seed must
    not collapse relative to the seeded sample — protects the seeded
    number from turning into test-set overfitting."""
    import random as _random

    keys = sorted(k for k, v in gold.items() if isinstance(v, str))
    rng = _random.Random(777)
    words = rng.sample(keys, 1000)
    r = evaluate(words, gold, g2p)
    assert r["primary"] >= 0.72, (
        f"holdout (seed 777) primary accuracy {r['primary']:.3f} — "
        f"seeded-sample gains are not generalizing (round-5 measured 0.740)"
    )
