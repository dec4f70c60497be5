#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Side-by-side normalizer sweep vs the ACTUAL reference implementation.

Imports the reference's zh/en normalizers from /root/reference (pure
stdlib; pypinyin flag stubbed) and diffs outputs over generated corpora.
Round-2 state: zh 154/158 identical (4 divergences = pinned reference
bugs), en diverges broadly because the reference cascade garbles real
inputs when executed (see tests/test_reference_parity.py).

Usage: python scripts/parity_sweep.py [zh|en|all]
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REF_BASE = "/root/reference/src/illufly_tts/core/normalization"


def load_reference():
    pp = types.ModuleType("pypinyin")
    ppc = types.ModuleType("pypinyin.constants")
    ppc.SUPPORT_UCS4 = True
    pp.constants = ppc
    sys.modules.setdefault("pypinyin", pp)
    sys.modules.setdefault("pypinyin.constants", ppc)
    spec = importlib.util.spec_from_file_location(
        "refnorm", REF_BASE + "/__init__.py",
        submodule_search_locations=[REF_BASE],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refnorm"] = mod
    spec.loader.exec_module(mod)
    zh = importlib.import_module("refnorm.zh.text_normalization")
    en = importlib.import_module("refnorm.en.text_normalization")
    return zh.ZhTextNormalizer(), en.EnTextNormalizer()


def zh_cases():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_reference_parity import IDENTICAL_CASES, _battery

    return IDENTICAL_CASES + _battery()


def en_cases():
    cases = []
    for n in ["0", "42", "1000", "1234", "1000000", "1.5", "-12.5"]:
        cases.append(f"There are {n} items.")
    cases += [
        "The date is June 1st, 2023.", "The date is 12/25/2023.",
        "From June 1 - July 4, 2023.", "From 2019-2023.",
        "It starts at 8:00.", "It starts at 6:45 pm.",
        "Call (555) 123-4567.", "It costs $5.99.",
        "He was born in 1985.", "Visit https://example.com/x now.",
        "A range of 1000-2000 units.",
    ]
    return cases


def run(name, ref, mine, cases, joiner="".join):
    agree, diffs = 0, []
    for c in cases:
        try:
            r = ref.normalize(c)
            r = joiner(r) if isinstance(r, list) else r
        except Exception as exc:  # reference crashes count as diffs
            r = f"<REF RAISED {type(exc).__name__}>"
        m = mine.normalize(c)
        m = joiner(m) if isinstance(m, list) else m
        if r == m:
            agree += 1
        else:
            diffs.append((c, r, m))
    print(f"[{name}] {agree}/{len(cases)} identical")
    for c, r, m in diffs:
        print(f"  case: {c}\n    ref : {r}\n    mine: {m}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not os.path.isdir(REF_BASE):
        sys.exit("reference not mounted at /root/reference")
    ref_zh, ref_en = load_reference()
    if which in ("zh", "all"):
        from illufly_tts_tpu.frontend.normalization.zh import (
            ZhTextNormalizer,
        )

        run("zh", ref_zh, ZhTextNormalizer(), zh_cases())
    if which in ("en", "all"):
        from illufly_tts_tpu.frontend.normalization.en import (
            EnTextNormalizer,
        )

        run("en", ref_en, EnTextNormalizer(), en_cases(),
            joiner=" ".join)


if __name__ == "__main__":
    main()
