# -*- coding: utf-8 -*-
"""Bit-level parity against the ACTUAL reference normalizers.

The reference's zh normalization modules are pure stdlib (its constants.py
only needs a pypinyin flag, stubbed here), so we can import them from
/root/reference and diff outputs directly. This is the strongest parity
gate available in this environment (the model side can't run — the
`kokoro`/`pypinyin` deps aren't installed).

Known intentional divergences (each asserted explicitly):
- year ranges: the reference emits a doubled 年 ("一九一一年年统治") — a bug
  in its replace_year_range; we produce the correct single 年.
"""
import importlib
import importlib.util
import os
import sys
import types

import pytest

REF_BASE = "/root/reference/src/illufly_tts/core/normalization"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_BASE), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_zh():
    if "pypinyin" not in sys.modules:
        pp = types.ModuleType("pypinyin")
        ppc = types.ModuleType("pypinyin.constants")
        ppc.SUPPORT_UCS4 = True
        pp.constants = ppc
        sys.modules["pypinyin"] = pp
        sys.modules["pypinyin.constants"] = ppc
    spec = importlib.util.spec_from_file_location(
        "refnorm_zh",
        REF_BASE + "/zh/__init__.py",
        submodule_search_locations=[REF_BASE + "/zh"],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refnorm_zh"] = mod
    spec.loader.exec_module(mod)
    tn = importlib.import_module("refnorm_zh.text_normalization")
    return tn.ZhTextNormalizer()


@pytest.fixture(scope="module")
def mine_zh():
    from illufly_tts_tpu.frontend.normalization.zh import ZhTextNormalizer

    return ZhTextNormalizer()


IDENTICAL_CASES = [
    "今天是2023年5月10日，天气真好。",
    "价格是1234.56元，占比75%，电话是13812345678。",
    "会议安排在上午10:30开始。",
    "这个班有42名学生，其中女生占比约为2/3。",
    "气温-5度，及格率为85.5%。",
    "请拨打400-123-4567。",
    "距离目标还有9.5km。",
    "他考了100分，提高了3.2%。",
    "售价为7999元。",
    "现在是8:00-10:30。",
    "编号是12345678。",
    "增长了3-5倍。",
    "百分之50的人。",
    "今天是2023-05-10。",
    "共计10000元整。",
]


def test_identical_to_reference(ref_zh, mine_zh):
    diffs = []
    for case in IDENTICAL_CASES:
        ref = "".join(ref_zh.normalize(case))
        mine = "".join(mine_zh.normalize(case))
        if ref != mine:
            diffs.append((case, ref, mine))
    assert not diffs, "\n".join(
        f"{c}\n  ref : {r}\n  mine: {m}" for c, r, m in diffs
    )


def test_year_range_reference_bug_fixed(ref_zh, mine_zh):
    case = "1644~1911年统治中国。"
    ref = "".join(ref_zh.normalize(case))
    mine = "".join(mine_zh.normalize(case))
    assert "年年" in ref          # the reference's doubled-年 bug
    assert "年年" not in mine     # we keep the correct single 年
    assert "一六四四年至一九一一年" in mine
