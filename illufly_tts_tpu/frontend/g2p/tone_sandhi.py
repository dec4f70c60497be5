# -*- coding: utf-8 -*-
"""Mandarin tone sandhi.

Fresh implementation of the rules surveyed from the reference's
``ToneSandhi`` (reference: src/illufly_tts/core/g2p/tone_sandhi.py:26-385):

- 不: bu4 -> bu2 before tone 4; V-不-V -> neutral.
- 一: yi1 between reduplication -> neutral; yi2 before tone 4; yi4 before
  tones 1/2/3; ordinal/numeric contexts keep yi1.
- neutral tone: particles, reduplication, common 子/头-suffix nouns and a
  neutral-tone word list.
- third tone: runs of 3rd tones -> all but last become 2nd tone.

Operates on "finals" lists like ``['uo3', 'men5']`` (tone digit last).
"""
from __future__ import annotations

import re
from typing import List, Tuple

_PARTICLES = set("吧呢啊呀哇嘛吗啦哦哟咧喽嘞的地得了着过们")
_NEUTRAL_SUFFIX_OK = set("子头巴么")
# Words where the 子/头 suffix is NOT neutral (real morphemes).
_NOT_NEUTRAL = {
    "电子", "原子", "分子", "量子", "离子", "质子", "中子", "莲子", "男子",
    "女子", "王子", "份子", "独生子", "因子", "粒子", "孢子", "精子",
    "卵子", "种子", "核子", "光子",
}
# Common full-word neutral-tone vocabulary (second syllable neutral).
_NEUTRAL_WORDS = {
    "爸爸", "妈妈", "哥哥", "弟弟", "姐姐", "妹妹", "叔叔", "爷爷", "奶奶",
    "姥姥", "舅舅", "婶婶", "朋友", "衣服", "舒服", "喜欢", "漂亮", "便宜",
    "豆腐", "厉害", "明白", "清楚", "云彩", "棉花", "事情", "先生", "晚上",
    "早上", "枕头", "馒头", "骨头", "木头", "石头", "念头", "苗头", "盼头",
    "丫头", "姑娘", "娃娃", "狐狸", "蛤蟆", "知识", "意思", "休息", "消息",
    "告诉", "答应", "打听", "打扮", "动静", "队伍", "耳朵", "风筝",
    "福气", "甘蔗", "高粱", "膏药", "规矩", "闺女", "孩子", "合同", "糊涂",
    "火候", "活泼", "机灵", "记号", "记性", "力气", "粮食", "萝卜", "麻烦",
    "买卖", "眉毛", "妈妈", "明白", "蘑菇", "名字", "脑袋", "脾气", "屁股",
    "葡萄", "亲戚", "热闹", "人家", "认识", "商量", "上司", "烧饼", "少爷",
    "身子", "师父", "师傅", "收拾", "首饰", "舒服", "叔叔", "思量", "算盘",
    "他们", "它们", "她们", "头发", "委屈", "位置", "喂养", "我们", "稀罕",
    "咳嗽", "喜欢", "媳妇", "吓唬", "相声", "学问", "衣裳", "意思", "熨斗",
    "咱们", "张罗", "帐篷", "招呼", "折腾", "这个", "那个", "镇静", "芝麻",
    "指甲", "指头", "主意", "转悠", "庄稼", "状元", "椅子", "桌子", "房子",
    "鼻子", "句子", "样子", "日子", "孩子", "裤子", "裙子", "袜子", "帽子",
    "筷子", "杯子", "盘子", "瓶子", "篮子", "箱子", "袋子", "本子", "刀子",
    "叉子", "勺子", "梳子", "镜子", "被子", "垫子", "毯子", "帘子", "柜子",
    "架子", "凳子", "轮子", "车子", "票子", "面子", "里子", "点子", "法子",
    "路子", "嗓子", "脖子", "肚子", "膀子", "爪子", "尾巴", "嘴巴", "下巴",
    "什么", "怎么", "这么", "那么", "多么",
}


def _tone(final: str) -> str:
    return final[-1] if final and final[-1].isdigit() else ""


def _set_tone(final: str, tone: str) -> str:
    if final and final[-1].isdigit():
        return final[:-1] + tone
    return final + tone


class ToneSandhi:
    def pre_merge_for_modify(
        self, seg: List[Tuple[str, str]]
    ) -> List[Tuple[str, str]]:
        """Re-merge segmentation to give sandhi the right windows:
        attach 不/一 to the following word, merge reduplications, attach 儿."""
        merged: List[Tuple[str, str]] = []
        i = 0
        while i < len(seg):
            word, pos = seg[i]
            nxt = seg[i + 1] if i + 1 < len(seg) else None
            if word in ("不", "一") and nxt is not None and len(nxt[0]) <= 2 \
                    and re.match(r"[一-鿿]", nxt[0] or " "):
                merged.append((word + nxt[0], nxt[1]))
                i += 2
                continue
            if merged and word == merged[-1][0] and len(word) == 1 \
                    and re.match(r"[一-鿿]", word):
                merged[-1] = (merged[-1][0] + word, merged[-1][1])
                i += 1
                continue
            if word == "儿" and merged and merged[-1][1] not in ("x", "eng"):
                merged[-1] = (merged[-1][0] + "儿", merged[-1][1])
                i += 1
                continue
            merged.append((word, pos))
            i += 1
        return merged

    # --- individual rules ---------------------------------------------------

    def _bu_sandhi(self, word: str, finals: List[str]) -> List[str]:
        for i, char in enumerate(word):
            if char != "不" or i >= len(finals):
                continue
            if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
                finals[i] = _set_tone(finals[i], "5")  # 看不看
            elif i + 1 < len(finals) and _tone(finals[i + 1]) == "4":
                finals[i] = _set_tone(finals[i], "2")  # 不是 bu2
            else:
                finals[i] = _set_tone(finals[i], "4")
        return finals

    def _yi_sandhi(self, word: str, finals: List[str]) -> List[str]:
        for i, char in enumerate(word):
            if char != "一" or i >= len(finals):
                continue
            prev_c = word[i - 1] if i > 0 else ""
            next_c = word[i + 1] if i + 1 < len(word) else ""
            if prev_c and prev_c == next_c:
                finals[i] = _set_tone(finals[i], "5")  # 想一想
            elif (prev_c and prev_c in "第初") or (
                next_c and next_c in "月日号年零一二三四五六七八九十百千万亿"
            ):
                finals[i] = _set_tone(finals[i], "1")  # ordinal / numeral
            elif next_c and i + 1 < len(finals):
                if _tone(finals[i + 1]) == "4":
                    finals[i] = _set_tone(finals[i], "2")  # 一个 yi2ge4
                else:
                    finals[i] = _set_tone(finals[i], "4")  # 一天 yi4tian1
        return finals

    def _neural_sandhi(
        self, word: str, pos: str, finals: List[str]
    ) -> List[str]:
        if not finals:
            return finals
        # reduplication: 爸爸, 看看
        for j in range(1, len(word)):
            if j < len(finals) and word[j] == word[j - 1] and pos[:1] in "nva":
                finals[j] = _set_tone(finals[j], "5")
        if word in _NEUTRAL_WORDS and len(finals) == len(word):
            finals[-1] = _set_tone(finals[-1], "5")
        elif (
            len(word) >= 2
            and word[-1] in _NEUTRAL_SUFFIX_OK
            and word not in _NOT_NEUTRAL
            and pos[:1] in ("n", "r")
        ):
            finals[-1] = _set_tone(finals[-1], "5")
        elif len(word) == 1 and word in _PARTICLES and pos[:1] in ("u", "y", "e"):
            finals[-1] = _set_tone(finals[-1], "5")
        return finals

    def _three_sandhi(self, word: str, finals: List[str]) -> List[str]:
        n = len(finals)
        i = 0
        while i < n:
            if _tone(finals[i]) == "3":
                j = i
                while j + 1 < n and _tone(finals[j + 1]) == "3":
                    j += 1
                for k in range(i, j):
                    finals[k] = _set_tone(finals[k], "2")
                i = j + 1
            else:
                i += 1
        return finals

    def modified_tone(
        self, word: str, pos: str, finals: List[str]
    ) -> List[str]:
        finals = self._bu_sandhi(word, finals)
        finals = self._yi_sandhi(word, finals)
        finals = self._neural_sandhi(word, pos, finals)
        finals = self._three_sandhi(word, finals)
        return finals
