# -*- coding: utf-8 -*-
"""Crash-safety fuzz: the frontend must never raise on arbitrary input —
a single bad request would poison a whole serving batch (the scheduler
marks every task in a failed batch FAILED, reference service.py:337-343).

Deterministic subset of the 3000-case sweep run in round 2 (0 failures).
"""
import random

import pytest


@pytest.fixture(scope="module")
def stack():
    from illufly_tts_tpu.frontend.g2p.chinese_g2p import ChineseG2P
    from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P
    from illufly_tts_tpu.frontend.normalization.en import EnTextNormalizer
    from illufly_tts_tpu.frontend.normalization.zh import ZhTextNormalizer

    return (
        ZhTextNormalizer(),
        EnTextNormalizer(),
        ChineseG2P(en_callable=EnglishG2P().text_to_ipa),
    )


POOLS = [
    (0x20, 0x7F), (0x4E00, 0x9FFF), (0x3000, 0x303F), (0xFF00, 0xFFEF),
    (0x1F300, 0x1F6FF), (0x0400, 0x04FF), (0x0600, 0x06FF),
    (0x2000, 0x206F),
]

NASTIES = [
    "", " ", "\x00", "。。。", "1" * 500, "-" * 50, "%%%", "$", "¥",
    "1/0", "0/0", "99999999999999999999999999", "1.2.3.4", "--5", "..5",
    "2023年99月99日", "25:99", "400-", "+86", "½⅓¾", "Ⅻ", "〇", "龘𠀀",
    "ｈｅｌｌｏ　ｗｏｒｌｄ１２３", "a@b@c.com http://", "emoji😀test",
    "‮‭", "𝓱𝓮𝓵𝓵𝓸",
]


def test_fuzz_random_unicode(stack):
    zh, en, g2p = stack
    rng = random.Random(123)
    for i in range(400):
        n = rng.randint(0, 60)
        s = "".join(
            chr(rng.randint(*POOLS[rng.randrange(len(POOLS))]))
            for _ in range(n)
        )
        zh.normalize(s)
        en.normalize(s)
        if i % 20 == 0:
            g2p.text_to_phonemes(s)


def test_fuzz_nasty_inputs(stack):
    zh, en, g2p = stack
    for s in NASTIES:
        zh.normalize(s)
        en.normalize(s)
        g2p.text_to_phonemes(s)


def test_fuzz_adversarial_mixed_pipeline():
    """Round-3 sweep distilled (8000 cases, 0 failures): mixed-script
    text with markdown-link features, thousand-separated and huge
    numbers, currency/units and emoji through the FULL pipeline chain
    (preprocess -> phonemes -> ipa), not just the normalizers."""
    import random
    import string

    from illufly_tts_tpu.pipeline import TTSPipeline

    class Stub:
        sample_rate = 24000

        def load_voice(self, v):
            raise ValueError(v)

        def list_voices(self):
            return []

    pipe = TTSPipeline(synthesizer=Stub())
    rng = random.Random(42)
    ZH = "你好世界天气真好不错嗯啊哦了的地得一二三四五六七八九十百千万亿元年月日号点分秒度"
    FEATURES = ["[New York](/nujork/)", "[Dr](#doctor#)", "[x](-1)",
                "[](/)", "[a](", "](#)", "[b](0.5)"]
    SPECIALS = ["3.14159", "-0.5", "1/3", "50%", "25°C", "13812345678",
                "2023-05-10", "12:34:56", "1,234,567", "$99.99", "￥1,000"]
    pools = [ZH, string.ascii_letters, string.digits,
             "。，！？；：、…—()（）[]【】\"\"''<>《》~·",
             "$€£¥%+-*/=@#&^_|\\{}~`", "😀🎉🚀❤️🌟中🔥", " \t\n"]

    def rand_text(n):
        out = []
        while sum(len(s) for s in out) < n:
            r = rng.random()
            if r < 0.05:
                out.append(rng.choice(FEATURES))
            elif r < 0.15:
                out.append(str(rng.randint(0, 10 ** rng.randint(1, 25))))
            elif r < 0.25:
                out.append(rng.choice(SPECIALS))
            else:
                pool = rng.choice(pools)
                out.append("".join(
                    rng.choice(pool) for _ in range(rng.randint(1, 12))
                ))
        return "".join(out)

    for _ in range(250):
        t = rand_text(rng.randint(1, 120))
        ph = pipe.text_to_phonemes(pipe.preprocess_text(t))
        pipe.phonemes_to_ipa(ph)
