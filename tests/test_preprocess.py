# -*- coding: utf-8 -*-
"""Pipeline preprocessing contract — mirrors the reference's
tests/normalization/test_pipeline.py assertions."""
import pytest

from illufly_tts_tpu.pipeline import TTSPipeline


class StubSynthesizer:
    sample_rate = 24000

    def load_voice(self, voice_id):
        raise ValueError(voice_id)

    def list_voices(self):
        return []


@pytest.fixture(scope="module")
def pipe():
    return TTSPipeline(synthesizer=StubSynthesizer())


def test_pure_chinese(pipe):
    result = pipe.preprocess_text("今天是2023年5月10日，天气真好。")
    assert "二零二三年五月十日" in result


def test_pure_english(pipe):
    result = pipe.preprocess_text("Today is May 10th, 2023. The weather is nice.")
    assert "May" in result
    assert "tenth" in result
    low = result.lower()
    assert "twenty twenty three" in low or "two thousand twenty three" in low


def test_mixed(pipe):
    result = pipe.preprocess_text("今天是May 10th，气温25°C，真是a beautiful day！")
    assert "今天是" in result
    assert "气温二十五摄氏度" in result or "气温二十五度" in result
    assert "May" in result
    assert "beautiful day" in result


def test_zh_special_chars(pipe):
    result = pipe.preprocess_text("价格是￥1234.56元，占比75%，电话是13812345678。")
    assert "价格是" in result
    assert "一千二百三十四点五六元" in result
    assert "百分之七十五" in result
    assert "幺三八幺二三四五六七八" in result


def test_en_special_chars(pipe):
    result = pipe.preprocess_text(
        "The price is $1234.56, which is 75% of the total. Call +1-234-567-8900."
    )
    assert "price" in result
    low = result.lower()
    assert "dollars" in low or "one thousand" in low
    assert "percent" in low
    assert "Call" in result


def test_mixed_product(pipe):
    result = pipe.preprocess_text("购买iPhone 13 Pro的价格是$999.99，折合人民币约￥6400元。")
    assert "购买" in result
    assert "iPhone" in result
    assert "价格是" in result
    assert "折合人民币约" in result
    assert "六千四百元" in result


def test_numbers(pipe):
    cn = pipe.preprocess_text("这个班有42名学生，其中女生占比约为2/3。")
    assert "四十二名" in cn
    assert "三分之二" in cn
    en = pipe.preprocess_text(
        "There are 42 students in this class, about 2/3 of them are girls."
    )
    assert "forty" in en.lower()
    assert "thirds" in en or "third" in en


def test_datetime(pipe):
    cn = pipe.preprocess_text("会议安排在2023年6月1日上午10:30开始。")
    assert "二零二三年六月一日" in cn
    assert "十点三十分" in cn or "十点半" in cn
    en = pipe.preprocess_text("The meeting is scheduled for 10:30 AM on June 1st, 2023.")
    low = en.lower()
    assert "ten thirty" in low or "half past ten" in low
    assert "in the morning" in low
    assert "june" in low
    assert any(x in low for x in ["first", "1st", "one", "1"])
    assert any(x in low for x in [
        "twenty twenty three", "two thousand twenty three",
        "two thousand and twenty three", "2023",
    ])


def test_currency(pipe):
    cn = pipe.preprocess_text("这件商品原价￥1299.99，现在降价到￥999元。")
    assert "这件商品原价￥" in cn
    assert "一千二百九十九点九九" in cn
    assert "现在降价到￥" in cn
    assert "九百九十九元" in cn
    en = pipe.preprocess_text("This product was originally $1299.99, now reduced to $999.")
    low = en.lower()
    assert "$" in en or "dollar" in low
    assert "one thousand two hundred ninety nine" in low
    assert "nine hundred ninety nine" in low


def test_percent(pipe):
    cn = pipe.preprocess_text("此次考试及格率为85.5%，比去年提高了3.2%。")
    assert "百分之八十五点五" in cn
    assert "百分之三点二" in cn
    en = pipe.preprocess_text(
        "The pass rate for this exam is 85.5%, which is 3.2% higher than last year."
    )
    assert "eighty" in en.lower()
    assert "percent" in en.lower()


def test_phone(pipe):
    cn = pipe.preprocess_text("请拨打客服电话400-123-4567或者13812345678。")
    assert "四零零" in cn
    assert "一二三" in cn or "幺二三" in cn
    assert "四五六七" in cn
    assert "一三八" in cn or "幺三八" in cn
    en = pipe.preprocess_text(
        "Please call our customer service at +1-800-123-4567 or (123) 456-7890."
    )
    assert "123" in en or "one" in en.lower()


def test_complex_mixed(pipe):
    text = (
        "欢迎来到Apple Store，iPhone 13 Pro (128GB) 售价为¥7999元，"
        "折扣价为原价的85%，约$1199.99。详情请致电400-666-8800。"
        "The event starts at 10:30 AM on 2023/06/15, 请准时参加！"
    )
    result = pipe.preprocess_text(text)
    assert "欢迎来到" in result
    assert "售价为" in result
    assert "七千九百九十九元" in result
    assert "折扣价为原价的百分之八十五" in result
    assert "详情请致电" in result
    assert "请准时参加" in result
    assert "Apple Store" in result
    assert "iPhone" in result
    low = result.lower()
    assert "ten thirty" in low or "half past ten" in low
    assert "june" in low
    assert "fifteen" in low
    assert "twenty twenty three" in low or "two thousand twenty three" in low


def test_edge_cases(pipe):
    assert pipe.preprocess_text("") == ""
    assert pipe.preprocess_text("a") == "a"
    assert pipe.preprocess_text("啊") == "啊"
    assert pipe.preprocess_text("1") in ["one", "1", "一"]
    assert len(pipe.preprocess_text("@#$%^&*()_+-=[]{}|;:,./<>?")) > 0
    long_mixed = "中文" * 50 + "English " * 50
    result = pipe.preprocess_text(long_mixed)
    assert "中文" in result
    assert "English" in result


def test_url_email_protection(pipe):
    r1 = pipe.preprocess_text("Please visit www.example.com or contact info@example.com.")
    assert "visit" in r1
    assert "www.example" in r1 or "PROTECTEDURL" in r1
    assert "info@example" in r1 or "PROTECTEDEMAIL" in r1
    r2 = pipe.preprocess_text("请访问www.example.com或发邮件至info@example.com。")
    assert "请访问" in r2
    assert "www.example" in r2 or "PROTECTEDURL" in r2


def test_abbreviations(pipe):
    result = pipe.preprocess_text("项目已完成50%，距离目标还有9.5km，请于A.S.A.P.完成。")
    assert "百分之五十" in result
    assert "九点五" in result
    assert "km" in result or "公里" in result or "千米" in result
    assert "A.S.A.P" in result or "ASAP" in result or "A S A P" in result


def test_product_models(pipe):
    result = pipe.preprocess_text("iPhone-13Pro和Galaxy S22-Ultra都是高端手机。")
    low = result.lower()
    assert "iphone" in low
    assert "thirteen" in low or "13" in result
    assert "galaxy" in low
    assert "twenty two" in low
    assert "高端手机" in result


def test_sentence_boundaries(pipe):
    cn = pipe.preprocess_text("今天天气真好。明天可能会下雨！后天将会放晴？我们拭目以待。")
    for part in ("今天天气真好", "明天可能会下雨", "后天将会放晴", "我们拭目以待"):
        assert part in cn
    en = pipe.preprocess_text(
        "The weather is nice today. It might rain tomorrow! "
        "It will be sunny the day after? We shall see."
    )
    assert "weather is nice today" in en
    assert "might rain tomorrow" in en
    mixed = pipe.preprocess_text("今天是fine day。Tomorrow可能会下雨！Let's wait and see。")
    assert "今天是" in mixed
    assert "fine day" in mixed
    assert "Tomorrow" in mixed
    assert "可能会下雨" in mixed


def test_year_ranges(pipe):
    cn = pipe.preprocess_text("这个朝代从1644~1911年统治中国。")
    assert "一六四四" in cn
    assert "一九一一" in cn
    assert "年" in cn
    cn2 = pipe.preprocess_text("1368-1644年是明朝统治时期")
    assert "一三六八" in cn2 or "1368" in cn2
    assert "一六四四年" in cn2 or "1644年" in cn2
    assert "明朝统治时期" in cn2
    en = pipe.preprocess_text("The Ming Dynasty ruled China from 1368-1644.")
    low = en.lower()
    assert "thirteen sixty eight" in low or "1368" in low
    assert "sixteen forty four" in low or "1644" in low


def test_number_default_language():
    """Mirrors reference tests/test_number_language.py: pure-number text
    follows the pipeline's default_language."""
    zh = TTSPipeline(synthesizer=StubSynthesizer(), default_language="zh")
    en = TTSPipeline(synthesizer=StubSynthesizer(), default_language="en")
    hanzi = set("一二三四五六七八九十百千万亿零点负")
    for text in ("123456", "-123.456"):
        zh_result = zh.preprocess_text(text)
        en_result = en.preprocess_text(text)
        assert any(c in hanzi for c in zh_result), (text, zh_result)
        assert not any(c in hanzi for c in en_result), (text, en_result)
        assert zh_result != en_result


def test_number_with_context(pipe):
    """Numbers take the language of their context, not the default."""
    hanzi = set("一二三四五六七八九十百千万亿零")
    assert any(
        c in hanzi for c in pipe.preprocess_text("前面中文123456")
    )
    assert not any(
        c in hanzi for c in pipe.preprocess_text("English text 123456")
    )
    assert any(c in hanzi for c in pipe.preprocess_text("123.45元"))


def test_mixed_language_number_context(pipe):
    """Sandwiched numbers resolve without crashing and keep both sides."""
    for text in ("中文123英文", "英文123中文"):
        result = pipe.preprocess_text(text)
        assert result, text


def test_ipa_within_budget_splits_instead_of_truncating():
    """A dense segment whose phonemes exceed the 510 model budget is
    re-split at punctuation (recursively) — the reference truncates and
    silently drops words (pipeline.py:191-193)."""
    from illufly_tts_tpu.pipeline import MAX_PHONEMES, TTSPipeline

    pipe = TTSPipeline.__new__(TTSPipeline)
    pipe._init_frontend_only()

    dense = ("中华人民共和国国家发展和改革委员会，" * 12)[:400]
    whole = pipe.phonemes_to_ipa(pipe.text_to_phonemes(dense))
    assert len(whole) > MAX_PHONEMES  # the scenario is real at 400 chars

    parts = pipe._ipa_within_budget(dense)
    assert len(parts) >= 2
    for p in parts:
        assert len(p) <= MAX_PHONEMES
    # nothing lost: the split pieces carry the same phoneme mass (within
    # the few boundary separators the per-piece frontend re-derives)
    assert abs(sum(len(p) for p in parts) - len(whole)) < 40

    # a short segment passes through untouched
    short = pipe._ipa_within_budget("你好。")
    assert len(short) == 1
