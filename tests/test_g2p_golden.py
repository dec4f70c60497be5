# -*- coding: utf-8 -*-
"""Golden-output regression suite for Chinese G2P.

Frozen zhuyin + IPA outputs for a sentence battery. If a frontend change
alters any of these, the change must be reviewed for linguistic correctness
before updating the goldens (SURVEY §7 hard-part 4: snapshot-test the
frontend aggressively)."""
from illufly_tts_tpu.frontend.g2p.chinese_g2p import ChineseG2P
from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P

GOLDEN = {
    '你好，这是一个测试。': ('ㄋㄧ2ㄏㄠ3, ㄓㄜ4/ㄕㄭ4/ㄧ2ㄍㄜ5/ㄘㄜ4ㄕㄭ4.', 'ni↗xau↓, ʈʂɤ↘ ʂɨ↘ i↗kɤ tsʰɤ↘ʂɨ↘.'),
    '今天天气真好。': ('ㄐㄧㄣ1ㄊㄧㄢ1ㄊㄧㄢ1ㄑㄧ4/ㄓㄣ1ㄏㄠ3.', 'tɕin→tʰjɛn→tʰjɛn→tɕʰi↘ ʈʂən→xau↓.'),
    '我们都有一个家。': ('ㄨㄛ3ㄇㄣ5/ㄉㄡ1/ㄧㄡ3/ㄧ2ㄍㄜ5/ㄐㄧㄚ1.', 'wo↓mən tou→ jou↓ i↗kɤ tɕja→.'),
    '他不是不想去。': ('ㄊㄚ1/ㄅㄨ2ㄕㄭ4/ㄅㄨ4ㄒㄧㄤ3/ㄑㄩ4.', 'tʰa→ pu↗ʂɨ↘ pu↘ɕjaŋ↓ tɕʰy↘.'),
    '妈妈在银行工作。': ('ㄇㄚ1ㄇㄚ5/ㄗㄞ4/ㄧㄣ2ㄏㄤ2/ㄍㄨㄥ1ㄗㄨㄛ4.', 'ma→ma tsai↘ in↗xaŋ↗ kʊŋ→tswo↘.'),
    '小孩儿在玩儿。': ('ㄒㄧㄠ3ㄏㄞㄦ2/ㄗㄞ4/ㄨㄢㄦ2.', 'ɕjau↓xaiɚ↗ tsai↘ wanɚ↗.'),
    '一二三四五六七八九十。': ('ㄧ1ㄦ4ㄙㄢ1ㄙㄭ4ㄨ3ㄌㄧㄡ4ㄑㄧ1ㄅㄚ1ㄐㄧㄡ3ㄕㄭ2.', 'i→ɚ↘san→sɨ↘u↓ljou↘tɕʰi→pa→tɕjou↓ʂɨ↗.'),
    '这个东西多少钱？': ('ㄓㄜ4ㄍㄜ5/ㄉㄨㄥ1ㄒㄧ5/ㄉㄨㄛ1ㄕㄠ5/ㄑㄧㄢ2?', 'ʈʂɤ↘kɤ tʊŋ→ɕi two→ʂau tɕʰjɛn↗?'),
    '我觉得这个音乐很好听。': ('ㄨㄛ3/ㄐㄩㄝ2ㄉㄜ5/ㄓㄜ4ㄍㄜ5/ㄧㄣ1ㄩㄝ4/ㄏㄣ2ㄏㄠ3ㄊㄧㄥ1.', 'wo↓ tɕɥe↗tɤ ʈʂɤ↘kɤ in→ɥe↘ xən↗xau↓tʰiŋ→.'),
    '请给我打电话。': ('ㄑㄧㄥ3ㄍㄟ2ㄨㄛ2/ㄉㄚ3ㄉㄧㄢ4ㄏㄨㄚ4.', 'tɕʰiŋ↓kei↗wo↗ ta↓tjɛn↘xwa↘.'),
    '老师教我们学习知识。': ('ㄌㄠ3ㄕㄭ1/ㄐㄧㄠ1/ㄨㄛ3ㄇㄣ5/ㄒㄩㄝ2ㄒㄧ2/ㄓㄭ1ㄕㄭ5.', 'lau↓ʂɨ→ tɕjau→ wo↓mən ɕɥe↗ɕi↗ ʈʂɨ→ʂɨ.'),
    '春天来了，花儿开了。': ('ㄔㄨㄣ1ㄊㄧㄢ1/ㄌㄞ2/ㄌㄜ5, ㄏㄨㄚ1ㄦ2/ㄎㄞ1/ㄌㄜ5.', 'ʈʂʰwən→tʰjɛn→ lai↗ lɤ, xwa→ɚ↗ kʰai→ lɤ.'),
    '什么时候出发？': ('ㄕㄣ2ㄇㄜ5/ㄕㄭ2ㄏㄡ5/ㄔㄨ1ㄈㄚ1?', 'ʂən↗mɤ ʂɨ↗xou ʈʂʰu→fa→?'),
    '效率提高了很多。': ('ㄒㄧㄠ4ㄌㄩ4/ㄊㄧ2ㄍㄠ1/ㄌㄜ5/ㄏㄣ3ㄉㄨㄛ1.', 'ɕjau↘ly↘ tʰi↗kau→ lɤ xən↓two→.'),
    '绿色的旅行更环保。': ('ㄌㄩ4ㄙㄜ4/ㄉㄜ5/ㄌㄩ3ㄒㄧㄥ2/ㄍㄥ4/ㄏㄨㄢ2ㄅㄠ3.', 'ly↘sɤ↘ tɤ ly↓ɕiŋ↗ kəŋ↘ xwan↗pau↓.'),
    '北京是中国的首都。': ('ㄅㄟ3ㄐㄧㄥ1/ㄕㄭ4/ㄓㄨㄥ1ㄍㄨㄛ2/ㄉㄜ5/ㄕㄡ3ㄉㄨ1.', 'pei↓tɕiŋ→ ʂɨ↘ ʈʂʊŋ→kwo↗ tɤ ʂou↓tu→.'),
    '熊猫喜欢吃竹子。': ('ㄒㄩㄥ2ㄇㄠ1/ㄒㄧ3ㄏㄨㄢ5/ㄔㄭ1/ㄓㄨ2ㄗㄭ5.', 'ɕjʊŋ↗mau→ ɕi↓xwan ʈʂʰɨ→ ʈʂu↗tsɨ.'),
    '考虑一下再决定。': ('ㄎㄠ3ㄌㄩ4ㄧ2ㄒㄧㄚ4/ㄗㄞ4/ㄐㄩㄝ2ㄉㄧㄥ4.', 'kʰau↓ly↘i↗ɕja↘ tsai↘ tɕɥe↗tiŋ↘.'),
}


def test_golden_g2p():
    en = EnglishG2P()
    g = ChineseG2P(en_callable=en.text_to_ipa)
    for text, (zhuyin, ipa) in GOLDEN.items():
        assert g.text_to_phonemes(text) == zhuyin, text
        assert g.convert_to_ipa(zhuyin) == ipa, text
