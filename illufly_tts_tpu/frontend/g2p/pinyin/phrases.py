# -*- coding: utf-8 -*-
"""Polyphone disambiguation: explicit per-char defaults + word-level overrides.

Plays the role of pypinyin's phrase dictionaries + the reference's custom
``phrases_dict`` (reference: src/illufly_tts/core/g2p/zh_frontend.py:48-65).
Authored independently; word-level readings follow standard Mandarin.
"""

# Chars whose most common reading differs from the first table entry.
DEFAULTS = {
    "行": "xing2",
    "更": "geng4",
    "校": "xiao4",
    "觉": "jue2",
    "着": "zhe5",
    "为": "wei2",
    "重": "zhong4",
    "间": "jian1",
    "只": "zhi3",
    "发": "fa1",
    "没": "mei2",
    "要": "yao4",
    "大": "da4",
    "从": "cong2",
    "子": "zi3",
    "还": "hai2",
    "早": "zao3",
    "都": "dou1",
    "累": "lei4",
    "散": "san4",
    "扫": "sao3",
    "等": "deng3",
    "们": "men5",
    "作": "zuo4",
    "和": "he2",
    "呢": "ne5",
    "吗": "ma5",
    "吧": "ba5",
    "啊": "a5",
    "呀": "ya5",
    "嘛": "ma5",
    "哪": "na3",
    "那": "na4",
    "这": "zhe4",
    "谁": "shei2",
    "什": "shen2",
    "率": "lv4",
}

# Word-level pinyin overrides (word -> space-separated readings).
_PHRASES_RAW = """
银行 yin2 hang2
行业 hang2 ye4
行长 hang2 zhang3
支行 zhi1 hang2
分行 fen1 hang2
开户行 kai1 hu4 hang2
发卡行 fa4 ka3 hang2
同行 tong2 hang2
外行 wai4 hang2
内行 nei4 hang2
行列 hang2 lie4
行情 hang2 qing2
行家 hang2 jia1
一行 yi1 hang2
更换 geng1 huan4
更新 geng1 xin1
更改 geng1 gai3
更正 geng1 zheng4
更衣 geng1 yi1
三更 san1 geng1
更替 geng1 ti4
校对 jiao4 dui4
校准 jiao4 zhun3
校验 jiao4 yan4
睡觉 shui4 jiao4
午觉 wu3 jiao4
着急 zhao2 ji2
着凉 zhao2 liang2
着火 zhao2 huo3
着迷 zhao2 mi2
着手 zhuo2 shou3
着重 zhuo2 zhong4
着装 zhuo2 zhuang1
沉着 chen2 zhuo2
执着 zhi2 zhuo2
穿着 chuan1 zhuo2
为了 wei4 le5
因为 yin1 wei4
为什么 wei4 shen2 me5
为何 wei4 he2
为此 wei4 ci3
重复 chong2 fu4
重新 chong2 xin1
重庆 chong2 qing4
重叠 chong2 die2
重申 chong2 shen1
重组 chong2 zu3
重阳 chong2 yang2
还给 huan2 gei3
归还 gui1 huan2
偿还 chang2 huan2
还款 huan2 kuan3
还债 huan2 zhai4
借还款 jie4 huan2 kuan3
首都 shou3 du1
都市 du1 shi4
都城 du1 cheng2
成都 cheng2 du1
会计 kuai4 ji4
头发 tou2 fa4
理发 li3 fa4
发型 fa4 xing2
少年 shao4 nian2
少女 shao4 nv3
少爷 shao4 ye5
青少年 qing1 shao4 nian2
中奖 zhong4 jiang3
中毒 zhong4 du2
击中 ji1 zhong4
命中 ming4 zhong4
便宜 pian2 yi5
教书 jiao1 shu1
教给 jiao1 gei3
音乐 yin1 yue4
乐器 yue4 qi4
乐曲 yue4 qu3
声乐 sheng1 yue4
乐谱 yue4 pu3
长大 zhang3 da4
成长 cheng2 zhang3
生长 sheng1 zhang3
增长 zeng1 zhang3
长辈 zhang3 bei4
校长 xiao4 zhang3
市长 shi4 zhang3
部长 bu4 zhang3
队长 dui4 zhang3
班长 ban1 zhang3
家长 jia1 zhang3
董事长 dong3 shi4 zhang3
组长 zu3 zhang3
会长 hui4 zhang3
局长 ju2 zhang3
厂长 chang3 zhang3
县长 xian4 zhang3
处长 chu4 zhang3
科长 ke1 zhang3
站长 zhan4 zhang3
船长 chuan2 zhang3
首长 shou3 zhang3
兄长 xiong1 zhang3
年长 nian2 zhang3
长相 zhang3 xiang4
长进 zhang3 jin4
了解 liao3 jie3
了不起 liao3 bu5 qi3
受不了 shou4 bu4 liao3
忘不了 wang4 bu4 liao3
地方 di4 fang5
地球 di4 qiu2
地区 di4 qu1
土地 tu3 di4
地址 di4 zhi3
地面 di4 mian4
地位 di4 wei4
地图 di4 tu2
地铁 di4 tie3
大地 da4 di4
地点 di4 dian3
地带 di4 dai4
地震 di4 zhen4
各地 ge4 di4
地理 di4 li3
地下 di4 xia4
地上 di4 shang4
地毯 di4 tan3
内地 nei4 di4
当地 dang1 di4
基地 ji1 di4
场地 chang3 di4
阵地 zhen4 di4
天地 tian1 di4
地狱 di4 yu4
目的 mu4 di4
的确 di2 que4
处理 chu3 li3
处于 chu3 yu2
相处 xiang1 chu3
处境 chu3 jing4
处罚 chu3 fa2
处分 chu3 fen4
种植 zhong4 zhi2
种地 zhong4 di4
种田 zhong4 tian2
栽种 zai1 zhong4
接种 jie1 zhong4
投降 tou2 xiang2
降伏 xiang2 fu2
反应 fan3 ying4
应用 ying4 yong4
应付 ying4 fu4
适应 shi4 ying4
回应 hui2 ying4
供应 gong1 ying4
应对 ying4 dui4
应聘 ying4 pin4
照相 zhao4 xiang4
相片 xiang4 pian4
相机 xiang4 ji1
首相 shou3 xiang4
相貌 xiang4 mao4
真相 zhen1 xiang4
测量 ce4 liang2
量身 liang2 shen1
商量 shang1 liang5
量体温 liang2 ti3 wen1
上当 shang4 dang4
当作 dang4 zuo4
当天 dang4 tian1
当年 dang1 nian2
有空 you3 kong4
空儿 kong4 er2
空闲 kong4 xian2
填空 tian2 kong4
调整 tiao2 zheng3
调节 tiao2 jie2
调皮 tiao2 pi2
空调 kong1 tiao2
调料 tiao2 liao4
协调 xie2 tiao2
调和 tiao2 he2
调解 tiao2 jie3
调动 diao4 dong4
一只 yi1 zhi1
只身 zhi1 shen1
船只 chuan2 zhi1
干部 gan4 bu4
能干 neng2 gan4
干活 gan4 huo2
干劲 gan4 jin4
骨干 gu3 gan4
干事 gan4 shi4
树干 shu4 gan4
灾难 zai1 nan4
苦难 ku3 nan4
难民 nan4 min2
遇难 yu4 nan4
勉强 mian3 qiang3
倔强 jue2 jiang4
奇数 ji1 shu4
一切 yi1 qie4
亲切 qin1 qie4
密切 mi4 qie4
确切 que4 qie4
迫切 po4 qie4
切实 qie4 shi2
似的 shi4 de5
提防 di1 fang5
子弹 zi3 dan4
炸弹 zha4 dan4
导弹 dao3 dan4
弹药 dan4 yao4
弹琴 tan2 qin2
弹奏 tan2 zou4
弹性 tan2 xing4
反弹 fan3 tan2
答应 da1 ying5
答理 da1 li3
差不多 cha4 bu5 duo1
差点 cha4 dian3
差劲 cha4 jin4
出差 chu1 chai1
差使 chai1 shi3
结实 jie1 shi5
结果 jie2 guo3
假期 jia4 qi1
放假 fang4 jia4
请假 qing3 jia4
暑假 shu3 jia4
寒假 han2 jia4
假日 jia4 ri4
角色 jue2 se4
主角 zhu3 jue2
配角 pei4 jue2
角逐 jue2 zhu2
数数 shu3 shu4
数不清 shu3 bu4 qing1
数一数 shu3 yi1 shu3
爱好 ai4 hao4
好奇 hao4 qi2
好学 hao4 xue2
好客 hao4 ke4
朝气 zhao1 qi4
朝霞 zhao1 xia2
朝阳 zhao1 yang2
传记 zhuan4 ji4
自传 zi4 zhuan4
传略 zhuan4 lve4
时间为 shi2 jian1 wei2
为准 wei2 zhun3
色差 se4 cha1
嗲 dia3
呗 bei5
不 bu4
咗 zuo5
嘞 lei5
掺和 chan1 huo5
暖和 nuan3 huo5
柔和 rou2 he2
附和 fu4 he4
和面 huo2 mian4
和泥 huo2 ni2
行号 hang2 hao4
茧行 jian3 hang2
放款行 fang4 kuan3 hang2
什么 shen2 me5
怎么 zen3 me5
这么 zhe4 me5
那么 na4 me5
多么 duo1 me5
系统 xi4 tong3
关系 guan1 xi4
系鞋带 ji4 xie2 dai4
东西 dong1 xi5
觉得 jue2 de5
记得 ji4 de5
值得 zhi2 de5
获得 huo4 de2
取得 qu3 de2
免得 mian3 de5
懂得 dong3 de5
显得 xian3 de5
非得 fei1 dei3
得去 dei3 qu4
薄弱 bo2 ruo4
薄膜 bo2 mo2
单薄 dan1 bo2
刻薄 ke4 bo2
尽管 jin3 guan3
尽量 jin3 liang4
尽快 jin3 kuai4
尽早 jin3 zao3
打折 da3 zhe2
折扣 zhe2 kou4
折腾 zhe1 teng5
折本 she2 ben3
奔波 ben1 bo1
投奔 tou2 ben4
模样 mu2 yang4
模具 mu2 ju4
模板 mu2 ban3
宁可 ning4 ke3
宁愿 ning4 yuan4
宁肯 ning4 ken3
安宁 an1 ning2
泥土 ni2 tu3
拘泥 ju1 ni4
漂亮 piao4 liang5
漂白 piao3 bai2
漂流 piao1 liu2
漂浮 piao1 fu2
铺盖 pu1 gai4
店铺 dian4 pu4
当铺 dang4 pu4
曲折 qu1 zhe2
歌曲 ge1 qu3
曲子 qu3 zi5
作曲 zuo4 qu3
弯曲 wan1 qu1
舍不得 she3 bu5 de5
宿舍 su4 she4
校舍 xiao4 she4
省长 sheng3 zhang3
反省 fan3 xing3
省悟 xing3 wu4
相似 xiang1 si4
缩短 suo1 duan3
挑战 tiao3 zhan4
挑衅 tiao3 xin4
挑拨 tiao3 bo1
吐血 tu4 xie3
呕吐 ou3 tu4
高兴 gao1 xing4
兴趣 xing4 qu4
兴奋 xing1 fen4
兴起 xing1 qi3
复兴 fu4 xing1
兴旺 xing1 wang4
咽喉 yan1 hou2
咽下 yan4 xia4
哽咽 geng3 ye4
呜咽 wu1 ye4
要求 yao1 qiu2
重要 zhong4 yao4
载重 zai4 zhong4
记载 ji4 zai3
刊载 kan1 zai3
登载 deng1 zai3
转载 zhuan3 zai3
三年五载 san1 nian2 wu3 zai3
占卜 zhan1 bu3
占领 zhan4 ling3
占据 zhan4 ju4
钻研 zuan1 yan2
钻石 zuan4 shi2
电钻 dian4 zuan4
称心 chen4 xin1
对称 dui4 chen4
称号 cheng1 hao4
称呼 cheng1 hu5
伺候 ci4 hou5
伺机 si4 ji1
几乎 ji1 hu1
茶几 cha2 ji1
窗明几净 chuang1 ming2 ji1 jing4
尽力 jin4 li4
尽头 jin4 tou2
埋怨 man2 yuan4
埋葬 mai2 zang4
蒙古 meng3 gu3
朴素 pu3 su4
朴实 pu3 shi2
朴刀 po1 dao1
期间 qi1 jian1
房间 fang2 jian1
中间 zhong1 jian1
间接 jian4 jie1
间隔 jian4 ge2
间谍 jian4 die2
离间 li2 jian4
散步 san4 bu4
散发 san4 fa1
分散 fen1 san4
散文 san3 wen2
松散 song1 san3
扫帚 sao4 zhou5
打扫 da3 sao3
扫地 sao3 di4
累计 lei3 ji4
积累 ji1 lei3
累积 lei3 ji1
劳累 lao2 lei4
果实累累 guo3 shi2 lei2 lei2
糊涂 hu2 tu5
糊口 hu2 kou3
糨糊 jiang4 hu4
看见 kan4 jian4
看书 kan4 shu1
看守 kan1 shou3
看护 kan1 hu4
干净 gan1 jing4
干燥 gan1 zao4
若干 ruo4 gan1
饼干 bing3 gan1
干涉 gan1 she4
主干 zhu3 gan4
正月 zheng1 yue4
正在 zheng4 zai4
长城 chang2 cheng2
长江 chang2 jiang1
外长 wai4 zhang3
得到 de2 dao4
得分 de2 fen1
所得 suo3 de2
不得不 bu4 de2 bu4
分析 fen1 xi1
分数 fen1 shu4
部分 bu4 fen4
成分 cheng2 fen4
分量 fen4 liang4
过分 guo4 fen4
身分 shen1 fen4
充分 chong1 fen4
还是 hai2 shi4
还有 hai2 you3
空气 kong1 qi4
空间 kong1 jian1
天空 tian1 kong1
空调 kong1 tiao2
会议 hui4 yi4
机会 ji1 hui4
省会 sheng3 hui4
体会 ti3 hui4
教育 jiao4 yu4
教师 jiao4 shi1
教室 jiao4 shi4
教学 jiao4 xue2
宗教 zong1 jiao4
请教 qing3 jiao4
音调 yin1 diao4
声调 sheng1 diao4
调查 diao4 cha2
强调 qiang2 diao4
格调 ge2 diao4
率领 shuai4 ling3
率先 shuai4 xian1
率队 shuai4 dui4
直率 zhi2 shuai4
坦率 tan3 shuai4
轻率 qing1 shuai4
草率 cao3 shuai4
表率 biao3 shuai4
统率 tong3 shuai4
"""

PHRASES = {}
for _line in _PHRASES_RAW.strip().splitlines():
    _parts = _line.split()
    if len(_parts) >= 2 and len(_parts[0]) == len(_parts) - 1:
        PHRASES[_parts[0]] = _parts[1:]
