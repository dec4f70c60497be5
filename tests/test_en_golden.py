# -*- coding: utf-8 -*-
"""English G2P golden battery (VERDICT r1 next-#5): lexicon pronunciations,
stress marks on lexicon AND letter-to-sound output, morphology, acronyms,
heteronyms, and sentence-level behavior."""
import re

import pytest

from illufly_tts_tpu.frontend.g2p.en_g2p import (
    PRIMARY_STRESS,
    SECONDARY_STRESS,
    EnglishG2P,
    apply_stress,
)
from illufly_tts_tpu.frontend.g2p.en_lexicon import LEXICON


@pytest.fixture(scope="module")
def g2p():
    return EnglishG2P()


# ~170 golden word pronunciations spanning the lexicon's sections
GOLDEN_WORDS = {
    # function/core
    "about": "əbˈaʊt", "between": "bɪtwˈin", "through": "θɹˈu",
    "computer": "kəmpjˈutɚ", "question": "kwˈɛstʃən",
    # verbs
    "accept": "əksˈɛpt", "achieve": "ətʃˈiv", "arrange": "ɚˈeɪndʒ",
    "believe": "bɪlˈiv", "choose": "tʃˈuz", "chose": "tʃˈoʊz",
    "decide": "dɪsˈaɪd", "describe": "dɪskɹˈaɪb", "develop": "dɪvˈɛləp",
    "discuss": "dɪskˈʌs", "encourage": "ɛnkˈɝɪdʒ", "explain": "ɛksplˈeɪn",
    "forget": "fɚɡˈɛt", "forgotten": "fɚɡˈɑtən", "imagine": "ɪmˈædʒən",
    "improve": "ɪmpɹˈuv", "introduce": "ɪntɹədˈus", "realize": "ɹˈiəlaɪz",
    "receive": "ɹɪsˈiv", "recognize": "ɹˈɛkəɡnaɪz", "remember": "ɹɪmˈɛmbɚ",
    "suggest": "səɡdʒˈɛst", "understand": "ʌndɚstˈænd",
    "thrown": "θɹˈoʊn", "caught": "kˈɔt", "bought": "bˈɔt",
    "brought": "bɹˈɔt", "thought": "θˈɔt", "fought": "fˈɔt",
    # nouns
    "ability": "əbˈɪləti", "advantage": "ədvˈæntɪdʒ",
    "atmosphere": "ˈætməsfɪɹ", "audience": "ˈɔdiəns",
    "authority": "əθˈɔɹəti", "behavior": "bɪhˈeɪvjɚ",
    "century": "sˈɛntʃɚɹi", "character": "kˈɛɹɪktɚ",
    "circumstance": "sˈɝkəmstˌæns", "committee": "kəmˈɪti",
    "community": "kəmjˈunəti", "conclusion": "kənklˈuʒən",
    "consequence": "kˈɑnsəkwˌɛns", "conversation": "kɑnvɚsˈeɪʃən",
    "democracy": "dəmˈɑkɹəsi", "department": "dɪpˈɑɹtmənt",
    "environment": "ɛnvˈaɪɹənmənt", "equipment": "ɪkwˈɪpmənt",
    "evidence": "ˈɛvədəns", "experience": "ɛkspˈɪɹiəns",
    "government": "ɡˈʌvɚnmənt", "hospital": "hˈɑspɪtəl",
    "individual": "ɪndəvˈɪdʒuəl", "industry": "ˈɪndəstɹi",
    "knowledge": "nˈɑlɪdʒ", "language": "lˈæŋɡwɪdʒ",
    "literature": "lˈɪtɚətʃɚ", "machine": "məʃˈin",
    "majority": "mədʒˈɑɹəti", "material": "mətˈɪɹiəl",
    "medicine": "mˈɛdəsən", "museum": "mjuzˈiəm",
    "opportunity": "ɑpɚtˈunəti", "organization": "ɔɹɡənəzˈeɪʃən",
    "philosophy": "fəlˈɑsəfi", "population": "pɑpjəlˈeɪʃən",
    "president": "pɹˈɛzədənt", "psychology": "saɪkˈɑlədʒi",
    "relationship": "ɹɪlˈeɪʃənʃɪp", "responsibility": "ɹɪspɑnsəbˈɪləti",
    "restaurant": "ɹˈɛstɚɹɑnt", "situation": "sɪtʃuˈeɪʃən",
    "society": "səsˈaɪəti", "technology": "tɛknˈɑlədʒi",
    "temperature": "tˈɛmpɹətʃɚ", "university": "junəvˈɝsəti",
    # adjectives/adverbs
    "absolutely": "æbsəlˈutli", "appropriate": "əpɹˈoʊpɹiət",
    "available": "əvˈeɪləbəl", "beautiful": "bjˈutəfəl",
    "comfortable": "kˈʌmfɚtəbəl", "dangerous": "dˈeɪndʒɚɹəs",
    "definitely": "dˈɛfənətli", "delicious": "dɪlˈɪʃəs",
    "different": "dˈɪfɹənt", "difficult": "dˈɪfəkəlt",
    "efficient": "ɪfˈɪʃənt", "enormous": "ɪnˈɔɹməs",
    "essential": "ɪsˈɛnʃəl", "excellent": "ˈɛksələnt",
    "expensive": "ɛkspˈɛnsɪv", "extraordinary": "ɛkstɹˈɔɹdənɛɹi",
    "familiar": "fəmˈɪljɚ", "immediately": "ɪmˈidiətli",
    "important": "ɪmpˈɔɹtənt", "impossible": "ɪmpˈɑsəbəl",
    "incredible": "ɪnkɹˈɛdəbəl", "independent": "ɪndɪpˈɛndənt",
    "interesting": "ˈɪntɹəstɪŋ", "necessary": "nˈɛsəsˌɛɹi",
    "particular": "pɚtˈɪkjəlɚ", "probably": "pɹˈɑbəbli",
    "ridiculous": "ɹɪdˈɪkjələs", "significant": "sɪɡnˈɪfɪkənt",
    "sophisticated": "səfˈɪstəkeɪtəd", "unfortunately": "ʌnfˈɔɹtʃənətli",
    # tech/places/science
    "algorithm": "ˈælɡɚˌɪðəm", "bandwidth": "bˈændwɪdθ",
    "software": "sˈɔftwˌɛɹ", "hardware": "hˈɑɹdwˌɛɹ",
    "internet": "ˈɪntɚnˌɛt", "keyboard": "kˈibˌɔɹd",
    "australia": "ɔstɹˈeɪljə", "beijing": "beɪdʒˈɪŋ",
    "california": "kæləfˈɔɹnjə", "chicago": "ʃəkˈɑɡoʊ",
    "germany": "dʒˈɝməni", "japanese": "dʒæpənˈiz",
    "shanghai": "ʃæŋhˈaɪ", "washington": "wˈɔʃɪŋtən",
    "bacteria": "bæktˈɪɹiə", "chemistry": "kˈɛmɪstɹi",
    "hypothesis": "haɪpˈɑθəsəs", "molecule": "mˈɑləkjˌul",
    "quantum": "kwˈɑntəm", "telescope": "tˈɛləskˌoʊp",
    # irregular spellings
    "colonel": None, "yacht": None,  # absent is fine; LTS must not crash
    "knight": "nˈaɪt", "wednesday": "wˈɛnzdeɪ", "receipt": None,
    "island": "ˈaɪlənd", "debt": "dˈɛt", "tongue": "tˈʌŋ",
    "rhythm": "ɹˈɪðəm", "muscle": "mˈʌsəl",
}

# derived-form goldens (from en_derived.tsv)
GOLDEN_DERIVED = {
    "accepts": "əksˈɛpts", "achieved": "ətʃˈivd",
    "describing": "dɪskɹˈaɪbɪŋ", "improved": "ɪmpɹˈuvd",
    "watches": "wˈɑtʃəz", "cities": "sˈɪtiz", "carries": "kˈæɹiz",
    "planning": "plˈænɪŋ", "davs_absent": None,
    "quietly": "kwˈaɪətli", "brightness": "bɹˈaɪtnəs",
}


def test_golden_words(g2p):
    failures = []
    for word, expected in GOLDEN_WORDS.items():
        got = g2p.word_to_ipa(word)
        if expected is None:
            if not got:
                failures.append((word, "<empty>", "non-empty"))
            continue
        if got != expected:
            failures.append((word, got, expected))
    assert not failures, failures


def test_golden_derived(g2p):
    failures = []
    for word, expected in GOLDEN_DERIVED.items():
        if expected is None:
            continue
        got = g2p.word_to_ipa(word)
        if got != expected:
            failures.append((word, got, expected))
    assert not failures, failures


def test_lexicon_size_and_stress_coverage():
    """>=10k entries; polysyllabic entries carry stress marks."""
    assert len(LEXICON) >= 10000, len(LEXICON)
    vowel_re = re.compile(r"[aeiouæɑɔəɚɛɝɪʊʌ]+")  # vowel runs = syllables
    missing = []
    for word, ipa in LEXICON.items():
        syllables = len(vowel_re.findall(ipa))
        if syllables >= 3 and not any(s in ipa for s in "ˈˌ"):
            missing.append(word)
    # allow a small tail of unstressed long function words
    assert len(missing) < len(LEXICON) * 0.01, missing[:20]


def test_oov_lts_carries_stress(g2p):
    """LTS output is stress-marked like lexicon output (r1 weak #3)."""
    for word in ("flembork", "zorpingle", "brastification", "quemble",
                 "vortelizer", "sneldrip"):
        ipa = g2p.word_to_ipa(word)
        assert PRIMARY_STRESS in ipa, (word, ipa)


def test_oov_suffix_stress(g2p):
    # -tion attracts stress to the preceding vowel
    ipa = g2p.word_to_ipa("blorbation")
    i_stress = ipa.index(PRIMARY_STRESS)
    assert "ʃən" in ipa and i_stress > 0, ipa


def test_acronyms_nnp_stress(g2p):
    assert g2p.word_to_ipa("USA") == "jˌuˌɛsˈeɪ"
    assert g2p.word_to_ipa("GPU") == "dʒˌipˌijˈu"
    ipa = g2p.word_to_ipa("NASA")  # not all-consonant: spelled anyway
    assert ipa.count(SECONDARY_STRESS) >= 1


def test_heteronym_context(g2p):
    assert "ɹˈɛkɚd" in g2p.text_to_ipa("the record")
    assert "ɹɪkˈɔɹd" in g2p.text_to_ipa("to record")
    assert "pɹˈɛzənt" in g2p.text_to_ipa("a present")
    assert "pɹɪzˈɛnt" in g2p.text_to_ipa("to present")
    # "read" is tense-ambiguous: past/participle contexts force ɹɛd
    assert "ɹˈɛd" in g2p.text_to_ipa("I have read the book")
    assert "ɹˈid" in g2p.text_to_ipa("please read this")
    # subject-aux inversion: the auxiliary sits two words back
    assert "ɹˈɛd" in g2p.text_to_ipa("Have you read it")
    assert "ɹˈɛd" in g2p.text_to_ipa("Has she read the report")


def test_apply_stress_algebra():
    # reference english_g2p.py:61-88 semantics
    assert apply_stress("kˈæt", -2) == "kæt"
    assert apply_stress("kˈæt", -1) == "kˌæt"
    assert apply_stress("kˈæt", 0) == "kˌæt"      # demote primary
    assert apply_stress("kæt", 0.5) == "kˌæt"     # add secondary
    assert apply_stress("kˌæt", 1) == "kˈæt"      # promote
    assert apply_stress("kæt", 2) == "kˈæt"       # add primary
    assert apply_stress("st", 2) == "st"          # no vowel: unchanged
    assert apply_stress("kæt", None) == "kæt"


SENTENCES = [
    ("The quick brown fox jumps over the lazy dog",
     ["kwˈɪk", "bɹˈaʊn", "fˈɑks", "dʒˈʌmps", "lˈeɪzi", "dˈɔɡ"]),
    ("She sells sea shells by the sea shore",
     ["sˈɛlz", "sˈi", "ʃˈɛlz", "ʃˈɔɹ"]),
    ("I would like to schedule an appointment",
     ["ʃɛdʒ", "əpˈɔɪntmənt"]),
    ("The university library opens at nine",
     ["junəvˈɝsəti", "lˈaɪbɹˌɛɹi"]),
    ("Artificial intelligence is changing the world",
     ["ɑɹtəfˈɪʃəl", "ɪntˈɛlədʒəns"]),
    ("Please download the software update",
     ["dˈaʊnloʊd", "sˈɔftwˌɛɹ", "ˈʌpdeɪt"]),
]


def test_sentences(g2p):
    for text, fragments in SENTENCES:
        ipa = g2p.text_to_ipa(text)
        for frag in fragments:
            if frag == "ʃɛdʒ":  # schedule: either reading acceptable
                assert "skˈɛdʒ" in ipa or "ʃɛdʒ" in ipa, (text, ipa)
            else:
                assert frag in ipa, (text, frag, ipa)


def test_the_before_vowel(g2p):
    assert g2p.text_to_ipa("the apple").startswith("ði")
    assert g2p.text_to_ipa("the book").startswith("ðə")


def test_misaki_json_loader(tmp_path):
    import json

    from illufly_tts_tpu.frontend.g2p.custom_dict import load_en_dict

    path = tmp_path / "gold.json"
    json.dump({
        "zyzzyvum": "zˈɪzɪvəm",
        "Blorptown": {"DEFAULT": "blˈɔɹptaʊn", "NOUN": None},
        "skipme": {"DEFAULT": None},
    }, open(path, "w"))
    added = load_en_dict(str(path))
    assert added["zyzzyvum"] == "zˈɪzɪvəm"
    assert added["blorptown"] == "blˈɔɹptaʊn"
    assert "skipme" not in added
    g = EnglishG2P()
    assert g.word_to_ipa("zyzzyvum") == "zˈɪzɪvəm"
