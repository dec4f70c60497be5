# -*- coding: utf-8 -*-
"""Heteronym battery: every word asserted in BOTH readings via minimal
pairs (VERDICT r2 next-1 done-criterion). The reference resolves these with
spaCy POS tags + tag-keyed gold entries (english_g2p.py:253-293,716-759);
here the deterministic tagger (pos.py) + en_heteronyms.tsv must produce the
same distinctions."""
import pytest

from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P


@pytest.fixture(scope="module")
def g2p():
    return EnglishG2P()


# (word, verb-context sentence, verb IPA, noun/adj-context sentence,
#  noun/adj IPA) — 36 heteronyms, both readings each
BATTERY = [
    ("record", "to record music", "ɹɪkˈɔɹd", "the record shows", "ɹˈɛkɚd"),
    ("present", "to present the award", "pɹɪzˈɛnt", "a present for you",
     "pɹˈɛzənt"),
    ("object", "I object to that", "əbdʒˈɛkt", "the object of the game",
     "ˈɑbdʒɪkt"),
    ("subject", "to subject them to it", "səbdʒˈɛkt", "the subject of study",
     "sˈʌbdʒɪkt"),
    ("permit", "we permit smoking", "pɚmˈɪt", "a parking permit", "pˈɝmɪt"),
    ("produce", "they produce cars", "pɹədˈus", "fresh produce today",
     "pɹˈoʊdus"),
    ("contract", "muscles contract quickly", "kəntɹˈækt",
     "the contract terms", "kˈɑntɹækt"),
    ("conduct", "to conduct a survey", "kəndˈʌkt", "his conduct was poor",
     "kˈɑndʌkt"),
    ("content", "to content oneself", "kəntˈɛnt", "the content of the book",
     "kˈɑntɛnt"),
    ("live", "they live here", "lɪv", "a live concert", "laɪv"),
    ("use", "we use tools", "juz", "the use of tools", "jus"),
    ("close", "close the door", "kloʊz", "a close friend", "kloʊs"),
    ("house", "to house the refugees", "haʊz", "the house is big", "haʊs"),
    ("lead", "to lead the team", "lid", "the lead was heavy", "lɛd"),
    ("wind", "to wind the clock", "waɪnd", "the wind is cold", "wɪnd"),
    ("tear", "to tear the paper", "tɛɹ", "a tear rolled down", "tɪɹ"),
    ("wound", "to wound his pride", "waʊnd", "the wound healed", "wund"),
    ("desert", "to desert the army", "dɪzˈɝt", "the desert is dry",
     "dˈɛzɚt"),
    ("refuse", "I refuse to go", "ɹɪfjˈuz", "the refuse was collected",
     "ɹˈɛfjus"),
    ("project", "to project confidence", "pɹədʒˈɛkt", "the project deadline",
     "pɹˈɑdʒɛkt"),
    ("protest", "they protest loudly", "pɹətˈɛst", "the protest was peaceful",
     "pɹˈoʊtɛst"),
    ("rebel", "to rebel against it", "ɹɪbˈɛl", "the rebel forces", "ɹˈɛbəl"),
    ("suspect", "I suspect foul play", "səspˈɛkt", "the suspect fled",
     "sˈʌspɛkt"),
    ("convert", "to convert the file", "kənvˈɝt", "a convert to the cause",
     "kˈɑnvɝt"),
    ("convict", "to convict the accused", "kənvˈɪkt", "the convict escaped",
     "kˈɑnvɪkt"),
    ("insult", "to insult the host", "ɪnsˈʌlt", "the insult stung",
     "ˈɪnsʌlt"),
    ("conflict", "these results conflict with ours", "kənflˈɪkt",
     "the conflict ended", "kˈɑnflɪkt"),
    ("contest", "to contest the result", "kəntˈɛst", "the contest winner",
     "kˈɑntɛst"),
    ("increase", "to increase the budget", "ɪnkɹˈis", "an increase in sales",
     "ˈɪnkɹis"),
    ("decrease", "to decrease the dose", "dɪkɹˈis", "a decrease in crime",
     "dˈikɹis"),
    ("export", "they export goods", "ɛkspˈɔɹt", "the export market",
     "ˈɛkspɔɹt"),
    ("import", "we import steel", "ɪmpˈɔɹt", "an import tariff", "ˈɪmpɔɹt"),
    ("extract", "to extract the data", "ɛkstɹˈækt", "an extract from the book",
     "ˈɛkstɹækt"),
    ("progress", "to progress further", "pɹəɡɹˈɛs", "the progress report",
     "pɹˈɑɡɹɛs"),
    ("separate", "to separate the yolks", "sˈɛpɚɹˌeɪt",
     "a separate issue", "sˈɛpɹət"),
    ("estimate", "to estimate the cost", "ˈɛstəmˌeɪt",
     "an estimate of the cost", "ˈɛstəmət"),
    ("graduate", "to graduate this year", "ɡɹˈædʒuˌeɪt",
     "a graduate student", "ɡɹˈædʒuət"),
    ("delegate", "to delegate the work", "dˈɛləɡˌeɪt",
     "the delegate voted", "dˈɛləɡət"),
    ("address", "to address the crowd", "ədɹˈɛs", "my address is here",
     "ˈædɹɛs"),
    ("contrast", "to contrast the two", "kəntɹˈæst", "the contrast is stark",
     "kˈɑntɹæst"),
    ("impact", "to impact the market", "ɪmpˈækt", "the impact was huge",
     "ˈɪmpækt"),
    ("update", "to update the software", "ʌpdˈeɪt", "the update failed",
     "ˈʌpdeɪt"),
    ("transfer", "to transfer the funds", "tɹænsfˈɝ", "the transfer cleared",
     "tɹˈænsfɝ"),
    ("survey", "to survey the land", "sɚvˈeɪ", "the survey results",
     "sˈɝveɪ"),
    ("discount", "to discount the rumor", "dɪskˈaʊnt", "a discount price",
     "dˈɪskaʊnt"),
]


@pytest.mark.parametrize(
    "word,verb_sent,verb_ipa,noun_sent,noun_ipa",
    BATTERY, ids=[b[0] for b in BATTERY],
)
def test_both_readings(g2p, word, verb_sent, verb_ipa, noun_sent, noun_ipa):
    verb_out = g2p.text_to_ipa(verb_sent)
    noun_out = g2p.text_to_ipa(noun_sent)
    assert verb_ipa in verb_out, (verb_sent, verb_out)
    assert noun_ipa in noun_out, (noun_sent, noun_out)
    # and the two renderings actually differ
    assert verb_ipa != noun_ipa


def test_battery_size():
    assert len(BATTERY) >= 30
    assert len({b[0] for b in BATTERY}) == len(BATTERY)


def test_morphology_carries_readings(g2p):
    # inflected heteronyms keep the tag-resolved stem
    assert "ɹɪkˈɔɹdz" in g2p.text_to_ipa("he records music")
    assert "ɹˈɛkɚdz" in g2p.text_to_ipa("the records show")
    assert "ɹɪkˈɔɹdəd" in g2p.text_to_ipa("it was recorded")
    assert "ɹɪkˈɔɹdɪŋ" in g2p.text_to_ipa("they are recording")
    assert "haʊzd" in g2p.text_to_ipa("it housed the museum")


def test_read_tense(g2p):
    assert "ɹˈɛd" in g2p.text_to_ipa("I have read the book")
    assert "ɹˈid" in g2p.text_to_ipa("please read this book")
    assert "ɹˈɛd" in g2p.text_to_ipa("Have you read it")
    assert "ɹˈid" in g2p.text_to_ipa("I read books every day")


def test_used_to(g2p):
    # habitual "used to" and adjectival "used" devoice to /just/; the
    # transitive past keeps /juzd/ (documented divergence from the
    # reference's inverted branch, english_g2p.py:247-250)
    assert "just tə" in g2p.text_to_ipa("I used to live there")
    assert "just" in g2p.text_to_ipa("a used car")
    assert "juzd" in g2p.text_to_ipa("he used a hammer")


def test_context_function_words(g2p):
    # reverse-walk future_vowel: the/to renderings depend on what follows
    assert g2p.text_to_ipa("the apple").startswith("ði")
    assert g2p.text_to_ipa("the book").startswith("ðə")
    assert "tə ɹɪkˈɔɹd" in g2p.text_to_ipa("to record")
    assert "tʊ ˈoʊpən" in g2p.text_to_ipa("to open")


def test_markdown_link_features(g2p):
    # [word](/ipa/) literal phonemes (reference english_g2p.py:653-688)
    assert "kˈoʊkɚɹoʊ" in g2p.text_to_ipa("[Kokoro](/kˈoʊkɚɹoʊ/) model")
    # [word](-1) stress demotion
    out = g2p.text_to_ipa("[president](-1) said")
    assert "ˌ" in out and "pɹ" in out
    # [word](#alias#) pronounce-as
    assert "dˈɑktɚ" in g2p.text_to_ipa("[Dr](#doctor#) Smith")


def test_markdown_link_multiword(g2p):
    # a multi-word link with literal phonemes is spoken ONCE, not once
    # per word (regression: the feature used to attach to every word)
    out = g2p.text_to_ipa("[New York](/nuˌjˈɔɹk/) city")
    assert out.count("nuˌjˈɔɹk") == 1
    assert "nuˌjˈɔɹknuˌjˈɔɹk" not in out
    # same for aliases
    out = g2p.text_to_ipa("[the big apple](#manhattan#) tour")
    assert out.count(g2p.word_to_ipa("manhattan")) == 1
    # per-word stress features keep word boundaries (no run-together)
    out = g2p.text_to_ipa("[big apple](-1) pie")
    assert " " in out.strip()
