# -*- coding: utf-8 -*-
"""British English mode (reference EnglishG2P(british=True), gb lexicons +
GB stem-rule branches, english_g2p.py:41,146-170,307,332,335,358).

We derive GB from the authored US lexicon via the accent transform in
frontend/g2p/en_gb.py; these tests pin the transform's lexical sets
(BATH/PALM/CLOTH), the non-rhotic rules, the GB inflection vowels, and the
exception table."""
import pytest

from illufly_tts_tpu.frontend.g2p.en_g2p import EnglishG2P
from illufly_tts_tpu.frontend.g2p.en_gb import us_to_gb
from illufly_tts_tpu.model.vocab import VOCAB


@pytest.fixture(scope="module")
def gb():
    return EnglishG2P(british=True)


@pytest.fixture(scope="module")
def us():
    return EnglishG2P()


WORD_CASES = [
    # non-rhotic coda r with compensatory length / centring diphthongs
    ("car", "kˈɑː"),
    ("nurse", "nˈɜːs"),
    ("bird", "bˈɜːd"),
    ("here", "hˈɪə"),
    ("there", "ðˈɛə"),
    ("sure", "ʃˈʊə"),
    ("force", "fˈɔːs"),
    ("fire", "fˈaɪə"),
    ("water", "wˈɔːtə"),
    ("letter", "lˈɛtə"),
    ("computer", "kəmpjˈuːtə"),
    # LOT un-merger
    ("hot", "hˈɒt"),
    ("stop", "stˈɒp"),
    # PALM keeps length
    ("father", "fˈɑːðə"),
    ("palm", "pˈɑːm"),
    ("calm", "kˈɑːm"),
    # TRAP -> a, BATH -> ɑː
    ("cat", "kˈat"),
    ("bath", "bˈɑːθ"),
    ("dance", "dˈɑːns"),
    ("class", "klˈɑːs"),
    ("asked", "ˈɑːskt"),
    ("dancing", "dˈɑːnsɪŋ"),     # e-drop inflection still hits the BATH set
    ("glasses", "ɡlˈɑːsɪz"),
    # CLOTH stays short before ŋ/f/s; THOUGHT lengthens
    ("long", "lˈɒŋ"),
    ("off", "ˈɒf"),
    ("cross", "kɹˈɒs"),
    ("thought", "θˈɔːt"),
    # GOAT
    ("go", "ɡˌəʊ"),
    # FLEECE/GOOSE length vs weak happY final
    ("see", "sˈiː"),
    ("happy", "hˈapi"),
    # GB inflection vowel is ɪ
    ("roses", "ɹˈəʊzɪz"),
    ("waited", "wˈeɪtɪd"),
    # exception table (not derivable from the US entry)
    ("schedule", "ʃˈɛdjuːl"),
    ("tomato", "təmˈɑːtəʊ"),
    ("herb", "hˈɜːb"),
    ("clerk", "klˈɑːk"),
    ("garage", "ɡˈaɹɑːʒ"),
    ("privacy", "pɹˈɪvəsi"),
    ("mobile", "mˈəʊbaɪl"),
    ("vase", "vˈɑːz"),
]


@pytest.mark.parametrize("word,expected", WORD_CASES)
def test_gb_words(gb, word, expected):
    assert gb.word_to_ipa(word) == expected


def test_us_mode_unchanged(us):
    # the default accent is untouched by the GB layer
    assert us.word_to_ipa("car") == "kˈɑɹ"
    assert us.word_to_ipa("hot") == "hˈɑt"
    assert us.word_to_ipa("dance") == "dˈæns"
    assert us.word_to_ipa("schedule") == "skˈɛdʒul"


def test_linking_r_survives(gb):
    # morpheme-internal prevocalic r keeps its ɹ ("answering")
    assert "ɹɪŋ" in gb.word_to_ipa("answering")
    # but coda r in the same stem drops ("answer")
    assert gb.word_to_ipa("answer").endswith("ə")


def test_bath_only_last_ae(gb):
    # the weak prefix of a BATH word keeps its TRAP/weak vowel
    ipa = gb.word_to_ipa("advantage")
    assert "ɑːnt" in ipa and not ipa.startswith("ɑːd")


def test_gb_letter_z(gb, us):
    assert gb.word_to_ipa("z") == "zˈɛd"
    assert us.word_to_ipa("z") == "zˈi"
    # acronym spelling uses zed too
    assert gb.spell_letters("EZ").endswith("zˈɛd")


def test_gb_sentence_reverse_walk(gb):
    # the two-phase walk still works: "the" before vowel, BATH, r-drop
    out = gb.text_to_ipa("The doctor asked her to record the answer.")
    assert "dˈɒktə" in out
    assert "ɑːskt" in out
    assert "ɹɪkˈɔːd" in out          # verb reading, GB non-rhotic
    assert "hɜː" in out              # her -> strong-form hɜː


def test_gb_heteronyms_still_resolve(gb):
    noun = gb.text_to_ipa("He set a new record.")
    verb = gb.text_to_ipa("They record a song.")
    assert "ɹˈɛkɔːd" in noun or "ɹˈɛkəd" in noun
    assert "ɹɪkˈɔːd" in verb


def test_us_to_gb_idempotent_on_gb():
    # re-applying the transform to GB output must not corrupt it
    for gb_ipa in ("kɑː", "nɜːs", "ɹəʊzɪz", "dɑːnsɪŋ", "hɪə", "θɔːt"):
        assert us_to_gb(gb_ipa) == gb_ipa


def test_gb_output_in_model_vocab(gb):
    # every char the GB mode emits must encode (ɒ etc. are vocab entries)
    text = ("The quick brown fox jumps over the lazy dog while dancing "
            "after a bath near the garage on Thursday.")
    for ch in gb.text_to_ipa(text):
        if ch == " ":
            continue
        assert ch in VOCAB, f"GB phoneme char {ch!r} missing from VOCAB"


def test_gb_oov_lts_accented(gb, us):
    # OOV words run LTS then the accent transform (no rhotic leakage)
    ipa = gb.word_to_ipa("blorpferd")
    assert "ɚ" not in ipa and "ɝ" not in ipa and "æ" not in ipa
    assert ipa != us.word_to_ipa("blorpferd")


def test_pipeline_flag_plumbs_through():
    # pipeline-level surface parity: TTSPipeline(british=True)
    from illufly_tts_tpu.pipeline import TTSPipeline

    pipe = TTSPipeline.__new__(TTSPipeline)
    pipe._init_frontend_only()
    assert pipe.british is False
    g = EnglishG2P(british=True)
    assert g.british is True
