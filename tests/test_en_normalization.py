# -*- coding: utf-8 -*-
"""Behavioral contract for English text normalization
(mirrors reference tests/normalization/test_pipeline.py English cases)."""
from illufly_tts_tpu.frontend.normalization.en import EnTextNormalizer
from illufly_tts_tpu.frontend.normalization.en.num import (
    num_to_words,
    verbalize_number,
    verbalize_ordinal,
)
from illufly_tts_tpu.frontend.normalization.en.chronology import verbalize_year


def norm(text: str) -> str:
    return EnTextNormalizer().normalize(text)


class TestNum:
    def test_cardinals(self):
        assert verbalize_number(0) == "zero"
        assert verbalize_number(13) == "thirteen"
        assert verbalize_number(42) == "forty two"
        assert verbalize_number(100) == "one hundred"
        assert verbalize_number(999) == "nine hundred ninety nine"
        assert verbalize_number(1234) == "one thousand two hundred thirty four"
        assert verbalize_number(1000000) == "one million"

    def test_ordinals(self):
        assert verbalize_ordinal(1) == "first"
        assert verbalize_ordinal(2) == "second"
        assert verbalize_ordinal(3) == "third"
        assert verbalize_ordinal(10) == "tenth"
        assert verbalize_ordinal(15) == "fifteenth"
        assert verbalize_ordinal(20) == "twentieth"
        assert verbalize_ordinal(21) == "twenty first"
        assert verbalize_ordinal(31) == "thirty first"

    def test_decimal(self):
        assert num_to_words("85.5") == "eighty five point five"
        assert num_to_words("1299.99") == (
            "one thousand two hundred ninety nine point nine nine"
        )

    def test_years(self):
        assert verbalize_year(2023) == "twenty twenty three"
        assert verbalize_year(1368) == "thirteen sixty eight"
        assert verbalize_year(1644) == "sixteen forty four"
        assert verbalize_year(1900) == "nineteen hundred"
        assert verbalize_year(2005) == "two thousand five"


class TestEnNormalizer:
    def test_date(self):
        result = norm("Today is May 10th, 2023.").lower()
        assert "may" in result
        assert "tenth" in result
        assert "twenty twenty three" in result

    def test_time_am(self):
        result = norm("The meeting is scheduled for 10:30 AM on June 1st, 2023.")
        low = result.lower()
        assert "ten thirty" in low
        assert "in the morning" in low
        assert "june" in low
        assert "first" in low
        assert "twenty twenty three" in low

    def test_currency(self):
        result = norm("This product was originally $1299.99, now reduced to $999.")
        low = result.lower()
        assert "dollar" in low
        assert "one thousand two hundred ninety nine" in low
        assert "nine hundred ninety nine" in low

    def test_percent(self):
        result = norm("The pass rate is 85.5%, which is 3.2% higher.")
        low = result.lower()
        assert "eighty five point five percent" in low
        assert "three point two percent" in low

    def test_fraction(self):
        result = norm("about 2/3 of them are girls").lower()
        assert "two thirds" in result
        assert "one half" in norm("1/2 cup").lower()

    def test_year_range(self):
        result = norm("The Ming Dynasty ruled China from 1368-1644.").lower()
        assert "thirteen sixty eight" in result
        assert "sixteen forty four" in result

    def test_phone(self):
        result = norm("Call +1-800-123-4567 or (123) 456-7890.").lower()
        assert "one" in result
        assert "eight" in result
        assert "four" in result

    def test_url_email_protection(self):
        result = norm("Please visit www.example.com or contact info@example.com.")
        assert "www.example.com" in result
        assert "info@example.com" in result
        result2 = norm("Visit https://company.com/contact for details")
        assert "https://company.com/contact" in result2

    def test_plain_number(self):
        assert "forty two" in norm("There are 42 students").lower()

    def test_iso_date(self):
        result = norm("The event starts on 2023/06/15.").lower()
        assert "june" in result
        assert "fifteenth" in result
        assert "twenty twenty three" in result


class TestDateRanges:
    """Date-range readers (reference en/chronology.py:289-362 capability,
    extended to named-month prose ranges — VERDICT r1 missing #6)."""

    def setup_method(self):
        from illufly_tts_tpu.frontend.normalization.en.normalizer import (
            EnTextNormalizer)
        self.n = EnTextNormalizer()

    def test_named_month_range_with_year(self):
        assert self.n.normalize("June 1 - July 4, 2023") == \
            "from June first to July fourth twenty twenty three"

    def test_named_month_range_ordinal(self):
        out = self.n.normalize("The festival runs June 1st – July 4th.")
        assert out == "The festival runs from June first to July fourth."

    def test_us_numeric_range(self):
        out = self.n.normalize("06/01/2023 - 07/04/2023")
        assert out == ("from June first twenty twenty three to "
                       "July fourth twenty twenty three")

    def test_iso_range(self):
        out = self.n.normalize("2023-06-01 ~ 2024-07-04")
        assert out == ("from June first twenty twenty three to "
                       "July fourth twenty twenty four")

    def test_day_range_same_month(self):
        out = self.n.normalize("The sale lasts March 3-5.")
        assert out == "The sale lasts March third to fifth."

    def test_single_us_numeric_date(self):
        out = self.n.normalize("He was born on 6/15/1987.")
        assert out == "He was born on June fifteenth nineteen eighty seven."

    def test_two_digit_range_years(self):
        out = self.n.normalize("01/05/23 - 02/06/24")
        assert out == ("from January fifth twenty twenty three to "
                       "February sixth twenty twenty four")
