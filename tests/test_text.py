"""Text frontend tests."""
import numpy as np

from mockingbird_tpu.text import (
    EOS_ID, PAD_ID, sequence_to_text, symbols, text_to_sequence,
)
from mockingbird_tpu.text.numbers import normalize_numbers, number_to_words
from mockingbird_tpu.text.cleaners import english_cleaners, basic_cleaners
from mockingbird_tpu.text.pinyin import contains_chinese


def test_symbol_table():
    assert symbols[0] == "_" and symbols[1] == "~"
    assert len(symbols) == len(set(symbols))


def test_text_roundtrip():
    s = "ni3 hao3 shi4 jie4!"
    seq = text_to_sequence(s)
    assert seq[-1] == EOS_ID
    assert PAD_ID not in seq
    assert sequence_to_text(seq[:-1]) == s


def test_cleaners():
    assert basic_cleaners("Hello   World") == "hello world"
    out = english_cleaners("Dr. Smith paid $5.50 on March 3rd, 1999")
    assert "doctor" in out and "dollars" in out and "third" in out
    assert not any(ch.isdigit() for ch in out)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million two hundred thirty-four thousand five hundred sixty-seven")
    assert normalize_numbers("1999") == "nineteen ninety nine"
    assert normalize_numbers("14") == "fourteen"


def test_contains_chinese():
    assert contains_chinese("你好")
    assert not contains_chinese("ni3 hao3")
