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


def test_builtin_pinyin_fallback():
    """Embedded hanzi→pinyin table: works without pypinyin installed."""
    from mockingbird_tpu.text.pinyin import _fallback_pinyin
    from mockingbird_tpu.text import romanize, text_to_sequence

    assert _fallback_pinyin("你好世界") == ["ni3", "hao3", "shi4", "jie4"]
    # polyphone word dictionary beats per-char defaults (行 xing2 / hang2)
    assert _fallback_pinyin("银行") == ["yin2", "hang2"]
    assert _fallback_pinyin("不行") == ["bu4", "xing2"]
    # neutral tones carry no digit, matching pypinyin Style.TONE3
    assert _fallback_pinyin("我们") == ["wo3", "men"]
    # non-CJK runs pass through; unknown hanzi are dropped (errors='ignore')
    assert _fallback_pinyin("abc 你好!") == ["abc", "ni3", "hao3", "!"]
    # the romanised output feeds the symbol table end to end
    seq = text_to_sequence(romanize("你好世界"))
    assert len(seq) > 0 and all(isinstance(i, int) for i in seq)


def test_builtin_pinyin_table_wellformed():
    import re
    from mockingbird_tpu.text.pinyin_data import CHAR_PINYIN, WORD_PINYIN

    syl = re.compile(r"[a-z]+[1-5]?$")
    assert len(CHAR_PINYIN) > 1000
    for ch, py in CHAR_PINYIN.items():
        assert len(ch) == 1 and "㐀" <= ch <= "鿿", ch
        assert syl.fullmatch(py), (ch, py)
    for w, py in WORD_PINYIN.items():
        assert len(w) >= 2, w
        assert all(syl.fullmatch(t) for t in py.split()), (w, py)
