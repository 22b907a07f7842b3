"""Text frontend tests."""
from pathlib import Path

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# Polyphone coverage (VERDICT r4 Next #8): the embedded hanzi->TONE3 table
# is the LIVE path in pypinyin-less environments — its correctness must be
# measured, not assumed.
# ---------------------------------------------------------------------------

# curated polyphone gold set: pypinyin.lazy_pinyin(style=TONE3) conventions
# (neutral tones are BARE syllables, e.g. "le" not "le5")
POLYPHONE_GOLD = [
    ("银行", "yin2 hang2"), ("行走", "xing2 zou3"), ("不行", "bu4 xing2"),
    ("长大", "zhang3 da4"), ("很长", "hen3 chang2"), ("长城", "chang2 cheng2"),
    ("音乐", "yin1 yue4"), ("快乐", "kuai4 le4"),
    ("重要", "zhong4 yao4"), ("重复", "chong2 fu4"),
    ("地方", "di4 fang1"),
    ("了解", "liao3 jie3"), ("吃了", "chi1 le"),
    ("还有", "hai2 you3"), ("还钱", "huan2 qian2"), ("归还", "gui1 huan2"),
    ("觉得", "jue2 de"), ("睡觉", "shui4 jiao4"),
    ("都是", "dou1 shi4"), ("首都", "shou3 du1"),
    ("方便", "fang1 bian4"),
    ("教育", "jiao4 yu4"), ("教书", "jiao1 shu1"),
    ("发现", "fa1 xian4"), ("头发", "tou2 fa4"),
    ("干净", "gan1 jing4"), ("干活", "gan4 huo2"),
    ("会计", "kuai4 ji4"), ("开会", "kai1 hui4"),
    ("调查", "diao4 cha2"), ("调整", "tiao2 zheng3"),
    ("为了", "wei4 le"), ("因为", "yin1 wei4"), ("作为", "zuo4 wei2"),
    ("得到", "de2 dao4"),
    ("大学", "da4 xue2"), ("大夫", "dai4 fu"),
    ("数学", "shu4 xue2"),
    ("中国", "zhong1 guo2"), ("中奖", "zhong4 jiang3"),
]


def test_polyphone_gold_set():
    """Every curated polyphone context resolves to its gold TONE3 reading
    through the embedded word dictionary (40/40 measured r5; a regression
    here means a WORD_PINYIN entry was lost)."""
    from mockingbird_tpu.text.pinyin import _fallback_pinyin
    bad = [(t, " ".join(_fallback_pinyin(t)), e) for t, e in POLYPHONE_GOLD
           if " ".join(_fallback_pinyin(t)) != e]
    assert not bad, bad


def test_reference_corpus_char_coverage():
    """The reference repo's own Chinese text (README-CN etc, ~3.8k hanzi
    occurrences) must be fully covered — an unknown character is silently
    DROPPED by the lazy_pinyin(errors='ignore') convention, which is an
    audible defect, not a soft degradation."""
    import json
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable,
         str(Path(__file__).resolve().parent.parent
             / "scripts" / "score_pinyin_coverage.py")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    score = json.loads(out.stdout)
    assert score["value"] >= 0.999, score


def test_pypinyin_agreement():
    """Skip-gated (ref-goldens pattern): in environments WITH pypinyin,
    the embedded table must agree with lazy_pinyin(TONE3) on >=90% of
    per-character outputs over the reference corpus."""
    pypinyin = pytest.importorskip("pypinyin")
    import collections
    import re as _re
    from mockingbird_tpu.text.pinyin import _fallback_pinyin
    cjk = _re.compile(r"[㐀-䶿一-鿿豈-﫿]")
    text = Path("/root/reference/README-CN.md").read_text(errors="ignore")
    hanzi = "".join(c for c in text if cjk.match(c))
    gold = pypinyin.lazy_pinyin(hanzi, style=pypinyin.Style.TONE3)
    ours = _fallback_pinyin(hanzi)
    agree = sum(g == o for g, o in zip(gold, ours))
    assert agree / max(len(gold), 1) >= 0.90
