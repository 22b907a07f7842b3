"""Mandarin hanzi → tone-numbered pinyin romanisation.

The reference calls `pypinyin.lazy_pinyin(text, style=Style.TONE3)` at
inference and preprocessing time (`models/synthesizer/inference.py:100`,
`preprocess_audio.py:16-19`). pypinyin is optional here: when installed it is
used directly; otherwise non-CJK text passes through unchanged and CJK input
raises a clear error telling the user to either install pypinyin or provide
pinyin directly (the model itself always consumes romanised text).
"""
from __future__ import annotations

import re
from typing import List

try:
    from pypinyin import Style, lazy_pinyin  # type: ignore
    HAVE_PYPINYIN = True
except ImportError:
    HAVE_PYPINYIN = False

_CJK_RE = re.compile(r"[㐀-䶿一-鿿豈-﫿]")


def contains_chinese(text: str) -> bool:
    return _CJK_RE.search(text) is not None


def chinese_to_pinyin(text: str, errors: str = "ignore") -> List[str]:
    """Tone-3-style romanisation: "你好" → ["ni3", "hao3"].

    Non-CJK tokens pass through unchanged, matching lazy_pinyin(errors=...).
    """
    if HAVE_PYPINYIN:
        return lazy_pinyin(text, style=Style.TONE3, errors=errors)
    if contains_chinese(text):
        raise RuntimeError(
            "Input contains hanzi but pypinyin is not installed. Install "
            "pypinyin, or pass tone-numbered pinyin directly (e.g. 'ni3 hao3')."
        )
    return [text]


def romanize(text: str) -> str:
    """Full-string romanisation used by the synthesizer frontend."""
    return " ".join(chinese_to_pinyin(text))
