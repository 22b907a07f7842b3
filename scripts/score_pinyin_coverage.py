"""Measure the embedded hanzi→TONE3 table's coverage (VERDICT r4 Next #8).

Two numbers, printed as one JSON line:

- char_coverage: fraction of hanzi OCCURRENCES in the supplied corpus that
  have an entry in CHAR_PINYIN/WORD_PINYIN (the reference's live path when
  pypinyin is absent drops unknown characters — a silent gap). Default
  corpus: every .md/.txt/.py under /root/reference (the reference repo's
  own Chinese text, ~3.8k hanzi occurrences).
- pypinyin_agreement: fraction of per-character TONE3 outputs matching
  `pypinyin.lazy_pinyin(style=Style.TONE3)` on the same corpus — only when
  pypinyin is importable (it is not in this image; the number comes from
  environments that have it, like the ref-goldens pattern in
  scripts/make_reference_goldens.py).

Run: python scripts/score_pinyin_coverage.py [--corpus DIR]
"""
from __future__ import annotations

import argparse
import collections
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CJK_RE = re.compile(r"[㐀-䶿一-鿿豈-﫿]")


def corpus_text(root: Path) -> str:
    parts = []
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in (".md", ".txt", ".py") and p.is_file():
            try:
                parts.append(p.read_text(errors="ignore"))
            except OSError:
                continue
    return "\n".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, default=Path("/root/reference"))
    args = ap.parse_args()

    from mockingbird_tpu.text.pinyin import _fallback_pinyin
    from mockingbird_tpu.text.pinyin_data import CHAR_PINYIN, WORD_PINYIN

    text = corpus_text(args.corpus)
    cnt = collections.Counter(c for c in text if CJK_RE.match(c))
    total = sum(cnt.values())
    in_words = {c for w in WORD_PINYIN for c in w}
    missing = {c: n for c, n in cnt.items()
               if c not in CHAR_PINYIN and c not in in_words}
    out = dict(
        metric="pinyin_char_coverage",
        value=round(1 - sum(missing.values()) / max(total, 1), 4),
        hanzi_occurrences=total, unique_hanzi=len(cnt),
        missing_unique=len(missing),
        top_missing=[c for c, _ in sorted(missing.items(),
                                          key=lambda x: -x[1])[:20]],
        char_entries=len(CHAR_PINYIN), word_entries=len(WORD_PINYIN),
    )

    try:
        from pypinyin import Style, lazy_pinyin
        sents = [s for s in re.split(r"[\n。！？!?.]", text)
                 if CJK_RE.search(s)]
        agree = tot = 0
        for s in sents:
            hanzi = "".join(c for c in s if CJK_RE.match(c))
            if not hanzi:
                continue
            gold = lazy_pinyin(hanzi, style=Style.TONE3)
            ours = _fallback_pinyin(hanzi)
            for g, o in zip(gold, ours):
                tot += 1
                agree += g == o
        out["pypinyin_agreement"] = round(agree / max(tot, 1), 4)
        out["pypinyin_syllables"] = tot
    except ImportError:
        out["pypinyin_agreement"] = None  # pypinyin not in this environment

    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
