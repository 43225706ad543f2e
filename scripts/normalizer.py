#!/usr/bin/env python
# coding: utf-8
"""Text normalization for speech corpora prep (counterpart of
scripts/normalizer.py + the Normalizer in scripts/audiodata_utils.py).

First-party: punctuation normalization and number spelling use small built-in
tables instead of sacremoses/inflect (neither is installed here); `inflect`
is used when available for full number-to-words coverage."""
import re
import unicodedata
from pathlib import Path
from typing import Optional


class Normalizer:
    MAPPING = {
        "en": {"%": "percent", "&": "and", "=": "equal to", "@": "at"},
        "de": {"€": "Euro"},
        "ja": {},
    }
    ESCAPE = {
        "en": [("(noise)", "<noise>"), ("[unclear]", "<unclear>"),
               ("(applause)", "<applause>"), ("(laughter)", "<laughter>"),
               ("(laughing)", "<laughter>"), ("(laughs)", "<laughter>")],
        "de": [("(Geräusch)", "<Geräusch>"), ("[unklar]", "<unklar>"),
               ("(Lachen)", "<Lachen>"), ("(Lacht)", "<Lachen>"),
               ("(lacht)", "<Lachen>"), ("(Gelächter)", "<Lachen>"),
               ("(Gelaechter)", "<Lachen>"), ("(Applaus)", "<Applaus>"),
               ("(Applause)", "<Applaus>"), ("(Beifall)", "<Applaus>")],
        "ja": [],
    }

    _ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
             "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
             "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
    _TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
             "eighty", "ninety"]

    def __init__(self, lang: str = "en", lowercase: bool = True,
                 remove_punc: bool = False, normalize_num: bool = True,
                 mapping_path: Optional[Path] = None, escape: bool = True):
        self.lang = lang
        self.lowercase = lowercase
        self.remove_punc = remove_punc
        self.normalize_num = normalize_num
        self.escape_rules = self.ESCAPE.get(lang, []) if escape else []
        self.mapping = dict(self.MAPPING.get(lang, {}))
        self.mapping_num = {}
        if mapping_path and Path(mapping_path).is_file():
            for line in Path(mapping_path).read_text(encoding="utf-8").splitlines():
                parts = line.rstrip("\n").split("\t")
                if len(parts) == 2:
                    self.mapping_num[parts[0]] = parts[1]
        try:
            import inflect

            self.inflect = inflect.engine()
        except ImportError:
            self.inflect = None

    def _num_to_words(self, n: int) -> str:
        if self.inflect is not None:
            return self.inflect.number_to_words(n).replace(",", "")
        if n < 20:
            return self._ONES[n]
        if n < 100:
            t, o = divmod(n, 10)
            return self._TENS[t] + ("" if o == 0 else " " + self._ONES[o])
        if n < 1000:
            h, r = divmod(n, 100)
            out = self._ONES[h] + " hundred"
            return out if r == 0 else out + " " + self._num_to_words(r)
        for div, name in [(10**9, "billion"), (10**6, "million"), (10**3, "thousand")]:
            if n >= div:
                head, r = divmod(n, div)
                out = self._num_to_words(head) + " " + name
                return out if r == 0 else out + " " + self._num_to_words(r)
        return str(n)

    def __call__(self, text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        for src, dst in self.escape_rules:
            text = text.replace(src, dst)
        for src, dst in self.mapping_num.items():
            text = text.replace(src, dst)
        for src, dst in self.mapping.items():
            text = text.replace(src, f" {dst} ")
        if self.normalize_num and self.lang == "en":
            text = re.sub(r"\b(\d+)\b",
                          lambda m: self._num_to_words(int(m.group(1))), text)
        if self.lowercase:
            text = text.lower()
        if self.remove_punc:
            # keep the escaped <tags>
            text = re.sub(r"(?<![<\w])[^\w\s<>']+(?![>\w])", " ", text)
        text = re.sub(r"\s+", " ", text).strip()
        return text
