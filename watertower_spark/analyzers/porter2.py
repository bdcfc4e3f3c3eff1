"""Porter2 (Snowball English) stemmer, pure Python, from the public spec.

Implements the algorithm published at snowballstem.org/algorithms/english/
stemmer.html.  The reference engine stems via the same algorithm family
(kljensen/snowball; see /root/reference/nlp/english/english.go:30-32), with
two behaviors we reproduce:

- words of <= 2 letters are returned unchanged;
- when ``stem_stop_words`` is False (the reference always passes False),
  Snowball stop words are returned unchanged.

No third-party stemmer package is available in this environment, so the
algorithm is implemented from the published specification and pinned by
golden test vectors (tests/test_analyzers.py).
"""

from __future__ import annotations

from .stopwords import SNOWBALL_STOP_WORDS

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms applied right after the initial lowercasing.
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant forms checked after step 1a.
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = (
    # (suffix, replacement, requires_preceding_letter)
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "l"),
    ("li", "", "LI"),
)

_STEP3_SUFFIXES = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ative", "", True),  # only if in R2
    ("ical", "ic", False),
    ("ness", "", False),
    ("ful", "", False),
)

_STEP4_SUFFIXES = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _compute_regions(word: str) -> tuple[int, int]:
    """R1 = region after the first non-vowel following a vowel; R2 = R1 of R1.

    Special prefixes gener-, commun-, arsen- fix R1 at the prefix end.
    """
    n = len(word)
    r1 = n
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 5 if not word.startswith("commun") else 6
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if word ends in a short syllable per the spec."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel not in {w, x, Y}
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in ("w", "x", "Y")
        )
    return False


def _is_short_word(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(segment: str) -> bool:
    return any(c in _VOWELS for c in segment)


def _in_r(word: str, suffix: str, r: int) -> bool:
    return len(word) - len(suffix) >= r


def stem(word: str, stem_stop_words: bool = False) -> str:
    """Stem one word (assumed already lowercased by the splitter)."""
    word = word.lower()
    if len(word) <= 2:
        return word
    if not stem_stop_words and word in SNOWBALL_STOP_WORDS:
        return word
    if word.startswith("'"):
        word = word[1:]
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc
    if len(word) <= 2:
        return word

    # Mark consonant-y as Y.
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _compute_regions(word)

    # Step 0: drop longest of 's  's  '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if _in_r(word, suf, r1):
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short_word(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel that is not first letter
    if (
        len(word) > 2
        and word[-1] in ("y", "Y")
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (longest suffix; act only if in R1)
    for suf, repl, cond in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if _in_r(word, suf, r1):
                if cond == "l":
                    if len(word) > len(suf) and word[-len(suf) - 1] == "l":
                        word = word[: -len(suf)] + repl
                elif cond == "LI":
                    if len(word) > len(suf) and word[-len(suf) - 1] in _LI_ENDING:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (longest suffix; act only if in R1; 'ative' additionally needs R2)
    for suf, repl, needs_r2 in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if _in_r(word, suf, r1):
                if needs_r2:
                    if _in_r(word, suf, r2):
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (longest suffix; delete if in R2; 'ion' needs preceding s/t)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if _in_r(word, suf, r2):
                if suf == "ion":
                    if len(word) > len(suf) and word[-len(suf) - 1] in ("s", "t"):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if _in_r(word, "e", r2):
            word = word[:-1]
        elif _in_r(word, "e", r1) and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and _in_r(word, "l", r2):
        word = word[:-1]

    return word.replace("Y", "y")
