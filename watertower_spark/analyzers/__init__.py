"""Language analyzers: doc text → (term → word positions) streams.

Pure-Python core (no Spark imports) so the same code runs:
- inside vectorized ``mapInPandas`` / pandas UDF batches on executors, and
- driver-side for query-string analysis (queries are tiny).

Semantics re-expressed from the reference (citations into /root/reference):

- registry / dispatch                 nlp/tokenizer.go:12-41
- English splitter: whitespace Fields split, TrimRight('.,:"'), lowercase
                                       nlp/english/english.go:20-28
- English stemmer: Snowball English (Porter2), stop words unstemmed
                                       nlp/english/english.go:30-32
- English index stop-word set is EMPTY (declared but never populated)
                                       nlp/english/english.go:14-16
- position = index among *kept* words; stop words skipped without
  advancing the index            nlp/tokenizer.go:47-66
- the `offset` parameter of Tokenize is computed but never applied
  (quirk): title and body positions BOTH start at 0
                                       nlp/tokenizer.go:75-80
- TokenizeToMap dedupes by term; title/body maps merged body-last-wins
                                       nlp/tokenizer.go:84-91; database.go:199-203
- unigram splitter: per-codepoint     nlp/unigram/unigram.go:15-17
- bigram splitter: adjacent codepoint pairs, [] when the UTF-8 BYTE
  length < 2 (byte-length guard, rune pairs — quirk)
                                       nlp/bigram/bigram.go:15-25
- language fallback when lang == "": index under bigram AND unigram,
  unigram positions shifted by the bigram word count (the shift IS
  applied on this path)               database.go:158-192
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from typing import Callable, Optional

from . import porter2

Splitter = Callable[[str], list]
Stemmer = Optional[Callable[[str], str]]


@dataclass(frozen=True)
class Analyzer:
    name: str
    splitter: Splitter
    stemmer: Stemmer
    stop_words: frozenset


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(
    lang: str, splitter: Splitter, stemmer: Stemmer, stop_words: frozenset = frozenset()
) -> None:
    _REGISTRY[lang] = Analyzer(lang, splitter, stemmer, stop_words)


def find_analyzer(lang: str) -> Analyzer:
    a = _REGISTRY.get(lang)
    if a is None:
        raise KeyError(f"no analyzer registered for language {lang!r}")
    return a


# ---------------------------------------------------------------- splitters

def english_splitter(content: str) -> list:
    # Go strings.Fields ≈ str.split() (split on Unicode-whitespace runs,
    # no empties), then TrimRight('.,:"') + lowercase per word.
    return [w.rstrip('.,:"').lower() for w in content.split()]


def simple_splitter(content: str) -> list:
    """english_splitter without stemming downstream — the SQL-expressible
    analyzer used for DuckDB-oracle parity checks."""
    return [w.rstrip('.,:"').lower() for w in content.split()]


def unigram_splitter(content: str) -> list:
    return list(content)


def bigram_splitter(content: str) -> list:
    if len(content.encode("utf-8")) < 2:
        return []
    chars = list(content)
    return [chars[i] + chars[i + 1] for i in range(len(chars) - 1)]


def nfkc_english_splitter(content: str) -> list:
    """Unicode NFKC compatibility fold, then the English pipeline.

    Opt-in (``en-nfkc``): web text is full of full-width forms
    (ＡＢＣ), ligatures (ﬁ), and circled/superscript digits that NFKC
    folds to their ASCII/compatibility equivalents, so "ｔａｂｌｅ"
    matches "table".  NOT the parity default — the reference applies no
    Unicode normalization (nlp/english/english.go:20-28), and rank
    identity requires byte-faithful tokens.  Symmetric by construction:
    the same analyzer entry serves index builds (default_lang/lang
    column = "en-nfkc") and query analysis (analyze_query lang).
    """
    return english_splitter(unicodedata.normalize("NFKC", content))


register_analyzer("en", english_splitter, porter2.stem)
register_analyzer("en-nfkc", nfkc_english_splitter, porter2.stem)
register_analyzer("simple", simple_splitter, None)
register_analyzer("unigram", unigram_splitter, None)
register_analyzer("bigram", bigram_splitter, None)


# The reference's 150-word Japanese stop list (nlp/japanese/japanese.go:
# 16-29, sourced from the public stopwords-iso/stopwords-ja set).  It
# applies to MORPHEMES, so it is only meaningful when a morphological
# tokenizer is present — on the bigram fallback it would wrongly drop
# character pairs spanning word boundaries.
JA_STOP_WORDS = frozenset(
    "あそこ あっ あの あのかた あの人 あり あります ある あれ い いう います いる う うち "
    "え お および おり おります か かつて から が き ここ こちら こと この これ これら "
    "さ さらに し しかし する ず せ せる そこ そして その その他 その後 それ それぞれ "
    "それで た ただし たち ため たり だ だっ だれ つ て で でき できる です では でも "
    "と という といった とき ところ として とともに とも と共に どこ どの な ない なお "
    "なかっ ながら なく なっ など なに なら なり なる なん に において における について "
    "にて によって により による に対して に対する に関する の ので のみ は ば へ ほか "
    "ほとんど ほど ます また または まで も もの ものの や よう より ら られ られる れ "
    "れる を ん 何 及び 彼 彼女 我々 特に 私 私達 貴方 貴方方".split()
)

# POS categories the reference drops before indexing (japanese.go:33:
# kagome POSFilter on 助詞 particles and 記号 symbols)
_JA_POS_DROP = ("助詞", "記号")


def _register_japanese() -> None:
    """'ja': the reference uses kagome morphological analysis in Search
    mode with a POS drop of 助詞/記号 and the stop list above
    (nlp/japanese/japanese.go:14-47).  No Japanese tokenizer ships in
    this container, so we port the same semantics over the common Python
    morphological analyzers (janome / fugashi+MeCab) when one is
    importable, and fall back to character bigrams otherwise — a
    standard CJK indexing strategy whose phrase semantics still make
    contiguous-substring queries match, but outside rank-identity scope
    (SURVEY.md §2.2/A5).
    """
    try:
        from janome.tokenizer import Tokenizer as _Janome  # type: ignore

        _tok = _Janome()

        def ja_splitter(content: str) -> list:
            return [
                t.surface for t in _tok.tokenize(content)
                if t.part_of_speech.split(",")[0] not in _JA_POS_DROP
            ]

        register_analyzer("ja", ja_splitter, None, JA_STOP_WORDS)
        return
    except ImportError:
        pass
    try:
        from fugashi import Tagger as _Tagger  # type: ignore

        _tagger = _Tagger()

        def ja_splitter(content: str) -> list:
            return [
                w.surface for w in _tagger(content)
                if getattr(w.feature, "pos1", None) not in _JA_POS_DROP
            ]

        register_analyzer("ja", ja_splitter, None, JA_STOP_WORDS)
        return
    except ImportError:
        pass
    register_analyzer("ja", bigram_splitter, None)


_register_japanese()


def ja_is_morphological() -> bool:
    """True when 'ja' is backed by a real morphological tokenizer (the
    kagome-equivalent goldens are gated on this; otherwise the bigram
    fallback is active and those tests skip)."""
    return _REGISTRY["ja"].splitter is not bigram_splitter


# ------------------------------------------------------------- tokenization

def tokenize_stream(analyzer: Analyzer, content: str) -> tuple[dict, int]:
    """content → ({term: [positions]}, kept-word count).

    Position = running index over kept (non-stop) words; the section
    offset is deliberately NOT applied (reference quirk A9).
    """
    positions: dict = {}
    get = positions.get
    idx = 0
    stop = analyzer.stop_words
    stemmer = analyzer.stemmer
    if stemmer is None:
        for w in analyzer.splitter(content):
            if w in stop:
                continue
            lst = get(w)
            if lst is None:
                positions[w] = [idx]
            else:
                lst.append(idx)
            idx += 1
    else:
        # worker-lifetime stem cache: corpora follow Zipf, so the hit
        # rate approaches 1 after a few documents per executor
        cache = _STEM_CACHES.setdefault(analyzer.name, {})
        cget = cache.get
        for w in analyzer.splitter(content):
            if w in stop:
                continue
            t = cget(w)
            if t is None:
                t = stemmer(w)
                cache[w] = t
            lst = get(t)
            if lst is None:
                positions[t] = [idx]
            else:
                lst.append(idx)
            idx += 1
    return positions, idx


_STEM_CACHES: dict = {}


def _analyze_with_language(
    title: str, content: str, lang: str
) -> tuple[dict, int, int]:
    """(term → positions merged body-last-wins, word_count, title_word_count)."""
    analyzer = find_analyzer(lang)
    title_map, twc = tokenize_stream(analyzer, title)
    body_map, wc_body = tokenize_stream(analyzer, content)
    merged = dict(title_map)
    merged.update(body_map)  # body overwrites shared terms (A10)
    return merged, twc + wc_body, twc


def analyze_document(
    title: str, content: str, lang: str, default_lang: str = ""
) -> tuple[dict, int, int]:
    """Full analysis incl. the empty-language n-gram dual-index fallback.

    Returns (term → positions, word_count, title_word_count).
    """
    language = lang or default_lang
    if language:
        return _analyze_with_language(title, content, language)
    tokens, wc, twc = _analyze_with_language(title, content, "bigram")
    tokens2, wc2, twc2 = _analyze_with_language(title, content, "unigram")
    for term, pos in tokens2.items():
        tokens[term] = [p + wc for p in pos]
    if wc == 0:
        wc = wc2
    if twc == 0:
        twc = twc2
    return tokens, wc, twc


def split_title_body(text: str) -> tuple[str, str]:
    """Extracted text → (title, body): title is the part before the first
    blank line, body the remainder (FIXTURES.md §1; mirrors the reference's
    separate title/body analysis, database.go:199-203)."""
    head, sep, rest = text.partition("\n\n")
    return (head, rest) if sep else (text, "")


def analyze_query(search_word: str, lang: str, default_lang: str = "") -> dict:
    """Query-string analysis (search.go:16-31): resolve language (byte-length
    n-gram heuristic when empty), tokenize single-section.

    Unregistered languages degrade to the 'simple' analyzer, mirroring the
    index side (operators/analyze.py resolve()) — documents ingested under
    the fallback must be reachable via the lang they were ingested with.
    """
    language = lang or default_lang
    if not language:
        language = "unigram" if len(search_word.encode("utf-8")) < 2 else "bigram"
    try:
        analyzer = find_analyzer(language)
    except KeyError:
        analyzer = find_analyzer("simple")
    token_map, _ = tokenize_stream(analyzer, search_word)
    return token_map
