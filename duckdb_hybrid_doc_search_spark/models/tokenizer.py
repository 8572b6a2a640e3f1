"""Tokenizers — index side and query side MUST be identical (SURVEY.md §2.6.5).

The reference builds its FTS index with stemmer/stopwords disabled
(db.py:145-149) so ALL normalization lives in the tokenizer: Lindera +
ipadic, "normal" mode (splitter.py:40-47), and the query reuses the exact
pipeline (searcher.py:55-73). Here the same contract holds: the engine
records the tokenizer name in the `meta` table at index time and the query
side resolves the same one.

Backends:
- ``regex``  (default, oracle-comparable): lowercase + split on
  non-alphanumeric — shared expression in functions/text.py.
- ``lindera``: Japanese morphological analysis behind an import-try
  (lindera-py is not in this container); raises NotImplementedError with a
  clear message when unavailable. A pure-Python fallback ``jp_heuristic``
  splits CJK runs into character bigrams so Japanese text remains searchable
  without the native tokenizer.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[^a-z0-9]+")
_CJK_RE = re.compile(
    "([぀-ヿ㐀-䶿一-鿿豈-﫿]+)"
)


def tokenize_query(query: str, backend: str = "regex") -> list[str]:
    """Driver-side tokenization, same rule as the distributed index side."""
    if backend == "regex":
        return [t for t in _TOKEN_RE.split(query.lower()) if t]
    if backend == "jp_heuristic":
        return jp_heuristic_tokenize(query)
    if backend == "lindera":
        return lindera_tokenize(query)
    raise ValueError(f"unknown tokenizer backend: {backend}")


def jp_heuristic_tokenize(text: str) -> list[str]:
    """CJK runs -> character bigrams (unigram if length 1); other runs ->
    the regex rule. Deterministic, dependency-free Japanese fallback."""
    out: list[str] = []
    for part in _CJK_RE.split(text):
        if not part:
            continue
        if _CJK_RE.fullmatch(part):
            if len(part) == 1:
                out.append(part)
            else:
                out.extend(part[i : i + 2] for i in range(len(part) - 1))
        else:
            out.extend(t for t in _TOKEN_RE.split(part.lower()) if t)
    return out


_LINDERA_TOKENIZERS: dict[str, object] = {}  # keyed by dict_type


def lindera_tokenize(text: str, dict_type: str = "ipadic") -> list[str]:
    """Lindera/ipadic morphological tokenization — the exact reference
    pipeline (splitter.py:42-47): ``load_dictionary(dict_type)`` ->
    ``Segmenter("normal", dictionary)`` -> ``Tokenizer``, emitting the
    surface text of each morpheme.

    lindera-py is not installed in this container; the call is gated so the
    engine degrades to ``jp_heuristic`` explicitly rather than silently.
    When the wheel IS present, tests/test_real_models.py asserts the output
    byte-identical to the checked-in ipadic goldens
    (tests/goldens/lindera_ipadic_sample_tokens.json).
    """
    if dict_type not in _LINDERA_TOKENIZERS:
        try:
            from lindera_py import (  # type: ignore[import-not-found]
                Segmenter, Tokenizer, load_dictionary)
        except ImportError as e:
            raise NotImplementedError(
                "lindera backend unavailable (lindera-py not installed); "
                "use tokenizer backend 'jp_heuristic' for Japanese text"
            ) from e
        dictionary = load_dictionary(dict_type)  # pragma: no cover
        _LINDERA_TOKENIZERS[dict_type] = Tokenizer(  # pragma: no cover
            Segmenter("normal", dictionary)
        )
    return [  # pragma: no cover
        t.text for t in _LINDERA_TOKENIZERS[dict_type].tokenize(text)
    ]
