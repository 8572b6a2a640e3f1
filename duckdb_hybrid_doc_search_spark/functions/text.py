"""Tokenization / shingling / front-matter expressions (Spark + DuckDB pairs).

The ASCII regex tokenizer is the deterministic stand-in for the reference's
Lindera Japanese morphological tokenizer (splitter.py:40-47, :289-299;
query side searcher.py:55-73). The load-bearing contract is tokenizer
IDENTITY between index side and query side (SURVEY.md §2.6.5) — both sides
here call the same builder. A Japanese-capable tokenizer can be swapped in
via models/tokenizer.py; the FTS index carries the tokenizer name in `meta`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_REGEX = "[^a-z0-9]+"

# YAML front-matter strip (reference: utils/yaml_front_matter.py:7-25).
# RE2 (DuckDB) and Java regex (Spark) both support (?s) and non-greedy.
FRONT_MATTER_REGEX = r"(?s)^---[ \t]*\n.*?\n---[ \t]*\n"


def tokenize(col: Column) -> Column:
    """lowercase, split on non-alphanumeric runs, drop empties."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_REGEX), lambda t: t != "")


def dd_tokenize(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_REGEX}'),"
        f" t -> t <> '')"
    )


def strip_front_matter(col: Column) -> Column:
    return F.regexp_replace(col, FRONT_MATTER_REGEX, "")


def dd_strip_front_matter(expr: str) -> str:
    return f"regexp_replace({expr}, '{FRONT_MATTER_REGEX}', '')"


def shingles(tokens: Column, n: int) -> Column:
    """Overlapping n-gram shingles of a token array, space-joined.

    Guarded: shorter-than-n docs yield a single shingle of the whole doc so
    every document lands in at least one dedup bucket.
    """
    joined_all = F.array(F.array_join(tokens, " "))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(joined_all)


def dd_shingles(toks: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2),"
        f" i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )
