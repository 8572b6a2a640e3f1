"""Unit + property tests for the pure Markdown chunker (FIXTURES.md §A,
reference behaviors T1-T6 incl. §2.6 quirks)."""

from __future__ import annotations

import pathlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_hybrid_doc_search_spark.operators.chunker_core import (
    add_path_prefix, split_markdown, strip_front_matter, trim_path_prefix)

FIX = pathlib.Path(__file__).parent.parent / "fixtures" / "docs"


def read(name: str) -> str:
    return (FIX / name).read_text(encoding="utf-8")


def chunks(name: str, **kw):
    return split_markdown(name, read(name), **kw)


def test_jp_basic_header_paths():
    cs = chunks("jp_basic.md")
    assert [c.header_path for c in cs] == [
        "全文検索エンジン",
        "全文検索エンジン/使い方",
        "全文検索エンジン/検索",
    ]


def test_front_matter_stripped_but_lines_count_original():
    cs = chunks("front_matter.md")
    # front matter must not appear in any chunk
    assert all("title: test doc" not in c.content for c in cs)
    # line numbers count the original file: '# Title' is line 5
    assert cs[0].line_start == 5


def test_no_front_matter_passthrough():
    text = "no front matter here\n---\nnot at start\n"
    assert strip_front_matter(text) == text


def test_deep_headers_decreasing_walk():
    cs = chunks("deep_headers.md")
    paths = [c.header_path for c in cs]
    # H4 after H2 nests under it; following H2 pops back to H1
    assert "L1/L2/L4 jump" in paths
    assert "L1/L2 again" in paths
    assert "L1/L2 again/L6" in paths


def test_code_fence_headers_do_not_split():
    cs = chunks("en_mixed.md")
    assert not any("not a header inside fence" in c.header_path for c in cs)
    fenced = [c for c in cs if "x = 1" in c.content]
    assert len(fenced) == 1 and fenced[0].header_path == "English Doc"


def test_oversize_resplit_and_token_budget():
    cs = chunks("oversize_section.md", chunk_size=512, chunk_overlap=50)
    assert len(cs) > 1  # 1200 words -> multiple chunks
    for c in cs:
        assert len(c.content.split()) <= 512 + 2  # header line slack
    # consecutive chunks overlap
    t0, t1 = cs[0].content.split(), cs[1].content.split()
    assert set(t0[-10:]) & set(t1[:100])


def test_dup_content_first_occurrence_lines():
    cs = chunks("dup_content.md")
    dupes = [c for c in cs if "repeated paragraph" in c.content]
    assert len(dupes) == 2
    # both chunks include their (distinct) header lines so they locate
    # at their true positions; a bare duplicate paragraph would take the
    # first occurrence
    assert dupes[0].line_start < dupes[1].line_start


def test_empty_and_headerless():
    assert chunks("empty.md") == []
    cs = chunks("no_headers.md")
    assert len(cs) == 1 and cs[0].header_path == ""
    assert cs[0].line_start == 1


def test_recursive_strategy():
    cs = chunks("deep_headers.md", strategy="recursive")
    assert cs and all(c.header_path == "" for c in cs)


def test_path_trim_and_add():
    assert trim_path_prefix("fixtures/docs/a.md", "fixtures") == "docs/a.md"
    assert trim_path_prefix("other/a.md", "fixtures") == "other/a.md"
    assert trim_path_prefix("a.md", None) == "a.md"
    assert add_path_prefix("docs/a.md", "/root") == "/root/docs/a.md"
    assert add_path_prefix("a.md", None) == "a.md"


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(["# H1", "## H2", "### H3", "```", "text line",
                             "", "more words here"]),
            st.text(alphabet="abc #`", max_size=12),
        ),
        max_size=30,
    )
)
def test_chunker_invariants(lines):
    content = "\n".join(lines)
    cs = split_markdown("f.md", content)
    joined = content  # original
    for c in cs:
        assert c.line_start >= 1 and c.line_end >= c.line_start
        assert c.content.strip()  # no empty chunks
        # every chunk is either literally locatable or carries the sentinel
        if joined.find(c.content) < 0:
            assert (c.line_start, c.line_end) == (1, 1)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=300))
def test_chunker_never_crashes(content):
    for strategy in ("header", "recursive"):
        for c in split_markdown("f.md", content, strategy=strategy):
            assert c.line_start <= c.line_end
