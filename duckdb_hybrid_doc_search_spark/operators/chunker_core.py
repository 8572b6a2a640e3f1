"""Pure-Python Markdown chunker — the deterministic core of the ETL front
half (reference splitter.py, operators T1-T6 in SURVEY.md §2.2).

No Spark imports: the same function runs inside the distributed
``mapInPandas`` wrapper (operators/chunker.py), in unit tests, and on the
driver for single-file use. Behaviors preserved from the reference:

- T1  YAML front-matter stripped before parsing (yaml_front_matter.py:7-25)
      but line numbers count the ORIGINAL content including the front
      matter (splitter.py:167-173).
- T2  header-aware split: one chunk per header section; headers inside
      fenced code blocks do NOT split (FIXTURES.md A/en_mixed).
- T3  oversize sections (> chunk_size*4 chars, splitter.py:77) re-split at
      paragraph boundaries into <= chunk_size-token windows with
      ~chunk_overlap tokens of trailing-paragraph overlap
      (splitter.py:50-54 defaults 512/50).
- T4  alternative "recursive" strategy: delimiter hierarchy
      paragraphs -> sentences -> hard token cut (splitter.py:138-148).
- T5  header_path = "/"-joined ancestry keeping only decreasing levels
      (splitter.py:186-201): an H4 after an H2 nests under it; a following
      H2 pops back to the H1.
- T6  line attribution by first occurrence of the chunk text in the
      original content; (1,1) sentinel when the re-joined text does not
      literally appear (splitter.py:264-287).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

FRONT_MATTER_RE = re.compile(r"^---[ \t]*\n.*?\n---[ \t]*\n", re.DOTALL)
HEADER_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
FENCE_RE = re.compile(r"^(```|~~~)")

DEFAULT_CHUNK_SIZE = 512
DEFAULT_CHUNK_OVERLAP = 50
OVERSIZE_FACTOR = 4


@dataclass
class Chunk:
    """In-flight chunk record (reference splitter.py:221-230)."""

    file_path: str
    header_path: str
    line_start: int
    line_end: int
    content: str


def strip_front_matter(content: str) -> str:
    return FRONT_MATTER_RE.sub("", content, count=1)


def _locate(original: str, chunk_text: str) -> tuple[int, int]:
    """First-occurrence line span in the original text; (1,1) sentinel."""
    idx = original.find(chunk_text)
    if idx < 0 or not chunk_text:
        return (1, 1)
    start = original.count("\n", 0, idx) + 1
    end = start + chunk_text.strip("\n").count("\n")
    return (start, end)


def _header_sections(text: str) -> list[tuple[str, str]]:
    """[(header_path, section_text)] — fence-aware header walk."""
    sections: list[tuple[str, str]] = []
    stack: list[tuple[int, str]] = []  # (level, title), strictly increasing
    cur_lines: list[str] = []
    cur_path = ""
    in_fence = False

    def flush() -> None:
        body = "\n".join(cur_lines).strip("\n")
        if body.strip():
            sections.append((cur_path, body))

    for line in text.split("\n"):
        if FENCE_RE.match(line):
            in_fence = not in_fence
            cur_lines.append(line)
            continue
        m = None if in_fence else HEADER_RE.match(line)
        if m:
            flush()
            cur_lines = [line]
            level, title = len(m.group(1)), m.group(2).strip()
            while stack and stack[-1][0] >= level:
                stack.pop()
            stack.append((level, title))
            cur_path = "/".join(t for _, t in stack)
        else:
            cur_lines.append(line)
    flush()
    return sections


def _tokens(text: str) -> list[str]:
    return text.split()


def _pack_paragraphs(section: str, chunk_size: int,
                     overlap: int) -> list[str]:
    """Greedy paragraph packing to <= chunk_size tokens per chunk, with the
    trailing paragraphs of each chunk (>= overlap tokens) restarting the
    next one. A single paragraph longer than chunk_size is hard-cut on
    token windows (those cuts hit the (1,1) sentinel path by design)."""
    paras: list[str] = [p for p in section.split("\n\n") if p.strip()]
    units: list[str] = []
    for p in paras:
        ptoks = _tokens(p)
        if len(ptoks) <= chunk_size:
            units.append(p)
        else:
            step = chunk_size - overlap
            for i in range(0, len(ptoks), step):
                units.append(" ".join(ptoks[i : i + chunk_size]))
                if i + chunk_size >= len(ptoks):
                    break
    chunks: list[str] = []
    cur: list[str] = []
    cur_tokens = 0
    for unit in units:
        n = len(_tokens(unit))
        if cur and cur_tokens + n > chunk_size:
            chunks.append("\n\n".join(cur))
            # trailing-paragraph overlap
            keep: list[str] = []
            kept = 0
            for prev in reversed(cur):
                kept += len(_tokens(prev))
                keep.insert(0, prev)
                if kept >= overlap:
                    break
            cur, cur_tokens = keep, kept
        cur.append(unit)
        cur_tokens += n
    if cur:
        chunks.append("\n\n".join(cur))
    return chunks


def _recursive_split(text: str, chunk_size: int) -> list[str]:
    """T4 'recursive' strategy: paragraphs -> sentences -> hard token cut."""
    if len(_tokens(text)) <= chunk_size:
        return [text] if text.strip() else []
    for sep in ("\n\n", "\n", ". "):
        parts = [p for p in text.split(sep) if p.strip()]
        if len(parts) > 1:
            out: list[str] = []
            for p in parts:
                out.extend(_recursive_split(p, chunk_size))
            return out
    toks = _tokens(text)
    return [
        " ".join(toks[i : i + chunk_size])
        for i in range(0, len(toks), chunk_size)
    ]


def split_markdown(file_path: str, content: str,
                   chunk_size: int = DEFAULT_CHUNK_SIZE,
                   chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
                   strategy: str = "header") -> list[Chunk]:
    """Split one Markdown document into chunks (T1+T2/T4+T3+T5+T6)."""
    stripped = strip_front_matter(content)
    chunks: list[Chunk] = []

    if strategy == "header":
        sections = _header_sections(stripped)
        oversize = chunk_size * OVERSIZE_FACTOR
        for header_path, body in sections:
            pieces = (
                _pack_paragraphs(body, chunk_size, chunk_overlap)
                if len(body) > oversize
                else [body]
            )
            for piece in pieces:
                ls, le = _locate(content, piece)
                chunks.append(Chunk(file_path, header_path, ls, le, piece))
    elif strategy == "recursive":
        for piece in _recursive_split(stripped, chunk_size):
            ls, le = _locate(content, piece)
            chunks.append(Chunk(file_path, "", ls, le, piece))
    else:
        raise ValueError(f"unknown split strategy: {strategy}")
    return chunks


def trim_path_prefix(path: str, prefix: str | None) -> str:
    """T10 index-time path trim (reference indexer.py:112-136): normalize
    both, strip the prefix and any leading '/', leave non-matching paths
    untouched."""
    if not prefix:
        return path
    import posixpath

    norm_path = posixpath.normpath(path)
    norm_prefix = posixpath.normpath(prefix)
    if norm_path.startswith(norm_prefix):
        return norm_path[len(norm_prefix) :].lstrip("/")
    return path


def add_path_prefix(path: str, prefix: str | None) -> str:
    """Q9 search-time path rewrite (reference searcher.py:211-216)."""
    if not prefix:
        return path
    import posixpath

    return posixpath.join(prefix, path)
