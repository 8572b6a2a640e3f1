"""Independent pure-Python re-implementation of the Markdown chunking
contract (reference splitter.py semantics, SURVEY.md T1-T6), used ONLY to
generate a DuckDB-checkable oracle for `markdown_chunk_fixtures`.

This is intentionally NOT the engine's chunker (operators/chunker_core.py):
it re-derives the same spec with different algorithms — front matter by
line scan instead of regex, fence state as a precomputed mask, header
ancestry by backward minimum scan instead of a forward stack, line spans
via prefix sums — so agreement between the two is a real cross-check of
the chunk-boundary semantics, not a tautology. The oracle SQL is a VALUES
literal of this implementation's output over the bundled fixture corpus;
the driver gate then compares it against the Spark mapInPandas pipeline.
"""

from __future__ import annotations

import hashlib
import pathlib
import re

OVERSIZE_CHARS = 512 * 4
CHUNK_SIZE = 512
OVERLAP = 50

_HEADER = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")


def _strip_front_matter_lines(content: str) -> str:
    """Line-scan equivalent of ^---\\n.*?\\n---\\n (first match only)."""
    lines = content.split("\n")
    if not lines or lines[0].rstrip(" \t") != "---" or not lines[0].startswith("---"):
        return content
    # closing fence can appear at line index >= 2 and must itself end in a
    # newline (i.e. not be the final unterminated line)
    for k in range(2, len(lines) - 1 + 1):
        if k >= len(lines):
            break
        if lines[k].rstrip(" \t") == "---" and lines[k].startswith("---"):
            if k <= len(lines) - 2:
                return "\n".join(lines[k + 1:])
            return content
    return content


def _fence_mask(lines: list[str]) -> list[bool]:
    """mask[i] = line i is inside (or opens/closes) a fenced block, in the
    sense that header detection must skip it."""
    mask = []
    open_ = False
    for ln in lines:
        if ln.startswith("```") or ln.startswith("~~~"):
            open_ = not open_
            mask.append(True)  # fence delimiter lines never split
        else:
            mask.append(open_)
    return mask


def _sections(text: str) -> list[tuple[str, str]]:
    """[(header_path, body)] with the preamble before the first header at
    path ''."""
    lines = text.split("\n")
    mask = _fence_mask(lines)
    headers = []  # (line_idx, level, title)
    for i, ln in enumerate(lines):
        if mask[i]:
            continue
        m = _HEADER.match(ln)
        if m:
            headers.append((i, len(m.group(1)), m.group(2).strip()))

    def path_for(hidx: int) -> str:
        # backward minimum scan: ancestors are the nearest preceding
        # headers with strictly decreasing levels
        _, level, title = headers[hidx]
        parts = [title]
        min_lev = level
        for j in range(hidx - 1, -1, -1):
            _, lv, tt = headers[j]
            if lv < min_lev:
                parts.insert(0, tt)
                min_lev = lv
        return "/".join(parts)

    bounds = [h[0] for h in headers] + [len(lines)]
    out: list[tuple[str, str]] = []
    if headers:
        pre = "\n".join(lines[: bounds[0]]).strip("\n")
        if pre.strip():
            out.append(("", pre))
    else:
        pre = "\n".join(lines).strip("\n")
        if pre.strip():
            out.append(("", pre))
        return out
    for hidx in range(len(headers)):
        body = "\n".join(lines[bounds[hidx]: bounds[hidx + 1]]).strip("\n")
        if body.strip():
            out.append((path_for(hidx), body))
    return out


def _pack(section: str) -> list[str]:
    """Greedy paragraph packing (T3): same spec as chunker_core
    _pack_paragraphs, written as an index-walk."""
    paras = [p for p in section.split("\n\n") if p.strip()]
    units: list[str] = []
    for p in paras:
        toks = p.split()
        if len(toks) <= CHUNK_SIZE:
            units.append(p)
        else:
            step = CHUNK_SIZE - OVERLAP
            i = 0
            while i < len(toks):
                units.append(" ".join(toks[i: i + CHUNK_SIZE]))
                if i + CHUNK_SIZE >= len(toks):
                    break
                i += step
    chunks: list[str] = []
    cur: list[str] = []
    n_cur = 0
    for u in units:
        n = len(u.split())
        if cur and n_cur + n > CHUNK_SIZE:
            chunks.append("\n\n".join(cur))
            keep: list[str] = []
            kept = 0
            j = len(cur) - 1
            while j >= 0:
                kept += len(cur[j].split())
                keep.insert(0, cur[j])
                if kept >= OVERLAP:
                    break
                j -= 1
            cur, n_cur = keep, kept
        cur.append(u)
        n_cur += n
    if cur:
        chunks.append("\n\n".join(cur))
    return chunks


def _span(original: str, piece: str) -> tuple[int, int]:
    idx = original.find(piece)
    if idx < 0 or not piece:
        return (1, 1)
    start = original[:idx].count("\n") + 1
    return (start, start + piece.strip("\n").count("\n"))


def chunk_file(file_path: str, content: str) -> list[tuple]:
    """(doc_id, file_path, header_path, line_start, line_end, content)."""
    rows = []
    for hp, body in _sections(_strip_front_matter_lines(content)):
        pieces = _pack(body) if len(body) > OVERSIZE_CHARS else [body]
        for piece in pieces:
            ls, le = _span(content, piece)
            doc_id = hashlib.sha256(
                "\x1f".join([file_path, str(ls), piece]).encode("utf-8")
            ).hexdigest()
            rows.append((doc_id, file_path, hp, ls, le, piece))
    return rows


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def fixtures_oracle_sql(fixtures_dir: str) -> str:
    """DuckDB VALUES literal of this module's chunking of the fixture
    corpus — the cross-engine oracle for `markdown_chunk_fixtures`."""
    rows: list[tuple] = []
    base = pathlib.Path(fixtures_dir)
    for p in sorted(base.rglob("*.md")):
        # Spark's file source skips hidden/metadata paths (leading '.'/'_');
        # mirror that so stray tool caches can't poison the oracle
        rel = p.relative_to(base)
        if any(part[0] in "._" for part in rel.parts):
            continue
        # read_bytes + decode, NOT read_text: text mode's universal
        # newlines would fold CRLF fixtures to LF, diverging from Spark's
        # wholetext source which preserves the raw bytes
        rows.extend(chunk_file(str(p.resolve()),
                               p.read_bytes().decode("utf-8")))
    if not rows:
        return (
            "SELECT NULL::VARCHAR AS doc_id, NULL::VARCHAR AS file_path, "
            "NULL::VARCHAR AS header_path, NULL::INT AS line_start, "
            "NULL::INT AS line_end, NULL::VARCHAR AS content WHERE false"
        )
    vals = ",\n".join(
        f"({_sql_str(d)}, {_sql_str(fp)}, {_sql_str(hp)}, {ls}, {le}, "
        f"{_sql_str(c)})"
        for d, fp, hp, ls, le, c in rows
    )
    return (
        "SELECT * FROM (VALUES\n" + vals +
        "\n) AS t(doc_id, file_path, header_path, line_start, line_end, "
        "content)"
    )
