"""Heading-aware markdown chunker.

Re-implements the reference chunking semantics (reference
src/rifflux/indexing/chunker.py:37-108) without its mistune dependency:
block-level markdown is parsed into the same event stream the reference
walks (headings, fenced code blocks, text blocks), inline markup is reduced
to its raw text exactly like the reference's ``_extract_text`` (reference
chunker.py:28-34, which concatenates ``raw`` leaves with no separator), and
sections are greedily packed into chunks between ``min_chunk_chars`` and
``max_chunk_chars`` with ``" > "``-joined heading breadcrumbs.

Chunk identity matches reference chunker.py:19-25:
``sha256(normalized_path::chunk_index)[:16]``.

The Spark surface is :func:`chunk_udf` — an Arrow-batched pandas UDF
returning ``array<struct<...>>`` to be ``explode``d, i.e. the chunker acts
as a UDTF over the pages table (SURVEY.md §2.F).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import pandas as pd

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_FENCE_RE = re.compile(r"^(```+|~~~+)\s*(.*)$")
_THEMATIC_RE = re.compile(r"^ {0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
# inline constructs reduced to raw text, mirroring mistune's AST leaves:
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_CODESPAN_RE = re.compile(r"`([^`]*)`")
_STRONG_RE = re.compile(r"\*\*([^*]+)\*\*|__([^_]+)__")
_EM_RE = re.compile(r"\*([^*]+)\*|\b_([^_]+)_\b")


@dataclass(slots=True)
class Chunk:
    chunk_id: str
    chunk_index: int
    heading_path: str
    content: str
    token_count: int


def normalize_path(path: str) -> str:
    """Reference chunker.py:19-20."""
    return path.replace("\\", "/").lstrip("/")


def make_chunk_id(path: str, chunk_index: int) -> str:
    """Reference chunker.py:23-25."""
    raw = f"{normalize_path(path)}::{chunk_index}".encode()
    return hashlib.sha256(raw).hexdigest()[:16]


def _inline_text(text: str) -> str:
    """Reduce inline markdown to raw text (mistune ``_extract_text``)."""
    # fast path: every inline construct needs one of `[` (links/images),
    # a backtick (codespans), `*` or `_` (emphasis) — a line with none of
    # them is already raw text, and most crawled-markdown lines are
    if "[" not in text and "`" not in text and "*" not in text and "_" not in text:
        return text
    out = _IMAGE_RE.sub(r"\1", text)
    out = _LINK_RE.sub(r"\1", out)
    out = _CODESPAN_RE.sub(r"\1", out)
    out = _STRONG_RE.sub(lambda m: m.group(1) or m.group(2) or "", out)
    out = _EM_RE.sub(lambda m: m.group(1) or m.group(2) or "", out)
    return out


def _paragraph_text(lines: list[str]) -> str:
    """mistune joins a paragraph's line fragments with '' (softbreak nodes
    carry no raw text), after stripping each line's surrounding space."""
    return "".join(_inline_text(line.strip()) for line in lines)


# first characters (post-strip) that can open a non-paragraph block:
# heading '#', fence '`'/'~', thematic/emphasis-markers '*'/'-'/'_',
# list '+'/digits, blockquote '>', setext '='/'-', html '<'
_BLOCK_START_CHARS = frozenset("#`~*-_+>=<0123456789")

_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+)\s*$")
_LIST_RE = re.compile(r"^( {0,3})([-*+]|\d{1,9}[.)])(?: +(.*))?$")
_INDENT_CODE_RE = re.compile(r"^(?: {4}|\t)(.*)$")
_HTML_OPEN_RE = re.compile(r"^ {0,3}<(?:[a-zA-Z][a-zA-Z0-9-]*|/[a-zA-Z]|!|\?)")


def _parse_blocks(markdown_text: str):
    """Yield ('heading', level, text) | ('block_code', info, raw) |
    ('text', text) events — the same stream the reference walks over the
    mistune-v3 AST (reference chunker.py:49-70; the reference reads
    ``node['attrs']['level']``, which is the mistune 3 token shape).

    Semantics pinned to mistune 3 + ``_extract_text`` (the concatenation
    of ``raw`` leaves, chunker.py:28-34):

    - block_code ``raw`` is the source slice up to the closing-fence line,
      so it keeps the final newline (mistune normalizes the source to end
      with one); indented code is ``strip('\\n') + '\\n'``;
    - softbreaks carry no ``raw`` → a paragraph's lines concatenate with
      NO separator; list items, blockquote paragraphs, and loose-list
      paragraphs likewise concatenate bare (list bullets/numbers are
      structure, not raw);
    - setext underlines (``===``/``---`` under a paragraph) are headings
      level 1/2 — ``---`` under text is a heading, not a thematic break;
    - thematic breaks yield no text (skipped);
    - block HTML is a ``raw`` leaf: tags and inner newlines verbatim.
    Simplification vs mistune (documented): an HTML open tag or 4-space
    indent *inside* a paragraph stays paragraph text (lazy continuation
    covers the indent case; HTML interrupting a paragraph is rare in
    crawled markdown).
    """
    lines = markdown_text.split("\n")
    i, n = 0, len(lines)
    para: list[str] = []

    def flush_para():
        nonlocal para
        if para:
            text = _paragraph_text(para)
            para = []
            if text.strip():
                yield ("text", text.strip())

    while i < n:
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            yield from flush_para()
            i += 1
            continue
        # fast path: every block construct below starts with one of these
        # characters (after ≤3 spaces of indent, which `stripped` removes)
        # or with raw-line indentation — a line failing both tests can
        # only be paragraph text, so skip the regex ladder entirely
        if stripped[0] not in _BLOCK_START_CHARS and line[0] not in " \t":
            para.append(line)
            i += 1
            continue
        if para and _SETEXT_RE.match(line):
            # paragraph + underline = setext heading (takes precedence
            # over thematic break for ---)
            level = 1 if line.strip()[0] == "=" else 2
            text = _paragraph_text(para).strip()
            para = []
            yield ("heading", level, text)
            i += 1
            continue
        fence = _FENCE_RE.match(stripped)
        if fence:
            # fenced code interrupts a paragraph (CommonMark/mistune)
            yield from flush_para()
            marker, info = fence.group(1), fence.group(2).strip()
            body_lines: list[str] = []
            i += 1
            while i < n and not lines[i].strip().startswith(marker[0] * 3):
                body_lines.append(lines[i])
                i += 1
            i += 1  # closing fence (or EOF)
            raw = "\n".join(body_lines) + "\n" if body_lines else ""
            yield ("block_code", info, raw)
            continue
        heading = _HEADING_RE.match(line)
        if heading:
            yield from flush_para()
            yield ("heading", len(heading.group(1)), _inline_text(heading.group(2)).strip())
            i += 1
            continue
        if _THEMATIC_RE.match(line):
            yield from flush_para()
            i += 1
            continue
        lm = _LIST_RE.match(line)
        if lm and para and lm.group(2) not in ("-", "*", "+", "1.", "1)"):
            # an ordered marker other than 1. cannot interrupt a
            # paragraph (CommonMark) — "…line.\n2. next" stays paragraph
            lm = None
        if lm:
            yield from flush_para()
            parts: list[str] = []
            while i < n:
                cur = lines[i]
                if not cur.strip():
                    # blank inside a list: continue only if more list
                    # content (marker or indented line) follows
                    j = i + 1
                    while j < n and not lines[j].strip():
                        j += 1
                    if j < n and (_LIST_RE.match(lines[j]) or lines[j].startswith("  ")):
                        i = j
                        continue
                    break
                m2 = _LIST_RE.match(cur)
                if m2:
                    parts.append(_inline_text((m2.group(3) or "").strip()))
                elif cur.startswith("  "):
                    # indented line: true item continuation content
                    parts.append(_inline_text(cur.strip()))
                elif parts and not (
                    _HEADING_RE.match(cur)
                    or _FENCE_RE.match(cur.strip())
                    or _THEMATIC_RE.match(cur)
                    or cur.strip().startswith(">")
                ):
                    # lazy continuation applies to PLAIN PARAGRAPH text
                    # only (CommonMark): an ATX heading, fence, thematic
                    # break, or blockquote INTERRUPTS the list — letting
                    # it be swallowed here corrupted heading_path and
                    # section boundaries vs the mistune reference
                    parts.append(_inline_text(cur.strip()))
                else:
                    break
                i += 1
            text = "".join(parts).strip()
            if text:
                yield ("text", text)
            continue
        if stripped.startswith(">"):
            yield from flush_para()
            quote_lines: list[str] = []
            while i < n and lines[i].strip():
                ln = lines[i].strip()
                quote_lines.append(ln[1:].lstrip() if ln.startswith(">") else ln)
                i += 1
            text = "".join(_inline_text(q) for q in quote_lines if q).strip()
            if text:
                yield ("text", text)
            continue
        if not para and _INDENT_CODE_RE.match(line):
            code_lines: list[str] = []
            while i < n:
                cur = lines[i]
                m3 = _INDENT_CODE_RE.match(cur)
                if m3:
                    code_lines.append(m3.group(1))
                elif not cur.strip():
                    code_lines.append("")
                else:
                    break
                i += 1
            while code_lines and not code_lines[-1].strip():
                code_lines.pop()
            raw = "\n".join(code_lines).strip("\n") + "\n" if code_lines else ""
            yield ("block_code", "", raw)
            continue
        if not para and _HTML_OPEN_RE.match(line):
            html_lines: list[str] = []
            while i < n and lines[i].strip():
                html_lines.append(lines[i])
                i += 1
            yield ("text", "\n".join(html_lines).strip())
            continue
        para.append(line)
        i += 1
    yield from flush_para()


def chunk_markdown(
    markdown_text: str,
    relative_path: str,
    *,
    max_chunk_chars: int = 2000,
    min_chunk_chars: int = 120,
) -> list[Chunk]:
    """Reference chunker.py:37-108 semantics: section grouping under a
    heading stack, greedy packing up to max_chunk_chars with a
    min_chunk_chars floor, whitespace-token counts."""
    heading_stack: list[tuple[int, str]] = []
    sections: list[tuple[str, list[str]]] = [("", [])]

    for event in _parse_blocks(markdown_text):
        kind = event[0]
        if kind == "heading":
            _, level, text = event
            heading_stack = [h for h in heading_stack if h[0] < level]
            heading_stack.append((level, text))
            heading_path = " > ".join(part for _, part in heading_stack if part)
            sections.append((heading_path, []))
        elif kind == "block_code":
            _, info, body = event
            sections[-1][1].append(f"```{info}\n{body}\n```".strip())
        else:
            sections[-1][1].append(event[1])

    chunks: list[Chunk] = []
    chunk_index = 0

    def emit(heading_path: str, current: str) -> None:
        nonlocal chunk_index
        chunks.append(
            Chunk(
                chunk_id=make_chunk_id(relative_path, chunk_index),
                chunk_index=chunk_index,
                heading_path=heading_path,
                content=current.strip(),
                # len(split()) == len(findall(r"\S+")) for every codepoint
                # (exhaustively verified) and is ~4× cheaper
                token_count=len(current.split()),
            )
        )
        chunk_index += 1

    for heading_path, parts in sections:
        if not parts:
            continue
        current = ""
        for part in parts:
            proposal = part if not current else f"{current}\n\n{part}"
            if len(proposal) <= max_chunk_chars:
                current = proposal
                continue
            if len(current) >= min_chunk_chars:
                emit(heading_path, current)
            current = part
        if len(current.strip()) >= min_chunk_chars:
            emit(heading_path, current)

    return chunks


def chunk_rows(
    urls: pd.Series,
    texts: pd.Series,
    *,
    max_chunk_chars: int = 2000,
    min_chunk_chars: int = 120,
) -> pd.Series:
    """Arrow-batch body for the chunker UDF: per url/text, a list of chunk
    dicts matching ``CHUNK_STRUCT``. Runs inside executors; pure Python per
    document but batched via Arrow (no per-row Python UDF overhead)."""
    out = []
    for url, text in zip(urls, texts):
        cs = chunk_markdown(
            text or "",
            url or "",
            max_chunk_chars=max_chunk_chars,
            min_chunk_chars=min_chunk_chars,
        )
        out.append(
            [
                {
                    "chunk_id": c.chunk_id,
                    "chunk_index": c.chunk_index,
                    "heading_path": c.heading_path,
                    "content": c.content,
                    "token_count": c.token_count,
                }
                for c in cs
            ]
        )
    return pd.Series(out)
