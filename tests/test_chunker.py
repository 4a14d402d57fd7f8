"""Chunker semantics — ports of reference tests/test_chunker.py and
tests/test_chunker_edges.py, plus packing/inline cases pinning the
mistune-equivalent behavior of rifflux_spark.functions.chunker."""

from __future__ import annotations

from rifflux_spark.functions.chunker import (
    chunk_markdown,
    make_chunk_id,
    normalize_path,
)


def test_normalize_path_converts_separators() -> None:
    assert normalize_path("\\docs\\guide\\intro.md") == "docs/guide/intro.md"


def test_chunk_id_is_deterministic() -> None:
    left = make_chunk_id("docs/a.md", 0)
    right = make_chunk_id("docs/a.md", 0)
    assert left == right
    assert len(left) == 16
    # pin the exact reference value: sha256(b"docs/a.md::0")[:16]
    import hashlib

    assert left == hashlib.sha256(b"docs/a.md::0").hexdigest()[:16]


def test_chunker_preserves_heading_and_code_block() -> None:
    text = """
# Intro

hello world paragraph

## Example

```python
print('hi')
```

some explanation after code
"""
    chunks = chunk_markdown(text, "docs/example.md", min_chunk_chars=10)
    assert chunks
    assert any("Example" in chunk.heading_path for chunk in chunks)
    assert any("```python" in chunk.content for chunk in chunks)


def test_nested_heading_breadcrumbs_are_preserved() -> None:
    text = """
# Top

top text with enough words to become chunk content.

## Mid

mid text with enough words to become chunk content.

### Leaf

leaf text with enough words to become chunk content.
"""
    chunks = chunk_markdown(text, "docs/heads.md", min_chunk_chars=10)
    heading_paths = {chunk.heading_path for chunk in chunks}
    assert "Top" in heading_paths
    assert "Top > Mid" in heading_paths
    assert "Top > Mid > Leaf" in heading_paths


def test_heading_stack_pops_to_level() -> None:
    text = """
# A

a text that is long enough to be kept around here.

## B

b text that is long enough to be kept around here.

## C

c text that is long enough to be kept around here.
"""
    chunks = chunk_markdown(text, "docs/pop.md", min_chunk_chars=10)
    paths = {c.heading_path for c in chunks}
    assert "A > B" in paths
    assert "A > C" in paths  # C replaced B at the same level


def test_min_chunk_chars_filters_small_fragments() -> None:
    text = """
# Tiny

small

## Big

This section has enough content to survive filtering and should remain.
"""
    chunks = chunk_markdown(text, "docs/filter.md", min_chunk_chars=40)
    assert all("small" not in chunk.content for chunk in chunks)
    assert any("survive filtering" in chunk.content for chunk in chunks)


def test_greedy_packing_splits_at_max_chars() -> None:
    paras = [f"paragraph {i} " + "word " * 30 for i in range(8)]
    text = "# H\n\n" + "\n\n".join(paras)
    chunks = chunk_markdown(text, "docs/pack.md", max_chunk_chars=400, min_chunk_chars=10)
    assert len(chunks) > 1
    assert all(len(c.content) <= 400 for c in chunks)
    # chunk_index is sequential and ids are derived from it
    assert [c.chunk_index for c in chunks] == list(range(len(chunks)))
    # all paragraphs survive somewhere
    joined = "\n\n".join(c.content for c in chunks)
    for i in range(8):
        assert f"paragraph {i}" in joined


def test_inline_markup_reduced_to_raw_text() -> None:
    text = """
# Title with `code` and **bold**

A paragraph with [a link](https://example.com) and *emphasis* and `tick`.
"""
    chunks = chunk_markdown(text, "docs/inline.md", min_chunk_chars=10)
    assert chunks
    assert chunks[0].heading_path == "Title with code and bold"
    assert "a link" in chunks[0].content
    assert "https://example.com" not in chunks[0].content
    assert "*" not in chunks[0].content
    assert "`" not in chunks[0].content


def test_token_count_is_whitespace_tokens() -> None:
    text = "# H\n\nthis chunk has exactly seven whitespace separated tokens yes!"
    chunks = chunk_markdown(text, "d.md", min_chunk_chars=10)
    assert chunks[0].token_count == len(chunks[0].content.split())


def test_content_before_first_heading_has_empty_heading_path() -> None:
    text = "preamble text long enough to be retained as its own chunk here.\n\n# H\n\nbody long enough to be retained as its own chunk here too."
    chunks = chunk_markdown(text, "d.md", min_chunk_chars=10)
    assert chunks[0].heading_path == ""
    assert chunks[1].heading_path == "H"


def test_code_block_preserved_verbatim_with_info() -> None:
    """mistune-v3 byte parity: block_code ``raw`` is the source slice up
    to the closing-fence line, so it keeps the final newline; the
    reference's ``f"```{info}\\n{raw}\\n```".strip()`` therefore leaves a
    blank line before the closing fence (reference chunker.py:60-65)."""
    body = "def f(x):\n    return x + 1"
    text = f"# H\n\n```python\n{body}\n```\n"
    chunks = chunk_markdown(text, "d.md", min_chunk_chars=5)
    assert chunks[0].content == f"```python\n{body}\n\n```"
