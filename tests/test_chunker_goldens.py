"""Golden fixtures for markdown constructs beyond the ported reference
tests: lists, blockquotes, setext headings, indented code, HTML blocks.

mistune cannot run in this sandbox, so the expected outputs are DERIVED
(once, by hand) from mistune 3's public token semantics and the
reference's AST walk (reference chunker.py:28-34 ``_extract_text`` = the
concatenation of ``raw`` leaves; 49-70 the section walk):

- the reference reads ``node['attrs']['level']`` → the AST is mistune 3's
  token shape;
- mistune 3 softbreak/linebreak tokens carry no ``raw`` → a paragraph's
  source lines concatenate with NO separator; list-item children
  (block_text / paragraph) likewise concatenate bare, and bullets /
  numbers are token structure, not raw → they vanish;
- mistune 3 ``block_code`` raw for fenced code is the source slice up to
  the closing-fence line (keeps the final newline; mistune normalizes
  the source to end with '\\n'); for indented code it is the dedented
  text ``strip('\\n') + '\\n'``. The reference formats both as
  ``f"```{info}\\n{raw}\\n```".strip()``;
- setext underlines produce heading tokens level 1 (===) / 2 (---);
- thematic breaks have no raw → contribute nothing;
- ``block_html`` raw is the verbatim source lines (tags included).

Each expected value below is the byte-exact chunk content/heading the
reference would produce under those semantics.
"""

from __future__ import annotations

from rifflux_spark.functions.chunker import chunk_markdown


def _contents(text: str, **kw) -> list[tuple[str, str]]:
    return [(c.heading_path, c.content) for c in chunk_markdown(text, "g.md", min_chunk_chars=1, **kw)]


def test_golden_tight_list_concatenates_items_without_separators() -> None:
    text = "# L\n\n- item one\n- item two\n- item three\n"
    # mistune: list → list_item → block_text → text(raw). Bullets are
    # structure; raw leaves concatenate bare.
    assert _contents(text) == [("L", "item oneitem twoitem three")]


def test_golden_loose_and_nested_list() -> None:
    text = "# L\n\n- outer a\n  - inner b\n\n- outer c\n\n  second paragraph\n"
    # nested items and loose-item paragraphs are all raw leaves of the
    # one list node → single concatenated text part
    assert _contents(text) == [("L", "outer ainner bouter csecond paragraph")]


def test_golden_ordered_list_markers_vanish() -> None:
    text = "# O\n\n1. first step\n2. second step\n10) tenth step\n"
    assert _contents(text) == [("O", "first stepsecond steptenth step")]


def test_golden_blockquote_strips_markers_joins_lines() -> None:
    text = "# Q\n\n> quoted line one\n> quoted line two\n>\n> second para\n"
    # block_quote → paragraphs; softbreaks raw-less → bare concatenation
    assert _contents(text) == [("Q", "quoted line onequoted line twosecond para")]


def test_golden_setext_headings() -> None:
    text = "Top Title\n=========\n\nbody under top here\n\nSection Two\n-----------\n\nbody under section here\n"
    assert _contents(text) == [
        ("Top Title", "body under top here"),
        ("Top Title > Section Two", "body under section here"),
    ]


def test_golden_setext_dash_beats_thematic_break() -> None:
    # '---' directly under a paragraph is a setext H2, NOT a thematic
    # break; a bare '---' with no paragraph above IS a thematic break
    # (no raw → no text)
    text = "Heading Via Dash\n---\n\ncontent below it\n\n---\n\nafter the break\n"
    # both text parts sit in the same section → the greedy packer joins
    # them with \n\n (reference chunker.py:76-81)
    assert _contents(text) == [
        ("Heading Via Dash", "content below it\n\nafter the break"),
    ]


def test_golden_indented_code_block() -> None:
    text = "# C\n\n    def g():\n        return 2\n\nafter code\n"
    # indented code: dedent 4, strip('\n') + '\n', info='' →
    # f"```\n{raw}\n```".strip() leaves the blank line before the fence
    assert _contents(text) == [
        ("C", "```\ndef g():\n    return 2\n\n```\n\nafter code")
    ]


def test_golden_fenced_code_raw_keeps_trailing_newline() -> None:
    text = "# F\n\n```python\nx = 1\n```\n"
    assert _contents(text) == [("F", "```python\nx = 1\n\n```")]


def test_golden_html_block_verbatim() -> None:
    text = "# H\n\n<div class=\"note\">\nhello <b>world</b>\n</div>\n\nplain after html\n"
    # block_html raw is the verbatim source (tags kept, newlines kept)
    assert _contents(text) == [
        ("H", '<div class="note">\nhello <b>world</b>\n</div>\n\nplain after html')
    ]


def test_golden_list_interruption_rules() -> None:
    # '- ' interrupts a paragraph; '2. ' does not (CommonMark)
    bullet = "para line\n- item\n"
    # two parts (paragraph, list) packed into one chunk with \n\n
    assert _contents(bullet) == [("", "para line\n\nitem")]
    ordered = "para line\n2. not a list\n"
    # one paragraph part: the softbreak-joined lines concatenate bare
    assert _contents(ordered) == [("", "para line2. not a list")]


def test_golden_lazy_continuation_stays_in_list() -> None:
    text = "- item start\ncontinues lazily\n\nnew paragraph\n"
    assert _contents(text) == [("", "item startcontinues lazily\n\nnew paragraph")]


def test_golden_heading_interrupts_list() -> None:
    # CommonMark/mistune: an ATX heading interrupts a list — lazy
    # continuation applies only to plain paragraph text. Without the
    # interrupt the heading is swallowed into the item text and the
    # section boundary (heading_path) is lost.
    text = "# L\n\n- item one\n# Next\n\nafter heading text\n"
    assert _contents(text) == [("L", "item one"), ("Next", "after heading text")]


def test_golden_fence_quote_and_break_interrupt_list() -> None:
    # the interrupted list and the interrupting block are SEPARATE nodes
    # → their texts join with the reference's "\n\n" part separator
    text = "# F\n\n- item a\n```py\ncode()\n```\n"
    assert _contents(text) == [("F", "item a\n\n```py\ncode()\n\n```")]
    text2 = "# Q\n\n- item b\n> quoted\n"
    assert _contents(text2) == [("Q", "item b\n\nquoted")]
    text3 = "# T\n\n- item c\n---\nafter break\n"
    assert _contents(text3) == [("T", "item c\n\nafter break")]
