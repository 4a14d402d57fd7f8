"""Byte-parity of the index tokenizer vs real SQLite FTS5
``unicode61 remove_diacritics 2`` (reference src/rifflux/db/schema.sql:27),
checked through the fts5vocab instance table."""

from __future__ import annotations

import random
import sqlite3

from rifflux_spark.functions.tokenizer import compile_query, tokenize


def fts5_tokens_many(texts: list[str]) -> list[list[str]]:
    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE VIRTUAL TABLE t USING fts5(c, tokenize='unicode61 remove_diacritics 2')"
    )
    conn.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    conn.executemany("INSERT INTO t(rowid, c) VALUES (?, ?)", list(enumerate(texts)))
    inst: dict[int, list[tuple[int, str]]] = {}
    for term, doc, off in conn.execute("SELECT term, doc, offset FROM v"):
        inst.setdefault(doc, []).append((off, term))
    out = [[t for _, t in sorted(inst.get(i, []))] for i in range(len(texts))]
    conn.close()
    return out


FIXED_CASES = [
    "Hello, World_foo 42!",
    "café Café CAFÉ",
    "café combining",
    "naïve Zürich ÉCOLE",
    "Ελλάδα ελληνικά ά",
    "дом Дом ДОМ",
    "a_b c-d e.f",
    "x²y z₂w",
    "ｆｕｌｌＷｉｄｔｈ１２３",
    "日本語のテキスト",
    "mixed日本abc",
    "Øre øre Åå æÆ ßs",
    "señor crème brûlée",
    "Łódź Đường ﬁligature",
    "ǡǎ ǖǘǚǜ ςϰϕ",
    "ệ Ệ ộ Ḃḃ ế",
    "άώ йӧ й",
    "emoji 😀 test",
    "code(){return;}",
    "'quoted' \"double\" `tick`",
    "",
    "   \t\n  ",
    ".,:()\"",
]


def test_fixed_cases_match_fts5() -> None:
    expected = fts5_tokens_many(FIXED_CASES)
    for text, exp in zip(FIXED_CASES, expected):
        assert tokenize(text) == exp, repr(text)


def test_fuzz_matches_fts5() -> None:
    rng = random.Random(20260816)
    ranges = [
        (32, 0x2FF),
        (0x300, 0x5FF),
        (0x1E00, 0x206F),
        (0x3040, 0x30FF),
        (0x1F300, 0x1F64F),
        (0x10000, 0x10500),
        (48, 122),
    ]
    texts = []
    for _ in range(500):
        n = rng.randint(1, 40)
        lo, hi = rng.choice(ranges)
        texts.append("".join(chr(rng.randint(*rng.choice(ranges))) for _ in range(n)))
    expected = fts5_tokens_many(texts)
    for text, exp in zip(texts, expected):
        assert tokenize(text) == exp, repr(text)


def test_compile_query_reference_semantics() -> None:
    # reference sqlite_store.py:239-243: \w+ extraction
    assert compile_query("cache ttl") == ["cache", "ttl"]
    assert compile_query("streamable-http") == ["streamable", "http"]
    assert compile_query("python mcp agent file .agent.md") == [
        "python", "mcp", "agent", "file", "agent", "md",
    ]
    assert compile_query("server setup, tools registration") == [
        "server", "setup", "tools", "registration",
    ]
    assert compile_query('"streamable-http') == ["streamable", "http"]
    # punctuation-only -> [] -> empty result (reference test_search_modes.py:146-156)
    assert compile_query('.,:()"') == []
    # \w includes '_' but the index tokenizer splits it
    assert compile_query("foo_bar") == ["foo", "bar"]
    # diacritics folded to index form
    assert compile_query("Café") == ["cafe"]
