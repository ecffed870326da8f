"""Text-analysis operator semantics pinned on hand-computed examples."""

from __future__ import annotations

from zebra_spark.functions.text import bpe_token_count, token_count


def test_token_counts_pinned(spark):
    rows = [
        (1, "Hello, world!"),          # ws: 2; bpe: Hello , _world !
        (2, ""),                       # 0 / 0
        (3, "   "),                    # ws 0; bpe: one whitespace run
        (4, "a1b2"),                   # ws 1; bpe: a 1 b 2
        (5, "don't stop"),             # ws 2; bpe: don ' t _stop
        (6, "x  y"),                   # ws 2; bpe: x _ _y -> 'x',' y' + ws run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ws = {r.doc_id: r.n_tokens for r in token_count(df).collect()}
    assert ws == {1: 2, 2: 0, 3: 0, 4: 1, 5: 2, 6: 2}
    got = {
        r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe)
        for r in bpe_token_count(df).collect()
    }
    # pattern: " ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
    assert got == {
        1: (2, 4),   # "Hello" "," " world" "!"
        2: (0, 0),
        3: (0, 1),   # "   " one whitespace run
        4: (1, 4),   # "a" "1" "b" "2"
        5: (2, 4),   # "don" "'" "t" " stop"
        6: (2, 3),   # "x" " " (ws run of 1 left after " y"?) see below
    }


def test_bpe_pattern_matches_oracle_dialect():
    """The Spark (Java regex) and DuckDB (RE2) tokenizations agree on a
    unicode + punctuation torture string — the property the driver's
    hash-exact oracle relies on."""
    import duckdb

    from zebra_spark.functions.text import BPE_ISH_PATTERN

    text = "Café 42 --- don't\tstop\nüüber 3.14!"
    got = duckdb.execute(
        "SELECT regexp_extract_all(?, ?)", [text, BPE_ISH_PATTERN]
    ).fetchone()[0]
    import re

    ref = [m.group(0) for m in re.finditer(BPE_ISH_PATTERN, text)]
    assert got == ref and "".join(ref) == text
