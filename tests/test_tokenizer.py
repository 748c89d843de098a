"""Tokenizer unit tests (SURVEY §5 test plan item 1)."""

import pandas as pd

from docinsight_spark.functions.tokenizer import tokenize_code_pandas


def tok(content, lang="java"):
    return tokenize_code_pandas(pd.Series([content]), pd.Series([lang]))[0]


def test_camel_case_split():
    assert tok("int loadBufferImpl = 3;") == ["int", "load", "buffer", "impl", "3"]


def test_snake_case_split():
    assert tok("scan_token_count = probe(x)", "python") == [
        "scan", "token", "count", "probe", "x"
    ]


def test_acronym_boundary():
    assert tok("HTTPServer parseURL") == ["http", "server", "parse", "url"]


def test_line_comment_stripped():
    assert tok("int a = 1; // secretComment here") == ["int", "a", "1"]


def test_block_comment_stripped():
    assert tok("int a; /* multi\nline comment */ int b;") == ["int", "a", "int", "b"]


def test_python_comment_and_docstring():
    src = '"""doc string."""\nx = 1  # trailing note\n'
    assert tok(src, "python") == ["x", "1"]


def test_string_literal_stripped():
    assert tok('String s = "hidden words";') == ["string", "s"]


def test_comment_marker_inside_string_not_comment():
    # the // lives inside the string literal; the trailing code survives
    assert tok('String u = "http://x"; int b;') == ["string", "u", "int", "b"]


def test_empty_and_null():
    out = tokenize_code_pandas(pd.Series(["", None]), pd.Series(["java", "go"]))
    assert list(out) == [[], []]


def test_go_line_comment():
    assert tok("// header\nvar x = y\n", "go") == ["var", "x", "y"]
