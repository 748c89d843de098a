"""Deterministic synthetic source-code corpus (fixtures F1-F3).

The engine's input is a table of source-code repositories with columns
``(repo, path, commit, lang, content)``.  No external data is used:
this module synthesizes that table deterministically (seeded) at any
scale, mirroring the *shape* of the reference's labeled corpus
(``/root/reference/data/sourcecode/case-NN/{original,plagiarized/L1..L6,
non-plagiarized}`` — 467 Java files) and its synthetic-pair
transformations (``/root/reference/scripts/generate_synthetic_pairs.py:21-60``).

Generation is row-deterministic: file *i* depends only on ``(seed, i)``,
so the same corpus is produced at any partitioning / parallelism level.
The generator runs distributed via ``mapInPandas`` over ``spark.range``.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["java", "python", "cpp", "go"]
_EXT = {"java": "java", "python": "py", "cpp": "cpp", "go": "go"}

# Hot-term head (to exercise skew salting) + a mid/tail vocabulary.
HOT_TERMS = ["return", "int", "public", "value", "result", "data", "index"]
_PREFIX = ["load", "parse", "merge", "scan", "sort", "hash", "join", "split",
           "read", "write", "encode", "decode", "pack", "flush", "score",
           "rank", "batch", "chunk", "probe", "build", "fetch", "emit"]
_NOUN = ["buffer", "segment", "record", "column", "table", "posting", "block",
         "cursor", "stream", "vector", "matrix", "token", "query", "shard",
         "offset", "length", "window", "bucket", "digest", "payload", "frame",
         "header", "footer", "lexeme", "corpus"]
_SUFFIX = ["impl", "util", "mgr", "ctx", "node", "item", "spec", "info",
           "meta", "stat", "conf", "pool"]


def _vocab_word(rng: random.Random) -> str:
    """Zipf-ish draw: hot head with high probability, tail otherwise."""
    r = rng.random()
    if r < 0.30:
        return rng.choice(HOT_TERMS)
    if r < 0.75:
        return rng.choice(_PREFIX) if rng.random() < 0.5 else rng.choice(_NOUN)
    return f"{rng.choice(_NOUN)}{rng.randrange(40)}"


def _identifier(rng: random.Random, style: str) -> str:
    words = [_vocab_word(rng) for _ in range(rng.randrange(1, 4))]
    words = [w for w in words if w]
    if style == "camel":
        return words[0] + "".join(w.capitalize() for w in words[1:])
    return "_".join(words)


def _statement(rng: random.Random, lang: str, rare: str | None = None) -> str:
    style = "snake" if lang in ("python", "cpp") else "camel"
    a, b, c = (_identifier(rng, style) for _ in range(3))
    if rare:
        a = rare
    kind = rng.randrange(5)
    if lang == "python":
        return [
            f"{a} = {b} + {c}",
            f"{a} = {b}({c}, {rng.randrange(100)})",
            f"for i in range({rng.randrange(2, 50)}): {a} += {b}",
            f"if {a} > {rng.randrange(100)}: {b} = {c}",
            f"{a} = '{_vocab_word(rng)} {_vocab_word(rng)}'",
        ][kind]
    semi = ";" if lang != "go" else ""
    decl = {"java": "int", "cpp": "int", "go": "var"}[lang]
    return [
        f"{decl} {a} = {b} + {c}{semi}",
        f"{a} = {b}({c}, {rng.randrange(100)}){semi}",
        f"{a} += {b} * {rng.randrange(2, 9)}{semi}",
        f"if ({a} > {rng.randrange(100)}) {{ {b} = {c}{semi} }}",
        f'{decl} {a} = "{_vocab_word(rng)} {_vocab_word(rng)}"{semi}',
    ][kind]


def _render(lang: str, name: str, stmts: list[str], comments: list[str]) -> str:
    """Assemble a source file with comments + a string literal header."""
    if lang == "python":
        body = "\n    ".join(stmts)
        cs = "\n".join(f"# {c}" for c in comments)
        return f'"""{name} module."""\n{cs}\n\ndef {name.lower()}_main(arg):\n    {body}\n    return arg\n'
    cmt = "\n".join(f"// {c}" for c in comments)
    body = "\n        ".join(stmts)
    if lang == "java":
        return (f"/* {name} generated */\n{cmt}\npublic class {name} {{\n"
                f"    public int run(int arg) {{\n        {body}\n        return arg;\n    }}\n}}\n")
    if lang == "cpp":
        return (f"/* {name} */\n{cmt}\n#include <vector>\nint {name.lower()}_run(int arg) {{\n"
                f"        {body}\n        return arg;\n}}\n")
    return (f"// {name}\n{cmt}\npackage corpus\n\nfunc {name}Run(arg int) int {{\n"
            f"        {body}\n        return arg\n}}\n")


def gen_file(i: int, seed: int = 42, stmts_range: tuple[int, int] = (6, 26)) -> dict:
    """Deterministically generate corpus file *i* (row of F1)."""
    rng = random.Random((seed << 32) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))
    repo = f"org{i % 7}/repo{i % 23}"
    lang = LANGS[rng.randrange(len(LANGS))]
    pkg = rng.choice(_NOUN)
    name = f"{rng.choice(_PREFIX).capitalize()}{rng.choice(_NOUN).capitalize()}{i}"
    path = f"src/{pkg}/{name}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()[:12]
    n_stmts = rng.randrange(*stmts_range)
    # ~3% of files carry a unique rare term (rare-term query targets)
    rare = f"zqrareterm{i}" if rng.random() < 0.03 else None
    stmts = [_statement(rng, lang, rare if j == 0 else None) for j in range(n_stmts)]
    comments = [" ".join(_vocab_word(rng) for _ in range(rng.randrange(3, 8)))
                for _ in range(rng.randrange(1, 4))]
    content = _render(lang, name, stmts, comments)
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": content}


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def make_corpus(spark: SparkSession, n_files: int, seed: int = 42,
                partitions: int | None = None,
                stmts_range: tuple[int, int] = (6, 26),
                start: int = 0) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range -> mapInPandas``.

    ``start`` offsets the file-id range (rows ``start..start+n_files``),
    so overlapping / disjoint corpus slices for incremental-ingest
    benchmarks come from the same deterministic generator."""
    rng_seed = seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [gen_file(int(i), rng_seed, stmts_range) for i in pdf["id"]]
            )

    rng = spark.range(start, start + n_files, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# F2 — plagiarism-case corpus (IR-Plag-shaped)
# ---------------------------------------------------------------------------

def _rename_identifiers(content: str, rng: random.Random) -> str:
    """L1-style disguise: suffix every generated identifier."""
    import re as _re
    sfx = f"X{rng.randrange(10)}"

    def sub(m):
        w = m.group(0)
        if w in ("public", "class", "int", "return", "if", "for", "def",
                 "var", "func", "package", "include", "vector", "range",
                 "String", "in", "arg", "run"):
            return w
        return w + sfx

    return _re.sub(r"[A-Za-z_][A-Za-z0-9_]*", sub, content)


def _strip_comments(content: str) -> str:
    import re as _re
    out = _re.sub(r"/\*.*?\*/|//[^\n]*|#[^\n]*", "", content, flags=_re.DOTALL)
    return _re.sub(r"\n\s*\n", "\n", out)


def _reorder_statements(content: str, rng: random.Random) -> str:
    lines = content.split("\n")
    body = [i for i, l in enumerate(lines) if l.startswith("        ") or l.startswith("    ")]
    if len(body) > 3:
        vals = [lines[i] for i in body]
        rng.shuffle(vals)
        for i, v in zip(body, vals):
            lines[i] = v
    return "\n".join(lines)


def gen_plag_case(case_id: int, seed: int = 42) -> list[dict]:
    """One IR-Plag-shaped case: original + L1..L6 variants + non-plag files.

    Mirrors ``/root/reference/data/sourcecode/case-NN/`` layout and the
    transformation families of ``generate_synthetic_pairs.py:46-51``.
    """
    base_i = 10_000_000 + case_id * 1000
    orig = gen_file(base_i, seed)
    rows = [dict(orig, case_id=case_id, label="original", level=None, variant=0)]
    for level in range(1, 7):
        for variant in range(1, 4):
            rng = random.Random((seed << 20) ^ (case_id * 131 + level * 17 + variant))
            c = orig["content"]
            if level >= 1:
                c = _rename_identifiers(c, rng)
            if level in (2, 5, 6):
                c = _strip_comments(c)
            if level in (3,):
                c = c + f"\n// extra {' '.join(_vocab_word(rng) for _ in range(5))}\n"
            if level >= 4:
                c = _reorder_statements(c, rng)
            if level == 6:  # heavy: drop lines + noise
                lines = [l for l in c.split("\n") if rng.random() > 0.25]
                noise = [_statement(rng, orig["lang"]) for _ in range(4)]
                c = "\n".join(lines + noise)
            rows.append(dict(orig, content=c, case_id=case_id, label="plagiarized",
                             level=level, variant=variant,
                             path=orig["path"].replace(".", f"_L{level}_{variant}.")))
    for variant in range(1, 16):
        f = gen_file(base_i + 100 + variant, seed)
        rows.append(dict(f, case_id=case_id, label="non_plagiarized", level=None,
                         variant=variant))
    return rows


def make_plag_corpus(spark: SparkSession, n_cases: int = 7, seed: int = 42) -> DataFrame:
    rows = [r for c in range(1, n_cases + 1) for r in gen_plag_case(c, seed)]
    pdf = pd.DataFrame(rows)
    pdf["level"] = pdf["level"].astype("Int32")
    return spark.createDataFrame(
        pdf, schema=CORPUS_SCHEMA + ", case_id int, label string, level int, variant int")


# ---------------------------------------------------------------------------
# F4 — labeled quality-calibration corpus
# ---------------------------------------------------------------------------

def make_quality_labeled(
    spark: SparkSession, n_clean: int = 200, n_noise: int = 200, seed: int = 42
) -> DataFrame:
    """(doc_id, text, noisy, noise_kind) — clean source files vs three
    synthetic noise families: token-shuffled (structure destroyed, bag
    of words intact), truncated fragments, and boilerplate repetition.
    The engine's stand-in for the reference's labeled calibration data
    (``/root/reference/fine_tuner.py:580-643`` sweeps thresholds against
    labeled pairs).  Deterministic per (seed, row)."""
    rows = []
    for i in range(n_clean):
        rows.append(
            {
                "doc_id": i,
                "text": gen_file(i, seed)["content"],
                "noisy": 0,
                "noise_kind": "clean",
            }
        )
    for j in range(n_noise):
        rng = random.Random((seed << 8) ^ (j * 2654435761))
        src = gen_file(500_000 + j, seed)["content"]
        kind = j % 3
        if kind == 0:  # token shuffle: same bag of words, no structure
            toks = src.split()
            rng.shuffle(toks)
            text, nk = " ".join(toks), "shuffled"
        elif kind == 1:  # truncated fragment (below any length gate)
            text, nk = src[: rng.randrange(4, 30)], "truncated"
        else:  # boilerplate repetition (degenerate distinct ratio)
            phrase = " ".join(_vocab_word(rng) for _ in range(4))
            text, nk = ((phrase + "\n") * rng.randrange(30, 80)), "repeated"
        rows.append(
            {"doc_id": n_clean + j, "text": text, "noisy": 1, "noise_kind": nk}
        )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="doc_id long, text string, noisy int, noise_kind string",
    )


# ---------------------------------------------------------------------------
# F3 — reference query set
# ---------------------------------------------------------------------------

def make_queries(spark: SparkSession, corpus_n: int, n_queries: int = 40,
                 seed: int = 42) -> DataFrame:
    """Query mix: verbatim / renamed snippets, hot-term, rare-term, multi-term."""
    rows = []
    for q in range(n_queries):
        rng = random.Random((seed << 16) ^ (q * 7919))
        kind = q % 5
        if kind in (0, 1):  # (a) verbatim, (b) renamed snippet of a corpus doc
            i = rng.randrange(corpus_n)
            f = gen_file(i, seed)
            stmts = [l.strip() for l in f["content"].split("\n")
                     if l.startswith(("        ", "    "))][:4]
            text = " ".join(stmts)
            if kind == 1:
                text = _rename_identifiers(text, rng)
        elif kind == 2:  # (c) hot-term-only
            text = " ".join(rng.choice(HOT_TERMS) for _ in range(4))
        elif kind == 3:  # (d) rare-term
            text = f"zqrareterm{rng.randrange(corpus_n)} {rng.choice(_NOUN)}"
        else:  # (e) multi-term conjunction across partitions
            text = " ".join(_vocab_word(rng) for _ in range(6))
        rows.append({"query_id": q, "query_text": text, "k": 10})
    return spark.createDataFrame(pd.DataFrame(rows),
                                 schema="query_id long, query_text string, k int")
