"""Section detection for code (SURVEY §2.2 P6 + §2.6 A13).

The reference detects academic section headings with per-pattern
confidence, removes overlaps, slices content, and summarizes
(``/root/reference/ingestion/section_parser.py:44-165,221-252``).  The
source-code analog detects function / class / method boundaries per
language via anchored regexes with per-pattern confidence, resolves
overlaps with the same greedy rule, and slices section bodies.

Detection is a Catalyst expression per pattern (``regexp_extract_all``
over line starts is approximated with ``posexplode(split(lines))`` +
``regexp`` matches — fully declarative); only the greedy overlap
resolution reuses :func:`docinsight_spark.operators.chunking.
remove_overlapping_spans`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (section_type, line-anchored regex, confidence) per language family —
# analog of ACADEMIC_SECTIONS + confidence scoring (config.py:323-331).
SECTION_PATTERNS = [
    ("class", r"^\s*(public\s+|private\s+)?(abstract\s+)?class\s+\w+", 0.95),
    ("function", r"^\s*def\s+\w+\s*\(", 0.95),
    ("function", r"^\s*func\s+\w+\s*\(", 0.95),
    ("method", r"^\s*(public|private|protected)\s+[\w<>\[\]]+\s+\w+\s*\(", 0.85),
    ("function", r"^\s*(int|void|float|double|bool|auto)\s+\w+\s*\(", 0.80),
    ("comment_header", r"^\s*(/\*|//|#)\s*[-=*]{3,}", 0.60),
]


def detect_sections(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, line_no, section_type, confidence, header) — candidate section
    starts; highest-confidence pattern wins per line."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    match = None
    for stype, pat, conf in SECTION_PATTERNS:
        cand = F.when(
            F.col("line").rlike(pat),
            F.struct(F.lit(conf).alias("confidence"), F.lit(stype).alias("stype")),
        )
        match = cand if match is None else F.coalesce(
            F.when(
                cand.isNotNull()
                & (match.isNull() | (cand["confidence"] > match["confidence"])),
                cand,
            ),
            match,
        )
    return (
        lines.withColumn("_m", match)
        .filter(F.col("_m").isNotNull())
        .select(
            "id", "line_no",
            F.col("_m.stype").alias("section_type"),
            F.col("_m.confidence").alias("confidence"),
            F.trim(F.col("line")).alias("header"),
        )
    )


def slice_sections(df: DataFrame, id_col: str, text_col: str,
                   min_lines: int = 1) -> DataFrame:
    """Sections with bodies: each detected start extends to the next
    start (or EOF) — the reference's content slicing
    (``section_parser.py:117-165``)."""
    starts = detect_sections(df, id_col, text_col)
    w = Window.partitionBy("id").orderBy("line_no")
    bounded = starts.withColumn(
        "end_line", F.coalesce(F.lead("line_no").over(w) - 1, F.lit(2 ** 31 - 1))
    )
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    joined = bounded.alias("s").join(
        lines.alias("l"),
        (F.col("s.id") == F.col("l.id"))
        & (F.col("l.line_no") >= F.col("s.line_no"))
        & (F.col("l.line_no") <= F.col("s.end_line")),
    )
    return (
        joined.groupBy(
            "s.id", "s.line_no", "s.section_type", "s.confidence", "s.header"
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("l.line_no", "l.line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("body"),
        )
        .filter(F.col("n_lines") >= min_lines)
        .select(
            F.col("id"), F.col("line_no").alias("start_line"), "section_type",
            "confidence", "header", "n_lines", "body",
        )
    )


def section_summary(sections: DataFrame) -> DataFrame:
    """A13: totals, per-type counts, average confidence
    (``section_parser.py:221-252``)."""
    return sections.groupBy("section_type").agg(
        F.count(F.lit(1)).alias("n_sections"),
        F.round(F.avg("confidence"), 4).alias("avg_confidence"),
        F.sum("n_lines").alias("total_lines"),
    )
