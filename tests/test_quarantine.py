"""S8 error isolation + A12 mask summary."""

import pandas as pd

from docinsight_spark.functions.tokenizer import mask_summary_pandas
from docinsight_spark.sources.quarantine import (
    quarantine_counters,
    split_quarantined,
    with_quarantine,
)


def test_quarantine_routes_bad_rows(spark):
    df = spark.createDataFrame(
        [(0, "10"), (1, "x"), (2, "30"), (3, None)], "id long, v string"
    )

    def parse(v):
        return str(int(v) * 2)

    out = with_quarantine(df, parse, "v", "parsed")
    clean, bad = split_quarantined(out)
    c = clean.toPandas().sort_values("id")
    assert c["id"].tolist() == [0, 2]
    assert c["parsed"].tolist() == ["20", "60"]
    b = bad.toPandas().sort_values("id")
    assert b["id"].tolist() == [1, 3]
    counters = quarantine_counters(bad).toPandas().set_index("error_class")["n"]
    assert counters.get("ValueError", 0) == 1
    assert counters.get("TypeError", 0) == 1


def test_mask_summary_counts():
    src = pd.Series([
        'int a = 1; // one\n/* block */ String s = "txt"; # not-c-but-counted',
        "no comments here",
        None,
    ])
    out = mask_summary_pandas(src)
    assert out["n_line_comment"].tolist()[0] >= 1
    assert out["n_block_comment"].tolist()[0] == 1
    assert out["n_string_literal"].tolist()[0] >= 1
    assert out.iloc[1].sum() == 0
    assert out.iloc[2].sum() == 0
