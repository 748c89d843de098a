from docinsight_spark.functions.tokenizer import (
    code_tokens_udf,
    simple_tokens_col,
    tokenize_code_pandas,
)
from docinsight_spark.functions.bm25 import bm25_score_col, bm25_idf_col

__all__ = [
    "code_tokens_udf",
    "simple_tokens_col",
    "tokenize_code_pandas",
    "bm25_score_col",
    "bm25_idf_col",
]
