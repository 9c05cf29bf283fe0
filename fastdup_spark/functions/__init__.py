from fastdup_spark.functions.extract import extract_text_udf, ERR_DECODE, ERR_NO_TEXT, ERR_EMPTY
from fastdup_spark.functions.signatures import (
    normalize_tokens_expr,
    shingles_expr,
    make_minhash_udf,
    make_simhash_udf,
)
from fastdup_spark.functions.similarity import (
    exact_jaccard_expr,
    sig_jaccard_expr,
    hamming_expr,
    cosine_expr,
)

__all__ = [
    "extract_text_udf", "ERR_DECODE", "ERR_NO_TEXT", "ERR_EMPTY",
    "normalize_tokens_expr", "shingles_expr", "make_minhash_udf", "make_simhash_udf",
    "exact_jaccard_expr", "sig_jaccard_expr", "hamming_expr", "cosine_expr",
]
