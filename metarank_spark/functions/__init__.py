from metarank_spark.functions.text import (  # noqa: F401
    fingerprint_expr,
    token_ids_expr,
    tokenized_sequences,
    words_expr,
)
