from .tokenize import spark_tokenize_col, tokenize_pandas_udf  # noqa: F401
