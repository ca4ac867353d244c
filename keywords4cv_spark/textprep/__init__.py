from keywords4cv_spark.textprep.normalize import (  # noqa: F401
    generate_ngrams,
    normalize_text,
    tokenize,
)
