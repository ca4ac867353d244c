from keywords4cv_spark.index.build import build_index, load_index  # noqa: F401
