from .extract import extract_pipeline, run_extract  # noqa: F401
