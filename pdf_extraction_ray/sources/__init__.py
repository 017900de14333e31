from .io import read_docs, write_docs, dataset_from_text_table  # noqa: F401
