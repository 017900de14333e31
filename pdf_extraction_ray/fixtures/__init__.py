from .generator import generate_docs_table, corpus_path, ensure_corpus  # noqa: F401
from .golden import golden_extract_doc, golden_extract_table  # noqa: F401
