"""pdf_extraction_ray — a Ray-Data-native main-content extraction engine.

Brand-new engine (not a port) with the data-processing capabilities of the
GoldSurfer2/pdf-extraction reference (see SURVEY.md). Streams tables of
interleaved text+media documents ``(doc_id, spans)`` through
``ray.data.Dataset.map_batches`` pipelines over zero-copy Arrow batches:

- ``stages.tokenize``  — vectorized span tokenizer / boilerplate + title
  classifier (stateless tasks)
- ``stages.layout``    — layout-parse stage (vector-grid table/figure
  detection, evidence classifier, stub OCR) as a stateful actor pool
- ``stages.reassemble``— ordered ``(kind, text, media_ref, offset)`` span
  emission
- ``pipelines.extract``— the flagship end-to-end pipeline
- ``functions.*``      — pure vectorized kernels (text stats, dedup hashes,
  geometry) shared by stages and the relational query layer

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
