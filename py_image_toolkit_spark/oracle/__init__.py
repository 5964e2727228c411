"""Single-node pure-Python oracle (SURVEY.md §5.2.1).

Implements the full E1→E3 extraction semantics independently of the Spark
engine: geometry/selection/labeling/merge/pivot are plain sequential Python
here (faithful to the reference's verified semantics, including its quirks)
while the engine re-expresses them as Column/Window code. pytest asserts the
two produce byte-identical extracted text, spans and fields per url.
"""

from py_image_toolkit_spark.oracle.extractor import extract_document, extract_pages

__all__ = ["extract_document", "extract_pages"]
