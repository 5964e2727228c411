"""py_image_toolkit_spark — a from-scratch PySpark-native web-text extraction engine.

Re-expresses the capabilities of the reference ``w3labkr/py-image-toolkit``
(a batch CLI of image stages: resize/crop/ocr/optimize — see SURVEY.md) as
vectorized document-extraction stages over a Common-Crawl-style ``pages``
table:

- E1 **normalize**  (≙ resize.py):   charset detect + decode html:binary →
  canonical text; strip script/style/comments.
- E2 **select**     (≙ crop.py):     segment into blocks, score by text/link
  density, pick the main block, expand to an optimal 2-D window
  (rule-of-thirds / golden-ratio positional priors, padding) and extract the
  char span.
- E3 **extract**    (≙ ocr.py):      ordered token labeling + run-merge +
  first-wins pivot to one structured record per url.
- E4 **encode**     (≙ optimize.py): per-format writer options; snapshot
  commit; skip-if-exists resume via anti-join.

Architecture is Spark-first: DataFrame/Column expressions wherever the
semantics allow (selection, geometry, labeling, merge, pivot are all pure
Column/Window code — zero per-row Python on the hot path), Arrow-batched
``mapInPandas`` only where Python is genuinely needed. Because no extraction
step crosses document boundaries, the production default
(``ExtractConfig.extract_impl="doc"``, operators/doc_kernel.py) fuses the
whole per-document pipeline into ONE Arrow stage — zero wide shuffles,
measured scaling efficiency 0.822 local[4]→local[16] — while the staged
Column/Window forms remain the SQL-verifiable decomposition. A pure-Python
single-node oracle (``py_image_toolkit_spark.oracle``) defines
byte-identical truth; pytest asserts engine == oracle per url.
"""

__version__ = "0.1.0"
