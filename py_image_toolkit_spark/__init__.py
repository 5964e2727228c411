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
semantics allow (selection, geometry, labeling, merge, pivot all HAVE pure
Column/Window forms, SQL-cross-validated), Arrow-batched ``mapInPandas``
where Python wins. Because no extraction step crosses document boundaries,
the production default (``ExtractConfig.extract_impl="doc"``,
operators/doc_kernel.py) fuses the whole per-document pipeline into ONE
Arrow stage — zero wide shuffles, measured scaling efficiency 0.822
local[4]→local[16]. To be precise about where Python sits: that stage
applies per-document Python inside the Arrow batches — the measured
per-stage split (BENCH/BASELINE.md round-3 section) shows ~60% of it is the
irreducible HTML/PDF parse, and the impl-comparison table there records why
the one-stage form beats the staged Column forms at equal cores (the staged
plans pay a corpus-wide text shuffle to reach the JVM operators). The
staged Column/Window forms remain the SQL-verifiable decomposition and are
selectable (``extract_impl="fused"|"columns"``). A pure-Python single-node
oracle (``py_image_toolkit_spark.oracle``) defines byte-identical truth;
pytest asserts engine == oracle per url.
"""

__version__ = "0.1.0"
