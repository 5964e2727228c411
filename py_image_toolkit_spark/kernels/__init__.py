"""Pure-Python parse kernels shared by the single-node oracle and the
Arrow-batched Spark UDF stages.

These are the only pieces of the pipeline that genuinely need Python
(HTML/PDF parsing has no Column-expression equivalent); everything downstream
— block scoring, main-block selection, window geometry, token labeling,
run-merge, pivot — is pure DataFrame/Column code in ``operators/`` and is
*independently* implemented by the oracle for byte-parity testing.
"""
