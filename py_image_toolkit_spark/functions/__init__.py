"""Column-expression building blocks (geometry, labeling, vocab).

Everything in this package is pure ``pyspark.sql.functions`` / Column code —
JVM-side, whole-stage-codegen-friendly, zero per-row Python.
"""
