"""Scalar/column function library (SURVEY.md §2.1 R5-R18, §2.2 C26-C31).

Everything here is a composition of built-in `pyspark.sql.functions`
(JVM-side, whole-stage-codegen friendly) unless a kernel is irreducibly
Python — those live in `lemmatize.py` (Arrow-batched pandas UDFs).
"""
