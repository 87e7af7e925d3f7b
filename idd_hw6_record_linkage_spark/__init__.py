"""PySpark-native record-linkage / entity-resolution engine.

A from-scratch re-expression of the query semantics of the reference
pipeline ``giug2/idd-hw6-record-linkage`` (schema mediation, text
cleaning, multi-pass blocking, pairwise similarity scoring, match
classification, transitive clustering, P/R/F1 evaluation) as idiomatic
Spark DataFrame programs over Common-Crawl-style web-page tables.

The reference is eager pandas with row-at-a-time loops; here every
stage is a declarative DataFrame plan (Catalyst-optimized, AQE-enabled)
and the only Python on the hot path is Arrow-batched pandas UDFs for
the string-similarity comparators that Spark lacks natively.
"""

__version__ = "0.1.0"
