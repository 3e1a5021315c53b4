"""PySpark-native combat-log analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference SWTOR combat-log parser (JudgeGregg/Team-Goldo-Combat-Log-Parser,
read-only at /root/reference) as a Spark parse -> enrich -> route -> aggregate
DAG over tables of pre-tokenized byte sequences:

    (doc_id string, tokens array<int>, n_tok int, source string)

Design: declarative DataFrame plans end-to-end; Python appears only in two
vectorized Arrow/pandas hops (detokenize, and the tiny per-log fight state
machine over marker rows). Everything else is whole-stage-codegen'd Spark SQL
expressions, window functions, broadcast joins and hash aggregations.
"""

__version__ = "0.1.0"
