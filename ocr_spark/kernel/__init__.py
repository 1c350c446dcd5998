"""Pure-pandas extraction kernel.

Every text-semantics function the Spark pipeline needs lives here, with NO
pyspark imports, so that (a) the golden-fixture generator and the Spark
UDFs share one implementation, and (b) regex semantics stay in Python `re`
(dialect drift between Python and Java regex is the #1 span-equality risk,
SURVEY.md §7.3).

Functions take/return pandas Series or DataFrames and are batch-vectorized:
patterns are compiled once at import, and per-element work happens inside
pandas' C string loops or tight `map` calls over an Arrow batch — never per
Spark row.
"""

from ocr_spark.kernel import basic, htmlx, llm, pdfdoc, swiss, textnorm  # noqa: F401
