"""sphinx_1_spark — a from-scratch PySpark-native full-text engine.

Re-implements the *semantics* of Sphinx 0.9.9 (sphinx-for-chinese
lineage, reference at /root/reference) on an idiomatic Spark
architecture: declarative DataFrame plans for index build and BM25
top-k serving, vectorized Arrow/pandas UDFs only for the pieces Spark
genuinely lacks (HTML strip automaton, charset-table tokenizer, MMSEG
CJK segmentation, delta+VLB posting-block codec).

Nothing here is a code port of the reference's C++ execution engine;
reference citations in docstrings (file:line) document *semantic*
parity points only.
"""

__version__ = "0.1.0"

from sphinx_1_spark.plans.engine import SphinxIndex, IndexSettings  # noqa: F401
