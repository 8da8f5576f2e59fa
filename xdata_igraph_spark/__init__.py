"""xdata_igraph_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the query surface of igraph/xdata-igraph
(reference: /root/reference, a single-process in-memory C library) as an
idiomatic Spark DataFrame engine:

- the graph is a columnar edge table ``edges(src: long, dst: long,
  weight: double)`` (the reference stores exactly this as two parallel
  C arrays, include/igraph_datatype.h:78-88) plus a vertex table
  ``vertices(id: long)``;
- iterative algorithms (PageRank, connected components, label
  propagation, k-core) are superstep loops of DataFrame join+aggregate
  message passing, checkpointed and resumable (plans/superstep.py);
- one-shot analytics (triangles, similarity, scan statistics,
  degree/strength, set operations) are plain relational plans that
  Catalyst optimizes.

Nothing is ported from the reference's C core; file:line citations in
docstrings point at the *semantics* being matched.
"""

from xdata_igraph_spark.plans.checkpointing import install as _install_flat_checkpoint

_install_flat_checkpoint()

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.session import get_spark

__all__ = ["LinkGraph", "get_spark"]
__version__ = "0.1.0"
