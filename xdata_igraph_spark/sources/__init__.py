from xdata_igraph_spark.sources.corpus import read_pages, synthetic_pages
from xdata_igraph_spark.sources.readers import read_edgelist, read_ncol
from xdata_igraph_spark.sources.writers import write_edgelist, write_ncol

__all__ = ["synthetic_pages", "read_pages", "read_edgelist", "read_ncol", "write_edgelist", "write_ncol"]
