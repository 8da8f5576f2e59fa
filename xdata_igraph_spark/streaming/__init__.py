from xdata_igraph_spark.streaming.ingest import (
    hash_edges_from_pages,
    stream_pages_to_edges,
    stream_link_rate,
)

__all__ = ["hash_edges_from_pages", "stream_pages_to_edges", "stream_link_rate"]
