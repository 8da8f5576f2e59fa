from xdata_igraph_spark.functions.extract import extract_text, extract_links

__all__ = ["extract_text", "extract_links"]
