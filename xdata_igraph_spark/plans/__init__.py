from xdata_igraph_spark.plans.superstep import SuperstepRunner

__all__ = ["SuperstepRunner"]
