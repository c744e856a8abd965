from leader_graph_spark.functions import scalar, text

__all__ = ["scalar", "text"]
