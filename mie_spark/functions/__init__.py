from mie_spark.functions.vectors import cosine_sim, dot, l2_norm, l2_normalize

__all__ = ["cosine_sim", "dot", "l2_norm", "l2_normalize"]
