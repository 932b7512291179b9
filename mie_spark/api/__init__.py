from mie_spark.api.client import MieClient

__all__ = ["MieClient"]
