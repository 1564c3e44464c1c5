from goconnect_spark.functions import serde, text, vector

__all__ = ["text", "vector", "serde"]
