from goconnect_spark.plans.coders import Coder, CoderRegistry, TypeTag, default_registry

__all__ = ["Coder", "CoderRegistry", "TypeTag", "default_registry"]
