from astra_perseverance_spark.conformed.model import ConformedModel, load_model

__all__ = ["ConformedModel", "load_model"]
