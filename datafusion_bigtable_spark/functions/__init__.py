from datafusion_bigtable_spark.functions import multimodal, text

__all__ = ["multimodal", "text"]
