from lakeshack_spark.functions.deterministic import dsum, davg

__all__ = ["dsum", "davg"]
