from temporalscope_spark.metrics.masv import abs_deviation_importance, calculate_masv

__all__ = ["abs_deviation_importance", "calculate_masv"]
