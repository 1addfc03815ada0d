from temporalscope_spark.metrics.classification import (
    auc_roc,
    lift_table,
    reliability_curve,
)
from temporalscope_spark.metrics.masv import abs_deviation_importance, calculate_masv

__all__ = [
    "abs_deviation_importance", "calculate_masv",
    "auc_roc", "reliability_curve", "lift_table",
]
