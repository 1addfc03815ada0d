from temporalscope_spark.metrics.classification import (
    auc_by_group,
    auc_roc,
    calibration_report,
    cohen_kappa,
    cronbach_alpha,
    fleiss_kappa,
    mcnemar_test,
    calibrate_scores,
    fit_isotonic_bins,
    lift_table,
    pr_curve,
    regression_metrics,
    reliability_curve,
)
from temporalscope_spark.metrics.conformal import conformal_interval
from temporalscope_spark.metrics.forecast import forecast_eval
from temporalscope_spark.metrics.masv import abs_deviation_importance, calculate_masv
from temporalscope_spark.metrics.ranking import ranking_eval, rrf_fuse

__all__ = [
    "abs_deviation_importance", "calculate_masv",
    "auc_roc", "auc_by_group", "reliability_curve", "lift_table",
    "fit_isotonic_bins", "calibrate_scores", "pr_curve", "regression_metrics",
    "ranking_eval", "rrf_fuse", "forecast_eval", "conformal_interval",
    "cohen_kappa", "mcnemar_test", "calibration_report", "fleiss_kappa", "cronbach_alpha",
]
