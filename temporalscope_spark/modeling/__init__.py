"""Spark-native modeling: closed-form linear training + exact linear SHAP
+ IRLS logistic classification.

The reference reserves this surface in its (commented-out)
``TemporalModelTrainer`` (/root/reference/src/temporalscope/modeling/
temporal_model_trainer.py:18-115, LightGBM-based). Neither LightGBM nor any
model stack exists in this container, so the engine ships the model families
whose training is a (few) Spark aggregation(s): ridge/OLS linear regression
(one job, :mod:`temporalscope_spark.modeling.linear`) and binary logistic
regression via IRLS (one job per Newton round,
:mod:`temporalscope_spark.modeling.logistic`).
"""

from temporalscope_spark.modeling.linear import (
    LinearModel,
    TemporalModelTrainer,
    fit_linear,
    linear_shap_importance,
)
from temporalscope_spark.modeling.bt import (
    bt_comparison_matrix,
    bt_win_probability,
    fit_bradley_terry,
)
from temporalscope_spark.modeling.logistic import (
    LogisticModel,
    fit_logistic,
    irls_step,
)
from temporalscope_spark.modeling.naive_bayes import nb_classify, nb_fit, nb_score
from temporalscope_spark.modeling.als import (
    als_half_round,
    als_round,
    als_seed_factors,
)
from temporalscope_spark.modeling.quantile import (
    QuantileModel,
    fit_quantile,
    quantile_step,
)
from temporalscope_spark.modeling.poisson import (
    PoissonModel,
    fit_poisson,
    poisson_step,
)

__all__ = [
    "bt_comparison_matrix", "fit_bradley_terry", "bt_win_probability",
    "LinearModel",
    "LogisticModel",
    "TemporalModelTrainer",
    "fit_linear",
    "fit_logistic",
    "irls_step",
    "linear_shap_importance",
    "nb_classify",
    "nb_fit",
    "nb_score",
    "PoissonModel",
    "fit_poisson",
    "poisson_step",
    "als_half_round",
    "als_round",
    "als_seed_factors",
    "QuantileModel",
    "fit_quantile",
    "quantile_step",
]
