"""Spark-native modeling: closed-form linear training + exact linear SHAP.

The reference reserves this surface in its (commented-out)
``TemporalModelTrainer`` (/root/reference/src/temporalscope/modeling/
temporal_model_trainer.py:18-115, LightGBM-based). Neither LightGBM nor any
model stack exists in this container, so the engine ships the model family
that IS closed-form trainable inside a Spark aggregation: ridge/OLS linear
regression. See :mod:`temporalscope_spark.modeling.linear`.
"""

from temporalscope_spark.modeling.linear import (
    LinearModel,
    TemporalModelTrainer,
    fit_linear,
    linear_shap_importance,
)

__all__ = [
    "LinearModel",
    "TemporalModelTrainer",
    "fit_linear",
    "linear_shap_importance",
]
