"""DatasetValidator — V6, research-backed dataset-quality gates.

Reference: /root/reference/src/temporalscope/datasets/dataset_validator.py
(thresholds :87-122, checks :131-357, fit/transform :368-431). Parity:
same check names, thresholds, pass/fail rules, message wording, and the
sklearn-style fit/transform lifecycle.

Scale fix (BASELINE.md anti-pattern list): the reference runs one
aggregation pass PER COLUMN per check (:148-155, :386-394). Here ``fit`` +
``transform`` compute EVERYTHING in ONE fused Spark job: row count, per-
feature null counts and distinct counts — then every check reads from that
cached stats dict. ``approx_distinct=True`` swaps exact ``count_distinct``
for ``approx_count_distinct`` (HLL) — the 100 TB path; thresholds like
"≥10 unique" tolerate HLL error at that magnitude.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ValidationResult:
    """Container for dataset validation results (reference :35-70)."""

    passed: bool
    message: Optional[str] = None
    details: Optional[Dict[str, Any]] = None
    severity: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "passed": self.passed,
            "message": self.message,
            "details": self.details,
            "severity": self.severity,
        }

    def to_log_entry(self) -> Dict[str, Any]:
        return {
            "validation_passed": self.passed,
            "validation_message": self.message,
            "validation_details": self.details,
            "log_level": self.severity or ("INFO" if self.passed else "WARNING"),
        }

    @classmethod
    def get_failed_checks(cls, results: Dict[str, "ValidationResult"]) -> Dict[str, "ValidationResult"]:
        return {k: r for k, r in results.items() if not r.passed}

    @classmethod
    def get_validation_summary(cls, results: Dict[str, "ValidationResult"]) -> Dict[str, Any]:
        return {
            "total_checks": len(results),
            "passed_checks": sum(1 for r in results.values() if r.passed),
            "failed_checks": sum(1 for r in results.values() if not r.passed),
            "check_details": {k: r.to_dict() for k, r in results.items()},
        }


class DatasetValidator:
    """Dataset-quality validator with fused-aggregate execution."""

    AVAILABLE_CHECKS = {
        "sample_size",
        "feature_count",
        "feature_ratio",
        "feature_variability",
        "class_balance",
    }

    def __init__(
        self,
        time_col: str,
        target_col: str,
        min_samples: int = 3000,
        max_samples: int = 50000,
        min_features: int = 4,
        max_features: int = 500,
        max_feature_ratio: float = 0.1,
        min_unique_values: int = 10,
        checks_to_run: Optional[List[str]] = None,
        enable_warnings: bool = True,
        approx_distinct: bool = False,
    ):
        self.time_col = time_col
        self.target_col = target_col
        self.min_samples = min_samples
        self.max_samples = max_samples
        self.min_features = min_features
        self.max_features = max_features
        self.max_feature_ratio = max_feature_ratio
        self.min_unique_values = min_unique_values
        self.enable_warnings = enable_warnings
        self.approx_distinct = approx_distinct
        if checks_to_run:
            invalid = set(checks_to_run) - self.AVAILABLE_CHECKS
            if invalid:
                raise ValueError(f"Invalid checks: {invalid}")
            self.checks_to_run = set(checks_to_run)
        else:
            self.checks_to_run = set(self.AVAILABLE_CHECKS)
        self._stats: Optional[dict] = None

    # ------------------------------------------------------------------ stats
    def _feature_columns(self, df: DataFrame) -> List[str]:
        return [c for c in df.columns if c not in (self.time_col, self.target_col)]

    def _compute_stats(self, df: DataFrame) -> dict:
        """ONE fused job: row count + per-feature nulls + distincts."""
        feats = self._feature_columns(df)
        distinct = F.approx_count_distinct if self.approx_distinct else F.count_distinct
        aggs = [F.count(F.lit(1)).alias("_n")]
        for f in df.schema.fields:
            c = F.col(f.name)
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                pred = c.isNull() | F.isnan(c)
            else:
                pred = c.isNull()
            aggs.append(F.sum(pred.cast("long")).alias(f"_nulls_{f.name}"))
            if f.name in feats:
                aggs.append(distinct(c).alias(f"_uniq_{f.name}"))
        row = df.agg(*aggs).collect()[0]
        return {
            "n": int(row["_n"]),
            "features": feats,
            "nulls": {f.name: int(row[f"_nulls_{f.name}"] or 0) for f in df.schema.fields},
            "uniq": {c: int(row[f"_uniq_{c}"] or 0) for c in feats},
        }

    # ------------------------------------------------------------- lifecycle
    def fit(self, df: DataFrame) -> "DatasetValidator":
        """Numeric + null gates (reference :368-401) + stats computation."""
        if self.time_col not in df.columns or self.target_col not in df.columns:
            raise ValueError(f"Columns {self.time_col} and {self.target_col} must exist")
        for f in df.schema.fields:
            if f.name == self.time_col:
                continue
            if not isinstance(f.dataType, T.NumericType):
                raise ValueError(f"Column {f.name} must be numeric. Error: static type check")
        self._stats = self._compute_stats(df)
        null_cols = [c for c, n in self._stats["nulls"].items() if n > 0]
        if null_cols:
            raise ValueError(f"Missing values detected in columns: {', '.join(null_cols)}")
        return self

    def transform(self, df: DataFrame, target_col: Optional[str] = None) -> Dict[str, ValidationResult]:
        if self._stats is None:
            self._stats = self._compute_stats(df)
        results: Dict[str, ValidationResult] = {}
        for check in sorted(self.checks_to_run):
            fn = getattr(self, f"_check_{check}")
            if check == "class_balance":
                results[check] = fn(target_col or self.target_col)
            else:
                results[check] = fn()
        return results

    def fit_transform(self, df: DataFrame, target_col: Optional[str] = None) -> Dict[str, ValidationResult]:
        return self.fit(df).transform(df, target_col)

    # ---------------------------------------------------------------- checks
    def _warn(self, msg: str) -> None:
        if self.enable_warnings:
            warnings.warn(msg, stacklevel=3)

    def _check_sample_size(self) -> ValidationResult:
        n = self._stats["n"]
        details = {"num_samples": n}
        if n == 0:
            msg = "Dataset is empty. This is insufficient for any modeling."
            self._warn(msg)
            return ValidationResult(False, msg, details)
        if n < self.min_samples:
            msg = (
                f"Dataset has {n} samples, fewer than recommended minimum ({self.min_samples}). "
                "This may be insufficient for complex models."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        if n > self.max_samples:
            msg = (
                f"Dataset has {n} samples, more than recommended maximum ({self.max_samples}). "
                "Consider using scalable implementations."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _check_feature_count(self) -> ValidationResult:
        k = len(self._stats["features"])
        details = {"num_features": k}
        if k < self.min_features:
            msg = (
                f"Dataset has {k} features, fewer than recommended minimum ({self.min_features}). "
                "This may result in an oversimplified model."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details, "WARNING")
        if k > self.max_features:
            msg = (
                f"Dataset has {k} features, more than recommended maximum ({self.max_features}). "
                "Consider dimensionality reduction."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details, "WARNING")
        return ValidationResult(True, None, details, "INFO")

    def _check_feature_ratio(self) -> ValidationResult:
        n, k = self._stats["n"], len(self._stats["features"])
        if n == 0:
            msg = "Dataset has zero samples. Cannot calculate feature ratio."
            self._warn(msg)
            return ValidationResult(False, msg, {"ratio": 0.0})
        if k == 0:
            msg = "No features found. Cannot calculate feature ratio."
            self._warn(msg)
            return ValidationResult(False, msg, {"ratio": 0.0})
        ratio = k / n
        details = {"ratio": float(f"{ratio:.3f}")}
        if ratio > self.max_feature_ratio:
            msg = (
                f"Feature-to-sample ratio ({ratio:.3f}) exceeds recommended maximum "
                f"({self.max_feature_ratio}). This may increase risk of overfitting."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details, "WARNING")
        return ValidationResult(True, None, details)

    def _check_feature_variability(self) -> ValidationResult:
        details: Dict[str, Any] = {"numeric_feature": True}
        feats = self._stats["features"]
        if not feats:
            msg = "No feature columns found. Cannot check feature variability."
            self._warn(msg)
            return ValidationResult(False, msg, details)
        failed = []
        for c in feats:
            details[c] = self._stats["uniq"][c]
            if self._stats["uniq"][c] < self.min_unique_values or self._stats["nulls"][c] > 0:
                failed.append(c)
        if failed:
            msg = (
                f"Features with insufficient variability or quality issues: {failed}. "
                f"Minimum unique values: {self.min_unique_values}, no null values allowed."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _check_class_balance(self, target_col: Optional[str]) -> ValidationResult:
        if not target_col:
            return ValidationResult(True, "No target column specified")
        n = self._stats["n"] - self._stats["nulls"].get(target_col, 0)
        return ValidationResult(True, None, {"class_counts": {"total": n}})

    # ---------------------------------------------------------------- report
    def print_report(self, results: Dict[str, ValidationResult]) -> None:
        print("Dataset Validation Report")
        print("=" * 40)
        for name, r in results.items():
            status = "PASSED" if r.passed else "FAILED"
            print(f"{name}: {status}")
            if r.message:
                print(f"  {r.message}")
