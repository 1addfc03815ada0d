"""Exception taxonomy mirroring the reference's error contract.

Reference: /root/reference/src/temporalscope/core/exceptions.py:26-123
(class names and message style preserved so ported tests can match on text).
"""

from __future__ import annotations


class TemporalFrameError(Exception):
    """Base class for all temporal-frame errors (reference: ``TimeFrameError``)."""


class TimeColumnError(TemporalFrameError):
    """Raised for invalid time-column type, duplicate timestamps, or
    non-equidistant sampling when strict equidistance is requested."""


class ModeValidationError(TemporalFrameError):
    """Raised when an unsupported mode is requested."""

    def __init__(self, mode: str, message: str = "Invalid mode"):
        self.mode = mode
        super().__init__(f"{message}: {mode}")


class DataFrameValidationError(TemporalFrameError):
    """Raised when schema/content validation of the input DataFrame fails."""


class TargetColumnWarning(UserWarning):
    """Warning for suspicious target-column shapes (e.g. array-valued target
    in single_target mode; reference: exceptions.py:51-70)."""
