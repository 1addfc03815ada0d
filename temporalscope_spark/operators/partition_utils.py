"""Driver-side partition-scheme math — pure Python, no Spark.

Behavioral parity with /root/reference/src/temporalscope/partition/
single_target/utils.py:29-233 (its 21 unit tests are the contract — ported in
tests/test_partition_utils.py). Re-implemented from the spec, not copied.
"""

from __future__ import annotations

from typing import Optional, Tuple

DEFAULT_PRECISION = 1e-6


def validate_percentages(
    train_pct: float,
    test_pct: Optional[float] = None,
    val_pct: Optional[float] = None,
    precision: float = DEFAULT_PRECISION,
) -> Tuple[float, float, float]:
    """Fill in missing test/val percentages and require the trio to sum to 1.

    Rules (reference utils.py:29-97):
      * each given pct must lie in [0, 1];
      * both missing  → test = 1 - train, val = 0;
      * val missing   → val = 1 - train - test;
      * test missing  → test = 1 - train - val;
      * |train+test+val - 1| must be < ``precision``.
    """
    if not (0 <= train_pct <= 1):
        raise ValueError("`train_pct` must be between 0 and 1.")
    if test_pct is not None and not (0 <= test_pct <= 1):
        raise ValueError("`test_pct` must be between 0 and 1.")
    if val_pct is not None and not (0 <= val_pct <= 1):
        raise ValueError("`val_pct` must be between 0 and 1.")

    if test_pct is None and val_pct is None:
        test_pct, val_pct = 1.0 - train_pct, 0.0
    elif val_pct is None:
        val_pct = 1.0 - train_pct - test_pct
    elif test_pct is None:
        test_pct = 1.0 - train_pct - val_pct

    if abs(train_pct + test_pct + val_pct - 1.0) >= precision:
        raise ValueError("Train, test, and validation percentages must sum to 1.0.")
    return train_pct, test_pct, val_pct


def determine_partition_scheme(
    num_partitions: Optional[int],
    window_size: Optional[int],
    total_rows: int,
    stride: Optional[int],
) -> Tuple[str, int, int]:
    """Derive (scheme, num_partitions, window_size) from whichever was given.

    Reference utils.py:100-155:
      * ``num_partitions`` given → window_size = total_rows // num_partitions;
      * ``window_size`` given    → num_partitions =
        (total_rows - window_size) // (stride or window_size) + 1;
      * neither → ValueError.
    """
    if num_partitions is None and window_size is None:
        raise ValueError("Either `num_partitions` or `window_size` must be specified.")
    if num_partitions is not None:
        if num_partitions <= 0:
            raise ValueError("`num_partitions` must be a positive integer.")
        return "num_partitions", num_partitions, total_rows // num_partitions
    if window_size <= 0:
        raise ValueError("`window_size` must be a positive integer.")
    effective_stride = stride if stride is not None else window_size
    return "window_size", (total_rows - window_size) // effective_stride + 1, window_size


def validate_cardinality(num_partitions: int, window_size: int, total_rows: int) -> None:
    """Reject configurations the dataset can't satisfy (utils.py:158-189)."""
    if num_partitions > total_rows:
        raise ValueError(f"Insufficient rows ({total_rows}) for `num_partitions={num_partitions}`.")
    if window_size > total_rows:
        raise ValueError(f"Insufficient rows ({total_rows}) for `window_size={window_size}`.")


def print_config(config: dict) -> None:
    """Pretty-print a config dict; reject non-scalar values (utils.py:192-233).

    The reference uses ``tabulate`` (grid format); we render a plain aligned
    table to avoid the extra dependency — same validation contract.
    """
    allowed = (int, float, bool, str)
    bad = [(k, type(v).__name__) for k, v in config.items() if not isinstance(v, allowed)]
    if bad:
        detail = "\n".join(f"{k}: {t}" for k, t in bad)
        raise TypeError(f"Invalid data types in config:\n{detail}")
    width = max((len(str(k)) for k in config), default=9)
    print("Configuration Details:\n")
    print(f"{'Parameter'.ljust(width)} | Value")
    print(f"{'-' * width}-+------")
    for k, v in config.items():
        print(f"{str(k).ljust(width)} | {v}")
