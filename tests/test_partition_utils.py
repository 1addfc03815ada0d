"""Partition-scheme math parity suite.

Ports /root/reference/test/unit/partition/test_utils.py (241 lines, 21
tests): percentage fill-in & 1e-6 precision, scheme derivation
window=100//5=20, num_parts=(100-20)//10+1=9, cardinality errors.
"""

import pytest

from temporalscope_spark.operators.partition_utils import (
    determine_partition_scheme,
    print_config,
    validate_cardinality,
    validate_percentages,
)


class TestValidatePercentages:
    def test_train_only_fills_test(self):
        assert validate_percentages(0.7, None, None) == (0.7, pytest.approx(0.3), 0.0)

    def test_train_test_fills_val(self):
        t, te, v = validate_percentages(0.7, 0.2, None)
        assert (t, te) == (0.7, 0.2)
        assert v == pytest.approx(0.1)

    def test_train_val_fills_test(self):
        t, te, v = validate_percentages(0.7, None, 0.1)
        assert te == pytest.approx(0.2)

    def test_all_given_ok(self):
        assert validate_percentages(0.6, 0.3, 0.1) == (0.6, 0.3, 0.1)

    @pytest.mark.parametrize("bad", [-0.1, 1.1])
    def test_out_of_range_train(self, bad):
        with pytest.raises(ValueError, match="`train_pct` must be between 0 and 1"):
            validate_percentages(bad, None, None)

    def test_out_of_range_test(self):
        with pytest.raises(ValueError, match="`test_pct` must be between 0 and 1"):
            validate_percentages(0.5, 1.5, None)

    def test_out_of_range_val(self):
        with pytest.raises(ValueError, match="`val_pct` must be between 0 and 1"):
            validate_percentages(0.5, None, -0.2)

    def test_sum_not_one(self):
        with pytest.raises(ValueError, match="must sum to 1.0"):
            validate_percentages(0.5, 0.3, 0.1)

    def test_precision_tolerance(self):
        # within 1e-6 passes
        validate_percentages(0.7, 0.2, 0.1 + 1e-9)
        with pytest.raises(ValueError, match="must sum to 1.0"):
            validate_percentages(0.7, 0.2, 0.1 + 1e-5)


class TestDeterminePartitionScheme:
    def test_num_partitions_derives_window(self):
        scheme, n, w = determine_partition_scheme(5, None, 100, None)
        assert (scheme, n, w) == ("num_partitions", 5, 20)

    def test_window_size_derives_num(self):
        scheme, n, w = determine_partition_scheme(None, 20, 100, 10)
        assert (scheme, n, w) == ("window_size", 9, 20)

    def test_window_size_default_stride(self):
        scheme, n, w = determine_partition_scheme(None, 20, 100, None)
        assert (scheme, n, w) == ("window_size", 5, 20)

    def test_neither_given(self):
        with pytest.raises(ValueError, match="Either `num_partitions` or `window_size`"):
            determine_partition_scheme(None, None, 100, None)

    @pytest.mark.parametrize("bad", [0, -3])
    def test_bad_num_partitions(self, bad):
        with pytest.raises(ValueError, match="`num_partitions` must be a positive integer"):
            determine_partition_scheme(bad, None, 100, None)

    @pytest.mark.parametrize("bad", [0, -3])
    def test_bad_window_size(self, bad):
        with pytest.raises(ValueError, match="`window_size` must be a positive integer"):
            determine_partition_scheme(None, bad, 100, None)


class TestValidateCardinality:
    def test_ok(self):
        validate_cardinality(5, 20, 100)

    def test_too_many_partitions(self):
        with pytest.raises(ValueError, match=r"Insufficient rows \(10\) for `num_partitions=20`"):
            validate_cardinality(20, 1, 10)

    def test_window_too_big(self):
        with pytest.raises(ValueError, match=r"Insufficient rows \(10\) for `window_size=20`"):
            validate_cardinality(1, 20, 10)


class TestPrintConfig:
    def test_valid_types(self, capsys):
        print_config({"a": 1, "b": 0.5, "c": True, "d": "x"})
        out = capsys.readouterr().out
        assert "Configuration Details" in out
        assert "a" in out and "0.5" in out

    def test_invalid_types(self):
        with pytest.raises(TypeError, match="Invalid data types in config"):
            print_config({"a": [1, 2]})
