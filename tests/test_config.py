"""F5 suffix suite + D2 validation (reference test/test_unit_suffixes.py,
test/test_error_messages.py)."""

import pytest

from filtlong_spark.config import ConfigError, FilterConfig, parse_int_with_suffix


@pytest.mark.parametrize("value,expected", [
    ("1000", 1000),
    ("1k", 1000), ("1K", 1000), ("1kb", 1000), ("1KB", 1000), ("1Kb", 1000),
    ("1m", 1_000_000), ("1mb", 1_000_000), ("1M", 1_000_000),
    ("1g", 1_000_000_000), ("1gb", 1_000_000_000), ("1GB", 1_000_000_000),
    ("3.5m", 3_500_000), ("3.5mb", 3_500_000),
    ("0.5k", 500), ("2.345k", 2345),
    ("1.2345k", 1234),            # truncation toward zero (C++ cast)
    ("5001", 5001),
    ("-2k", -2000),
])
def test_suffix_parsing(value, expected):
    assert parse_int_with_suffix(value) == expected


@pytest.mark.parametrize("value", ["", "k", "mb", "1x", "1kk", "1 k", "-k", "1q"])
def test_invalid_suffixes(value):
    with pytest.raises((ConfigError, ValueError)):
        parse_int_with_suffix(value)


def test_config_accepts_suffix_strings():
    cfg = FilterConfig(min_length="1k", target_chars="3.5mb")
    assert cfg.min_length == 1000
    assert cfg.target_chars == 3_500_000


def test_no_thresholds_error():
    with pytest.raises(ConfigError, match="no thresholds set"):
        FilterConfig().validate()


@pytest.mark.parametrize("kwargs,msg", [
    (dict(target_chars=0), "--target_bases must be a positive"),
    (dict(target_chars=-5), "--target_bases must be a positive"),
    (dict(keep_percent=0.0), "--keep_percent must be greater than 0"),
    (dict(keep_percent=100.0), "--keep_percent must be greater than 0"),
    (dict(min_length=0), "--min_length must be a positive"),
    (dict(max_length=-1), "--max_length must be a positive"),
    (dict(min_mean_q=0.0), "--min_mean_q must be a positive"),
    (dict(min_window_q=-3.0), "--min_window_q must be a positive"),
    (dict(split=0), "--split must be a positive"),
    (dict(min_length=10, length_weight=-1.0), "--length_weight must be a positive"),
])
def test_validation_errors(kwargs, msg):
    with pytest.raises(ConfigError, match=msg):
        FilterConfig(**kwargs).validate()


def test_scrub_requires_signal():
    with pytest.raises(ConfigError, match="--trim and --split require"):
        FilterConfig(trim=True, mode="intrinsic").validate()
