"""filtlong_spark — a PySpark-native web-text quality-filter engine.

A from-scratch re-expression of rrwick/Filtlong's score -> normalize ->
keep-budget -> scrub semantics as vectorized DataFrame stages over
Common-Crawl-style page tables. See SURVEY.md for the full operator map.
"""

from .config import FilterConfig, ConfigError, parse_int_with_suffix  # noqa: F401
