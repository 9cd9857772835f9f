"""Progress / verbose / summary reporting (SURVEY.md §2 A8 + C8).

String formatting parity with the reference's stderr output:
- int_to_string: locale-grouped integers (src/misc.cpp:35-40 with the
  user's locale; rendered deterministically as comma grouping)
- double_to_string: fixed 2dp, space-padded to >= 5 chars
  (src/misc.cpp:24-32)
- the --verbose per-read score table (src/read.cpp:199-205 +
  src/main.cpp:199-213)
- the filtering summary block (src/main.cpp:219-261)

These are DRIVER-SIDE renderings over the (tiny) metrics rows / scalar
counters — never over the text column — so printing a report costs one
column-pruned pass at most.
"""

from __future__ import annotations


def int_to_string(n: int) -> str:
    """C8: thousands-grouped integer (src/misc.cpp:35-40)."""
    return f"{int(n):,}"


def double_to_string(x: float) -> str:
    """C8: fixed 2dp, left-padded with spaces to width 5
    (src/misc.cpp:24-32)."""
    s = f"{x:.2f}"
    return " " * (5 - len(s)) + s if len(s) < 5 else s


def pad(s, width: int) -> str:
    s = str(s)
    return s + " " * (width - len(s)) if width > len(s) else s


def verbose_scores_table(rows, name_col: str = "url") -> list[str]:
    """The --verbose normalized-score table (src/main.cpp:199-213 +
    Read::print_scores): one line per post-scrub record with length /
    mean-quality / window-quality / final scores, names padded to the
    longest. ``rows`` is an iterable of dict-like records carrying
    name_col, length_s, mean_q_score, window_q_score, final_score."""
    rows = list(rows)
    names = [r[name_col] for r in rows]
    longest = max((len(n) for n in names), default=0)
    lines = ["Read name\tLength score\tMean quality score\t"
             "Window quality score\tFinal score"]
    for r, name in zip(rows, names):
        lines.append(f"{pad(name, longest)}\t"
                     f"{double_to_string(r['length_s'])}\t"
                     f"{double_to_string(r['mean_q_score'])}\t"
                     f"{double_to_string(r['window_q_score'])}\t"
                     f"{double_to_string(r['final_score'])}")
    return lines


def _metrics_line(r) -> str:
    return (f"            length = {pad(r['n_chars'], 11)}"
            f"mean quality = {double_to_string(r['mean_q'])}"
            f"      window quality = {double_to_string(r['window_q'])}")


def verbose_read_info(rows, name_col: str = "url",
                      parent_col: str = "parent_url") -> list[str]:
    """The --verbose pre-normalization per-read block
    (Read::print_verbose_read_info, src/read.cpp:169-196): per record the
    raw length / mean quality / window quality; scrubbed parents print
    their child ranges followed by each child's block. (The scrubbed
    parent's own raw metrics are not retained in the metrics-only record
    set — the reference recomputes children inline — so the parent line
    lists its name and child ranges only.)"""
    lines: list[str] = []
    by_parent: dict[str, list] = {}
    order: list[str] = []
    for r in rows:
        p = r[parent_col]
        if p not in by_parent:
            by_parent[p] = []
            order.append(p)
        by_parent[p].append(r)
    for p in order:
        recs = sorted(by_parent[p], key=lambda r: r["child_start"])
        kids = [r for r in recs if r["is_child"]]
        lines.append("")
        lines.append(p)
        if not kids:
            lines.append(_metrics_line(recs[0]))
            continue
        ranges = ", ".join(f"{r['child_start']}-{r['child_end']}"
                           for r in kids)
        lines.append(f"      child ranges = {ranges}")
        for r in kids:
            lines.append("")
            lines.append(r[name_col])
            lines.append(_metrics_line(r))
    return lines


def filter_summary(target: int | None, total_chars: int,
                   passed_chars: int, kept_chars: int) -> list[str]:
    """The 'Filtering long reads' stderr block (src/main.cpp:219-261),
    counters grouped with int_to_string."""
    if target is None:
        return []
    lines = ["Filtering long reads",
             f"  target: {int_to_string(target)} bp"]
    if target >= total_chars:
        lines.append("  not enough reads to reach target")
    elif target >= passed_chars:
        lines.append("  reads already fall below target after filtering")
    else:
        lines.append(f"  keeping {int_to_string(kept_chars)} bp")
    return lines
