"""bench.py output contract — the driver captures only the TAIL of
the emitted JSON line, so the headline timings and the totals must
sit at the END of the line (VERDICT r8 item 4 / r9 item 7).  These
tests parse bench.py's emission logic without running Spark."""

from __future__ import annotations

import ast
import json
import os

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _emitted_dict_keys() -> list[str]:
    """Key order of the dict literal passed to json.dumps in bench.py."""
    tree = ast.parse(open(BENCH).read())
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "dumps"
            and node.args
            and isinstance(node.args[0], ast.Dict)
        ):
            return [
                k.value
                for k in node.args[0].keys
                if isinstance(k, ast.Constant)
            ]
    raise AssertionError("no json.dumps(dict-literal) found in bench.py")


def test_totals_repeat_after_queries_dict():
    keys = _emitted_dict_keys()
    assert "queries" in keys and "total_s" in keys and "n_queries" in keys
    # total_s / n_queries must FOLLOW queries so a head-truncated
    # capture still carries the totals.
    assert keys.index("total_s") > keys.index("queries")
    assert keys.index("n_queries") > keys.index("queries")


def test_headline_set_survives_head_truncation():
    """The SURVEY headline names must be emitted at the TAIL of the
    queries dict (reverse run order) — simulate by checking bench.py
    reverses `names` when building the ordered dict."""
    src = open(BENCH).read()
    assert "reversed(names)" in src
