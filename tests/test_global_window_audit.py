"""Source-level audit: NO unjustified single-partition windows (r8,
generalising the q_nb_auc / q_lift_deciles / q_rfm_segments /
q_equi_depth_histogram / q_skyline_pareto fixes per the VERDICT r7
item-7 discipline — fix the instance, make the CLASS un-reintroducible).

``Window.orderBy(...)`` with no ``partitionBy`` compiles to a
SINGLE-partition sort: every input row funnels through one task no
matter how large the cluster — invisible at fixture scale, the
slowest-possible plan at 100 TB. The audit finds every
``Window.orderBy`` / ``W.orderBy`` spec built directly on the Window
class (a partitioned spec calls ``.orderBy`` on the ``partitionBy``
RESULT, so it does not match) and requires either:

- a ``global-window: <why bounded>`` tag on the call line or within the
  three lines above it — legitimate uses are windows over
  aggregate/domain/limit-bounded inputs (months, day keys, size
  domains, top-50 slices), and the tag states the bound; or
- the site to not exist: corpus/entity-sized ranking belongs on
  ``operators.ranks.global_cumsum`` / ``distributed_ntile`` (range
  shuffle + per-partition offsets — exact, no one-task stage).
"""

from __future__ import annotations

import ast
import os

ENGINE_ROOT = os.path.join(os.path.dirname(__file__), "..", "mapreduce_hw05_spark")

JUSTIFY_TAG = "global-window:"
#: how many lines above the call the justification may sit
CONTEXT = 3
WINDOW_NAMES = {"W", "Window"}


def iter_unpartitioned_window_sites():
    for root, _dirs, files in os.walk(ENGINE_ROOT):
        if "__pycache__" in root:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            src = open(path).read()
            lines = src.splitlines()
            for node in ast.walk(ast.parse(src)):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "orderBy"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id in WINDOW_NAMES
                ):
                    continue
                i = node.func.lineno - 1
                ctx = "\n".join(lines[max(0, i - CONTEXT) : i + 1])
                if JUSTIFY_TAG not in ctx:
                    yield (
                        os.path.relpath(path, ENGINE_ROOT),
                        node.func.lineno,
                        lines[i].strip()[:70],
                    )


def test_every_unpartitioned_window_is_justified():
    violations = [
        f"{path}:{lineno}  {snippet}"
        for path, lineno, snippet in iter_unpartitioned_window_sites()
    ]
    assert not violations, (
        "Window.orderBy with no partitionBy — a SINGLE-partition sort at "
        "scale. Rank/cumsum corpus-sized input with operators.ranks "
        "(global_cumsum / distributed_ntile), or tag the site "
        "`global-window: <why bounded>`:\n" + "\n".join(violations)
    )
