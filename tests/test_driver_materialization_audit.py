"""Source-level audit: NO ungated driver materialization (VERDICT r4
item 3). Every ``.collect()`` / ``.toPandas()`` in engine code must carry
an explicit boundedness justification — a tag on the call line or within
the three preceding lines — or route through the one sanctioned helper
(``plans.common.snapshot_result``). This is what keeps the r4 PQ-training
class of bug (a correct-at-fixture-scale collect that OOMs the driver at
100x) from re-entering the codebase: a new bare collect fails this test
and forces the author to either bound it (sample cap, model-sized state,
top-k) or justify why it already is.

Accepted tags (put the strongest true one on the site):

- ``driver-sized:``  — grouped final state / single aggregate rows
- ``model-sized:``   — centroids, vocab, labels, per-dimension rows
- ``bounded:``       — an explicit cap or gate enforces the size
- ``sample-capped:`` — a deterministic orderBy+limit precedes the pull
- ``differential:``  — a two-implementation reference harness (the
  documented exemption class; cap these too where semantics allow)
"""

from __future__ import annotations

import os
import re

ENGINE_ROOT = os.path.join(os.path.dirname(__file__), "..", "mapreduce_hw05_spark")

CALL = re.compile(r"\.collect\(\)|\.toPandas\(\)")
NOT_A_PULL = re.compile(r"collect_list|collect_set")
JUSTIFIED = re.compile(
    r"driver-sized|model-sized|sample-capped|bounded|differential"
)
#: how many lines above the call the justification may sit
CONTEXT = 3


def iter_call_sites():
    for root, _dirs, files in os.walk(ENGINE_ROOT):
        if "__pycache__" in root:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            lines = open(path).readlines()
            for i, line in enumerate(lines):
                if CALL.search(line) and not NOT_A_PULL.search(line):
                    ctx = "".join(lines[max(0, i - CONTEXT) : i + 1])
                    yield os.path.relpath(path, ENGINE_ROOT), i + 1, line, ctx


def test_every_driver_pull_is_justified():
    unjustified = [
        f"{path}:{lineno}  {line.strip()[:70]}"
        for path, lineno, line, ctx in iter_call_sites()
        if not JUSTIFIED.search(ctx)
    ]
    assert not unjustified, (
        "bare collect()/toPandas() without a boundedness justification "
        "(tag the site or bound it — see module docstring):\n"
        + "\n".join(unjustified)
    )


def test_audit_actually_sees_the_sites():
    """Guard the auditor itself: the scan must keep finding the known
    sanctioned sites (snapshot_result's collect and the gated broadcast
    reference pull) — if the regex or the walk breaks, this fails before
    the main test silently passes on an empty list."""
    sites = {(path, lineno) for path, lineno, _l, _c in iter_call_sites()}
    files = {path for path, _ in sites}
    assert "plans/common.py" in files          # snapshot_result
    assert "operators/similarity.py" in files  # gated broadcast pull
    assert len(sites) >= 40  # the engine's known sanctioned-site floor
