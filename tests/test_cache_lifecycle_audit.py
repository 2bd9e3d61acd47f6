"""Source-level audit: NO unreleased per-iteration caches (r7 ADVICE,
generalised per the VERDICT r7 item-7 discipline — fix the instance,
then make the CLASS un-reintroducible).

The instance: ``kcore_rounds`` persisted ``keep``/``nxt`` every peeling
round and never unpersisted prior rounds' sets, so cached memory grew
monotonically with rounds — exactly the shape that is invisible at
fixture scale and an executor-storage OOM on a long iterative run at
100 TB. The class: a ``.persist()``/``.cache()`` INSIDE a ``for``/
``while`` loop whose loop body never calls ``.unpersist()``. Each
iteration then pins a new DataFrame in executor storage while the
previous iteration's copy stays referenced by Python locals (or by lazy
result plans) until the operator returns — Spark's ContextCleaner can
only reclaim blocks whose RDD objects are garbage-collected, which lazy
stats plans and list accumulators silently prevent.

Every in-loop persist must therefore release state in-loop, and the
loop body must carry AT LEAST as many ``unpersist()`` calls as
``persist()``/``cache()`` calls (ADVICE r8: one unpersist must not
exempt three persists — the leak class could partially reappear). Count
matching, not name matching, because the correct rebind pattern
(``nxt.persist()`` … released as ``cur.unpersist()`` next round, the
kcore shape) releases under a different name by design. Where the
algorithm genuinely needs all rounds cached simultaneously (none today),
tag the persist line — or one of the three lines above it — with
``loop-persist: <why bounded>`` and it is exempt, visible, and greppable.

``localCheckpoint()`` in loops is deliberately out of scope: rebinding
the variable drops the only reference, so the ContextCleaner reclaims
prior rounds' blocks; there is no accumulation by construction.
"""

from __future__ import annotations

import ast
import os

ENGINE_ROOT = os.path.join(os.path.dirname(__file__), "..", "mapreduce_hw05_spark")

JUSTIFY_TAG = "loop-persist:"
#: how many lines above the call the justification may sit
CONTEXT = 3


def _method_calls(tree: ast.AST, names: set[str]) -> list[ast.Call]:
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in names
        ):
            out.append(node)
    return out


def iter_loop_persist_violations():
    for root, _dirs, files in os.walk(ENGINE_ROOT):
        if "__pycache__" in root:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            src = open(path).read()
            lines = src.splitlines()
            tree = ast.parse(src)
            for node in ast.walk(tree):
                if not isinstance(node, (ast.For, ast.While)):
                    continue
                body = ast.Module(body=node.body, type_ignores=[])
                persists = _method_calls(body, {"persist", "cache"})
                if not persists:
                    continue
                releases = _method_calls(body, {"unpersist"})
                # every persist needs a matching release in the SAME loop
                # body (count-wise): any-unpersist-exempts-all let a loop
                # that persists three DataFrames but releases one pass
                if len(releases) >= len(persists):
                    continue
                for call in persists:
                    i = call.func.lineno - 1
                    ctx = "\n".join(lines[max(0, i - CONTEXT) : i + 1])
                    if JUSTIFY_TAG not in ctx:
                        yield (
                            os.path.relpath(path, ENGINE_ROOT),
                            call.func.lineno,
                            lines[i].strip()[:70],
                        )


def test_in_loop_persists_release_in_loop():
    violations = [
        f"{path}:{lineno}  {snippet}"
        for path, lineno, snippet in iter_loop_persist_violations()
    ]
    assert not violations, (
        "persist()/cache() inside a loop with no in-loop unpersist() — "
        "cached memory grows monotonically with iterations (the r7 "
        "kcore_rounds leak class). Release the previous round's state "
        "in-loop, or tag the site `loop-persist: <why bounded>`:\n"
        + "\n".join(violations)
    )


def test_kcore_leak_instance_is_fixed():
    """The concrete r7 ADVICE instance: kcore_rounds' loop body contains
    both persists AND in-loop unpersists (regression pin — if the
    operator is rewritten, the release discipline must survive)."""
    path = os.path.join(ENGINE_ROOT, "operators", "graph.py")
    tree = ast.parse(open(path).read())
    fn = next(
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name == "kcore_rounds"
    )
    loops = [n for n in ast.walk(fn) if isinstance(n, (ast.For, ast.While))]
    assert loops, "kcore_rounds no longer iterative? update this pin"
    body = ast.Module(body=loops[0].body, type_ignores=[])
    assert _method_calls(body, {"persist"}), "expected in-loop persists"
    assert _method_calls(body, {"unpersist"}), "expected in-loop releases"
