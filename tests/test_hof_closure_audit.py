"""Source-level audit of higher-order-function lambdas (SURVEY §5 rule
10, VERDICT r6 item 6): HOF lambdas are INTERPRETED (never codegen) with
no subexpression elimination across elements, so a lambda that closes
over a COMPUTED expression re-evaluates it once per array element — the
r6 x1000 probe's worst find (``word_shingles`` re-split the whole
document per shingle, O(n·L²), all workers spinning in
``UTF8String.split``).

Mechanics: enumerate every ``F.<hof>(...)`` call in engine source via
AST and require its (file, enclosing scope) to be REGISTERED below with
the hof-name set the auditor sees there. Registration is a conscious
claim that the site was audited against rule 10:

- lambda bodies may reference element/accumulator params, literals, and
  ATTRIBUTE refs (plain row fields — ``F.col("x")`` where ``x`` is a
  projected column, exempt per rule 10 because the optimizer's
  CollapseProject will not inline a multi-use non-cheap projection into
  the lambda);
- any per-element closure over a computed expression must be
  materialized first (``word_shingles``' ``__toks`` pattern) or be O(1)
  per evaluation (``F.size`` of an attribute array).

Adding or moving a HOF call fails this test until the new site is
audited and registered — the same discipline as the broadcast and
fallback-claims audits.
"""

from __future__ import annotations

import ast
import os

ENGINE_ROOT = os.path.join(
    os.path.dirname(__file__), "..", "mapreduce_hw05_spark"
)

#: pyspark.sql.functions higher-order functions that take lambdas
HOFS = frozenset(
    {
        "transform",
        "aggregate",
        "reduce",
        "filter",
        "exists",
        "forall",
        "zip_with",
        "map_filter",
        "map_zip_with",
        "transform_keys",
        "transform_values",
    }
)

#: (file, qualified scope) -> set of hof names audited there.
#: Every entry was eyeball-audited 2026-08-16 (r7): all lambdas close
#: over element params, literals, or materialized attribute refs only.
REGISTRY: dict[tuple[str, str], set[str]] = {
    # chunk-rebuild: transform over a per-group collect_list, pure lambda
    ("plans/corpus_queries.py", "q_paragraph_dedup"): {"transform"},
    # stopword filter: iterated array computed ONCE as an argument;
    # lambda body touches only the element + literals
    ("plans/corpus_queries.py", "q_quality_filter_per_lang"): {"filter"},
    ("plans/scalar_funcs.py", "q_map_funcs"): {"map_filter"},
    ("plans/scalar_funcs.py", "q_explode_outer"): {"filter"},
    # Holt fold: aggregate over a per-group series, pure step lambda
    ("plans/analytics_queries.py", "q_holt_linear"): {
        "transform",
        "aggregate",
    },
    # quantization error: lambda closes over mn/step which are
    # MATERIALIZED multi-use projections (CollapseProject keeps them
    # out of the lambda — verified on the optimized plan, r7)
    ("plans/similarity_queries.py", "q_embedding_quantize"): {
        "transform",
        "aggregate",
    },
    # logreg margin: zip_with against a literal weight array
    ("plans/similarity_queries.py", "q_logreg_score"): {
        "aggregate",
        "zip_with",
    },
    ("plans/events_queries.py", "q_event_sequences"): {"transform"},
    # EWMA: lambda closes over n = F.size(attribute) — O(1) per element
    ("plans/events_queries.py", "ewma_from_hourly"): {
        "aggregate",
        "transform",
    },
    ("plans/events_queries.py", "q_survival_km"): {"aggregate"},
    ("plans/events_queries.py", "q_top_paths"): {"transform"},
    # norm fold over the embedding ATTRIBUTE
    ("plans/text_queries.py", "q_array_ops"): {"aggregate"},
    ("plans/text_queries.py", "q_array_hof"): {
        "filter",
        "exists",
        "forall",
        "aggregate",
        "zip_with",
    },
    # THE rule-10 exemplar: gram lambda reads the materialized __toks
    ("operators/text.py", "word_shingles"): {"transform"},
    ("functions/text_analysis.py", "quality_metrics"): {"filter"},
    # map-only fingerprint: lambda closes over the text ATTRIBUTE
    ("functions/text_analysis.py", "char_ngram_fingerprint"): {
        "transform"
    },
}


def _hof_sites():
    for root, _dirs, files in os.walk(ENGINE_ROOT):
        if "__pycache__" in root:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, ENGINE_ROOT).replace(os.sep, "/")
            src = open(path).read()
            tree = ast.parse(src)
            scopes = [
                n
                for n in ast.walk(tree)
                if isinstance(
                    n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                )
            ]
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                    and node.func.attr in HOFS
                ):
                    continue
                # F.filter / F.transform are only HOFs when called with a
                # callable — skip e.g. DataFrame.filter misdetection (F.
                # namespace only, so just require a lambda/function arg)
                has_lambda = any(
                    isinstance(a, ast.Lambda)
                    or (isinstance(a, ast.Name) and a.id.startswith("_"))
                    for a in node.args
                )
                if not has_lambda:
                    continue
                ln = node.lineno
                chain = sorted(
                    (s for s in scopes if s.lineno <= ln <= s.end_lineno),
                    key=lambda s: s.lineno,
                )
                qual = (
                    ".".join(s.name for s in chain) if chain else "<module>"
                )
                yield (rel, qual), node.func.attr


def test_every_hof_site_is_audited():
    found: dict[tuple[str, str], set[str]] = {}
    for key, hof in _hof_sites():
        found.setdefault(key, set()).add(hof)
    problems = []
    for key, hofs in sorted(found.items()):
        if key not in REGISTRY:
            problems.append(
                f"UNAUDITED HOF site {key[0]}::{key[1]} uses {sorted(hofs)} "
                "— audit its lambdas against SURVEY §5 rule 10 (materialize "
                "every computed expression the lambda closes over) and "
                "register it in tests/test_hof_closure_audit.py"
            )
        elif hofs - REGISTRY[key]:
            problems.append(
                f"NEW HOF kind at {key[0]}::{key[1]}: "
                f"{sorted(hofs - REGISTRY[key])} not in its registration — "
                "re-audit the scope"
            )
    live = set(found)
    for key in REGISTRY:
        if key not in live:
            problems.append(
                f"DEAD registry entry {key[0]}::{key[1]} — no HOF calls "
                "there anymore; remove it"
            )
    assert not problems, "\n".join(problems)


def test_audit_sees_the_known_sites():
    found = {k for k, _ in _hof_sites()}
    assert ("operators/text.py", "word_shingles") in found
    assert (
        "functions/text_analysis.py",
        "char_ngram_fingerprint",
    ) in found
    assert len(found) >= 15
