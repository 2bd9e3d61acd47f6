#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Query keys q1…q12 correspond 1:1 to BASELINE.md's rows (same shapes,
same data) so rounds are directly comparable. q11 is the re-baselined
similarity kernel (pandas_udf/NumPy) replacing the SQL higher-order
function anti-pattern measured in BASELINE.md.

Protocol mirrors BASELINE.md: warm the session, 3 runs per query,
report warm = best of runs 2–3; results are collected to the driver.

Isolation (r2 VERDICT item 3): BENCH_r02's headline total drifted ~20%
uniformly vs r1 purely from same-session history (hundreds of
accumulated stages/shuffles by timing start), which isolated re-runs
didn't reproduce — so the headline and heavy suites now each run in
their OWN subprocess with a fresh JVM, and this parent merges the two
partial results into the single JSON line. Round-over-round headline
diffs are apples-to-apples no matter what ran before bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: BASELINE.md row → registry contract query.
BENCH_QUERIES: dict[str, tuple[str, ...]] = {
    "q1": ("q_filter_project",),
    "q2": ("q_groupagg_pricing",),
    "q3": ("q_join_orders_customer",),
    "q4": ("q_join_lineitem_part_bcast",),
    "q5": ("q_join_dim_chain",),
    "q6": ("q_topk_customers",),
    "q7": ("q_window_rank",),
    "q8": ("q_wordcount",),
    # baseline q9 did count-distinct + JSON extract in one query; the
    # registry keeps them separate — q9 times both back to back.
    "q9": ("q_distinct_users", "q_json_extract"),
    "q10": ("q_sessionize",),
    "q11": ("q_similarity_topk",),
    "q12": ("q_dedup_exact",),
}

#: Heavy tail — the expensive iterative/similarity/streaming operators,
#: timed BEST-OF-2 warm (r3 VERDICT item 6: single-run numbers swung
#: ±15% round-over-round from protocol noise, masking real regressions
#: like the replay-partition cliff; a second run costs ~2 min wall and
#: removes the first-run JIT/pagecache spike). Keys are prefixed
#: ``h_`` so the driver's round-over-round diff can separate the two
#: suites; regressions here are exactly the ones PERF.md used to hide.
HEAVY_QUERIES: dict[str, tuple[str, ...]] = {
    "h_triangle_count": ("q_triangle_count",),
    "h_pagerank": ("q_pagerank",),
    "h_connected_components": ("q_connected_components",),
    "h_near_dup_lsh": ("q_near_dup_lsh",),
    "h_stream_replay": ("q_stream_batch_equiv",),
}

#: ADDITIVE noop-sink timings (optimization guide §1.4), r11: keys here
#: time the same contract query but discard the result through the noop
#: data source instead of collect()ing it to the Python driver. Existing
#: keys are UNCHANGED (round-over-round comparability); these extra keys
#: exist because q_near_dup_lsh emits 2.97 M rows at sf0.1 and ~20 s of
#: its recorded wall is py4j row serialization, not query compute —
#: the noop reading is the number that tracks engine work. See
#: OPTIMIZATION_r11.md "Measurement methodology".
HEAVY_NOOP_QUERIES: dict[str, tuple[str, ...]] = {
    "h_near_dup_lsh_noop": ("q_near_dup_lsh",),
}

RUNS = 3
_PART_ENV = "SPARK_GRAFT_BENCH_PART"
_MARK = "BENCH_PART_JSON "

#: Best-of-session accumulator (VERDICT r9 "what's wrong" item 1 /
#: SURVEY §6 rule 1): the recorded BENCH_r{N}.json must carry the
#: best-of-≥3 calm reading, but the driver runs bench.py ONCE — so the
#: single recorded artifact could show a phantom excursion its own
#: session's other runs refute (r9: LSH ratio 39.9 recorded while the
#: same session read 30.4). Fix: every run merges its readings into a
#: scratch file KEYED BY GIT HEAD and the emitted JSON carries the
#: per-query/per-ratio session minima plus the merged run count. Keying
#: by HEAD is load-bearing: minima must never be carried across code
#: changes, or a real regression would hide behind an old tree's
#: reading. The scratch file lives in gitignored .tmp/.
_BEST_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".tmp",
    "bench_session_best.json",
)


def _git_head() -> str:
    """Key for the minima file: the INDEX state of the engine package +
    this script (blob hashes via ``git ls-files -s``), so doc-only
    commits (PERF.md round notes) don't reset the session minima the
    recorded run should carry — while ANY engine/bench code change
    still does. A dirty working tree on those paths falls back to a
    never-matching key (minima must not be carried across uncommitted
    edits)."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        kw = dict(cwd=root, stdout=subprocess.PIPE,
                  stderr=subprocess.DEVNULL, text=True, timeout=10)
        paths = ["mapreduce_hw05_spark", "bench.py"]
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--"] + paths, **kw
        ).stdout.strip()
        if dirty:
            return "dirty-" + hashlib.sha256(os.urandom(16)).hexdigest()[:16]
        listing = subprocess.run(
            ["git", "ls-files", "-s", "--"] + paths, **kw
        ).stdout
        if listing:
            return hashlib.sha256(listing.encode()).hexdigest()[:16]
    except Exception:
        pass
    # no git: never match (minima would otherwise accumulate across
    # code changes forever)
    return "nogit-" + hashlib.sha256(os.urandom(16)).hexdigest()[:16]


def _merge_session_best(
    times: dict, heavy: dict, ratios: dict
) -> dict:
    """Fold this run's readings into the per-HEAD minima file and return
    the merged view: {"runs": n, "queries": minima, "heavy_ratios":
    per-op min ratio, "headline_total_best": Σ headline minima}."""
    # the key carries the sf_dir too (r10 review): runs at different
    # scale factors at the same code state must never merge — a sf0.01
    # run's walls would masquerade as sf0.1 "session bests"
    head = _git_head() + "|" + os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    state = {"head": head, "runs": 0, "queries": {}, "heavy_ratios": {}}
    try:
        with open(_BEST_PATH) as fh:
            prev = json.load(fh)
        if prev.get("head") == head:
            state = prev
    except (OSError, ValueError):
        pass
    state["runs"] = int(state.get("runs", 0)) + 1
    for src, dst in ((times, state["queries"]), (heavy, state["queries"]),
                     (ratios, state["heavy_ratios"])):
        for k, v in src.items():
            dst[k] = min(v, dst[k]) if k in dst else v
    state["headline_total_best"] = round(
        sum(state["queries"].get(k, 0.0) for k in BENCH_QUERIES), 4
    )
    try:
        os.makedirs(os.path.dirname(_BEST_PATH), exist_ok=True)
        with open(_BEST_PATH, "w") as fh:
            json.dump(state, fh)
    except OSError:
        pass  # read-only checkout: still emit this run's merged view
    return state


def _run_part(part: str) -> None:
    """Child mode: fresh JVM, run one suite, print a marked JSON line."""
    from mapreduce_hw05_spark.plans import QUERIES
    from mapreduce_hw05_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"bench-{part}")

    # Warm the JVM/codegen once (BASELINE.md: cold-run spikes are JIT).
    QUERIES["q_groupagg_pricing"](spark, sf_dir).collect()

    out: dict = {}
    if part == "headline":
        for key, names in BENCH_QUERIES.items():
            per_run = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                for name in names:
                    QUERIES[name](spark, sf_dir).collect()
                per_run.append(time.perf_counter() - t0)
            out[key] = round(min(per_run[1:]), 4)
    else:
        # Variance-normalized heavy protocol (VERDICT r7 item 8): the r7
        # round burned on adjudicating 2–7× same-day swings on
        # byte-identical code. A fixed-work sentinel (the byte-stable
        # triangle-count plan) timed in the SAME JVM immediately before
        # each heavy op gives a wall/sentinel ratio that cancels
        # host-era slowdowns; thresholds on ratios are host-independent.
        sent = HEAVY_QUERIES["h_triangle_count"][0]
        QUERIES[sent](spark, sf_dir).collect()  # warm the sentinel plan
        sentinels: dict[str, float] = {}
        ratios: dict[str, float] = {}
        for key, names in HEAVY_QUERIES.items():
            # best-of-2 sentinel per heavy key (ADVICE r8): a single
            # sentinel sample on this 2–10×-swing host skews every ratio
            # it normalizes — match the best-of protocol of the ops.
            sent_runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[sent](spark, sf_dir).collect()
                sent_runs.append(time.perf_counter() - t0)
            sentinels[key] = round(min(sent_runs), 4)
            per_run = []
            for _ in range(2):
                t0 = time.perf_counter()
                for name in names:
                    QUERIES[name](spark, sf_dir).collect()
                per_run.append(time.perf_counter() - t0)
            out[key] = round(min(per_run), 4)
            ratios[key] = round(out[key] / sentinels[key], 3)
        for key, names in HEAVY_NOOP_QUERIES.items():
            # additive compute-only reading (guide §1.4): same query,
            # noop sink instead of a 2.97 M-row py4j collect.
            # ADVICE r11: noop keys get the SAME best-of-2 sentinel
            # sample + ratio as every other heavy key, so noop readings
            # are variance-normalizable across host eras too.
            sent_runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[sent](spark, sf_dir).collect()
                sent_runs.append(time.perf_counter() - t0)
            sentinels[key] = round(min(sent_runs), 4)
            per_run = []
            for _ in range(2):
                t0 = time.perf_counter()
                for name in names:
                    QUERIES[name](spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                per_run.append(time.perf_counter() - t0)
            out[key] = round(min(per_run), 4)
            ratios[key] = round(out[key] / sentinels[key], 3)
        out["__heavy_sentinel_sec"] = sentinels
        out["__heavy_ratios"] = ratios
    print(_MARK + json.dumps(out), flush=True)


def _spawn_part(part: str) -> dict[str, float]:
    env = dict(os.environ, **{_PART_ENV: part})
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    if proc.returncode == 0:
        for line in proc.stdout.splitlines():
            if line.startswith(_MARK):
                return json.loads(line[len(_MARK):])
    # keep the failure diagnosable: surface the child's stderr tail
    tail = "\n".join(proc.stderr.splitlines()[-15:])
    raise RuntimeError(
        f"bench part {part!r} failed (exit {proc.returncode}); "
        f"stderr tail:\n{tail}"
    )


def main() -> None:
    part = os.environ.get(_PART_ENV)
    if part:
        _run_part(part)
        return

    times = _spawn_part("headline")
    heavy = _spawn_part("heavy")
    heavy_sentinels = heavy.pop("__heavy_sentinel_sec", {})
    heavy_ratios = heavy.pop("__heavy_ratios", {})

    if "--perf-table" in sys.argv[1:]:
        # Render PERF.md's round-close markdown table from the SAME
        # numbers the driver records (VERDICT r6 item 8: one protocol,
        # one script — round-over-round numbers stop living in two
        # places). stdout still ends with the single JSON line below.
        print("| suite | query | warm sec |", file=sys.stderr)
        print("| --- | --- | --- |", file=sys.stderr)
        for k, v in times.items():
            print(f"| headline | {k} | {v} |", file=sys.stderr)
        for k, v in heavy.items():
            print(f"| heavy | {k} | {v} |", file=sys.stderr)
        # two well-formed 3-column rows (r7 ADVICE: a single merged
        # totals row misaligned with the header)
        print(
            f"| headline | total | {round(sum(times.values()), 2)} |",
            file=sys.stderr,
        )
        print(
            f"| heavy | total | "
            f"{round(sum(v for k, v in heavy.items() if k in HEAVY_QUERIES), 2)} |",
            file=sys.stderr,
        )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    best = _merge_session_best(times, heavy, heavy_ratios)
    print(
        json.dumps(
            {
                "metric": "warm_total_headline_sec",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": {**times, **heavy},
                # heavy_total stays the sum of the ORIGINAL collect-based
                # suite — the additive _noop keys (guide §1.4) would
                # otherwise double-count their query and break the
                # round-over-round total comparison
                "heavy_total_sec": round(
                    sum(v for k, v in heavy.items() if k in HEAVY_QUERIES), 4
                ),
                # host-independent adjudication data (VERDICT r7 item 8):
                # per-op wall/sentinel ratio + the sentinel walls themselves
                "heavy_sentinel_sec": heavy_sentinels,
                "heavy_ratios": heavy_ratios,
                # best-of-session minima at THIS git HEAD (SURVEY §6
                # rule 1): adjudicate on these, not the single run above
                "session_best": {
                    "runs": best["runs"],
                    "queries": best["queries"],
                    "heavy_ratios": best["heavy_ratios"],
                    "headline_total_best": best["headline_total_best"],
                },
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
