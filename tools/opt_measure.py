"""Round-11 optimization measurement harness.

Times catalog queries with the noop sink (best-of-N after warm-up),
captures ``explain("formatted")`` into ``plans/r11/<name>_<tag>.txt``,
and reports plan-shape counters (Exchange / Sort / Python-eval /
BroadcastHashJoin / SortMergeJoin nodes) plus the number of Spark jobs
one execution launches — the local-wall proxies the optimization guide
says to watch (§1, §2.4, §7.2).

Usage:
    python tools/opt_measure.py NAME [NAME...] [--sf DIR] [--tag before]
                                [--reps 5] [--no-plan]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLAN_DIR = os.path.join(REPO, "plans", os.environ.get("OPT_PLAN_DIR", "r12"))

_NODE_PATTERNS = {
    "exchange": r"^\s*[+:*-]*\s*\(?\d*\)?\s*Exchange\b",
    "bcast_exchange": r"BroadcastExchange\b",
    "smj": r"SortMergeJoin\b",
    "shj": r"ShuffledHashJoin\b",
    "bhj": r"BroadcastHashJoin\b",
    "bnlj": r"BroadcastNestedLoopJoin\b",
    "cartesian": r"CartesianProduct\b",
    "sort": r"^\s*[+:*-]*\s*\(?\d*\)?\s*Sort\b",
    "python": r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
    "window": r"\bWindow\b",
    "aqe": r"AdaptiveSparkPlan",
}


def plan_counts(text: str) -> dict[str, int]:
    out = {}
    for key, pat in _NODE_PATTERNS.items():
        out[key] = sum(
            1 for line in text.splitlines() if re.search(pat, line)
        )
    return out


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _ui_base(spark) -> str | None:
    try:
        url = spark.sparkContext.uiWebUrl
    except Exception:
        return None
    if not url:
        return None
    app_id = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app_id}"


def _max_stage_id(spark) -> int:
    import urllib.request

    base = _ui_base(spark)
    if base is None:
        return 0
    try:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            stages = json.load(r)
        return max((s["stageId"] for s in stages), default=-1) + 1
    except Exception:
        return 0


def _print_stage_metrics(spark, min_stage: int, name: str) -> None:
    """Per-stage executor metrics for stages >= min_stage, sorted by
    executorRunTime — where one execution of the query actually spent
    its task time (guide §7.1)."""
    import urllib.request

    base = _ui_base(spark)
    if base is None:
        print("  (UI disabled; no stage metrics)")
        return
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        if s["stageId"] < min_stage:
            continue
        rows.append(
            (
                s.get("executorRunTime", 0),
                s["stageId"],
                s.get("numCompleteTasks", s.get("numTasks", 0)),
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(reverse=True)
    print(f"  --- stages for {name} (executorRunTime ms desc) ---")
    total = sum(r[0] for r in rows)
    print(f"  total executorRunTime {total} ms over {len(rows)} stages")
    for rt, sid, ntask, inb, srb, swb, desc in rows[:20]:
        print(
            f"  stage {sid:>5} run={rt:>7}ms tasks={ntask:>3} "
            f"in={inb >> 10}KiB sr={srb >> 10}KiB sw={swb >> 10}KiB  {desc}"
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--tag", default=None, help="write plans/r11/<name>_<tag>.txt")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--no-plan", action="store_true")
    p.add_argument("--json", action="store_true", help="one JSON line per query")
    p.add_argument(
        "--stages",
        action="store_true",
        help="enable the UI and print per-stage executor metrics for one "
        "execution (REST API; guide §7.1)",
    )
    args = p.parse_args(argv)

    from archive_to_parquet_spark import queries as catalog
    from archive_to_parquet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        "opt_measure",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"} if args.stages else None,
    )
    sc = spark.sparkContext
    qs = catalog.queries()

    # session warm-up (mirrors bench.py)
    spark.read.parquet(f"{args.sf}/nation.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = []
    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        sc.setJobDescription(f"opt_measure: {name}")
        # build + capture plan (pre-execution; AQE initial plan)
        t_build0 = time.time()
        df = qs[name](spark, args.sf)
        build_s = time.time() - t_build0
        plan_txt = None
        if not args.no_plan:
            plan_txt = formatted_plan(df)
            if args.tag:
                os.makedirs(PLAN_DIR, exist_ok=True)
                with open(
                    os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(plan_txt)
        # warm-up run (codegen compile; also triggers any checkpoints)
        t_w0 = time.time()
        run_noop(df)
        warm_s = time.time() - t_w0
        # count jobs in one full rebuild+run (checkpoint jobs included)
        jid0 = sc._jsc.sc().dagScheduler().nextJobId()
        stage0 = _max_stage_id(spark) if args.stages else 0
        t0 = time.time()
        df2 = qs[name](spark, args.sf)
        run_noop(df2)
        one_shot = time.time() - t0
        jid1 = sc._jsc.sc().dagScheduler().nextJobId()
        n_jobs = jid1 - jid0
        if args.stages:
            _print_stage_metrics(spark, stage0, name)
        # best-of-N of the full rebuild+execute (what bench.py times is
        # execute-only on a prebuilt df; we rebuild so per-round
        # checkpoints re-fire the way the bench's 5 reps actually do)
        best = one_shot
        rebuild_best = one_shot
        for _ in range(max(0, args.reps - 1)):
            t0 = time.time()
            dfi = qs[name](spark, args.sf)
            run_noop(dfi)
            rebuild_best = min(rebuild_best, time.time() - t0)
        # bench-style: build once, execute N times
        dfb = qs[name](spark, args.sf)
        bench_best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            run_noop(dfb)
            bench_best = min(bench_best, time.time() - t0)
        rec = {
            "name": name,
            "bench_best": round(bench_best, 3),
            "rebuild_best": round(rebuild_best, 3),
            "build_sec": round(build_s, 3),
            "warm_sec": round(warm_s, 3),
            "n_jobs": n_jobs,
        }
        if plan_txt is not None:
            rec["plan"] = plan_counts(plan_txt)
        results.append(rec)
        if args.json:
            print(json.dumps(rec))
        else:
            print(
                f"{name}: bench_best={rec['bench_best']}s "
                f"rebuild_best={rec['rebuild_best']}s build={rec['build_sec']}s "
                f"jobs={n_jobs} "
                + (f"plan={rec.get('plan')}" if plan_txt else "")
            )
        sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
