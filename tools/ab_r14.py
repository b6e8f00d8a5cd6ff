#!/usr/bin/env python
"""Round-14 interleaved A/B harness (measurement-protocol compliant).

One Spark session; for each target query, arm A rebuilds the r13
implementation by exec'ing the OLD module source (``git show
<base>:<file>``) and patching the one function the query resolves at
call time, arm B is the working tree. Runs alternate A-B-A-B… with
``gc.collect()`` between, noop-sink timed, min/median reported, and the
two arms' outputs are hash-compared once (bit_xor of row hashes) before
any timing is trusted.

Usage: python tools/ab_r14.py [--base af29bc2] [--runs 4] [query ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# query -> list of (module dotted path, attr, old source file) to swap
# for arm A. The q_ functions import these attrs INSIDE the function
# body, so patching the module attribute is enough.
TARGETS: dict[str, list[tuple[str, str, str]]] = {
    "meta_assemble": [
        ("reflexiv_spark.operators.fixing", "fix_junctions",
         "reflexiv_spark/operators/fixing.py"),
        ("reflexiv_spark.pipelines.meta", "meta_assemble",
         "reflexiv_spark/pipelines/meta.py"),
    ],
    "clean_corpus": [
        ("reflexiv_spark.datapipe.pipeline", "clean_corpus",
         "reflexiv_spark/datapipe/pipeline.py"),
    ],
    "graph_pagerank": [
        ("reflexiv_spark.datapipe.graph", "pagerank",
         "reflexiv_spark/datapipe/graph.py"),
    ],
    "reassemble": [
        ("reflexiv_spark.pipelines.reassemble", "reassemble",
         "reflexiv_spark/pipelines/reassemble.py"),
    ],
    "error_correct": [
        ("reflexiv_spark.operators.preprocess", "correct_reads",
         "reflexiv_spark/operators/preprocess.py"),
    ],
    "pair_merge": [
        ("reflexiv_spark.operators.preprocess", "merge_read_pairs",
         "reflexiv_spark/operators/preprocess.py"),
    ],
    # q_classifier_predict itself changed (it now calls the shared-
    # extraction composite), so arm A swaps the OLD entry function too
    "classifier_predict": [
        ("reflexiv_spark.datapipe.classifier", "train_logreg_hashed",
         "reflexiv_spark/datapipe/classifier.py"),
        ("__spark_entry__", "q_classifier_predict", "__spark_entry__.py"),
    ],
    "classifier_train": [
        ("reflexiv_spark.datapipe.classifier", "train_logreg_hashed",
         "reflexiv_spark/datapipe/classifier.py"),
    ],
    "triangle_count": [
        ("reflexiv_spark.datapipe.graph", "triangle_count",
         "reflexiv_spark/datapipe/graph.py"),
    ],
    "bloom_decontam": [
        ("reflexiv_spark.datapipe.bloom", "bloom_decontaminate",
         "reflexiv_spark/datapipe/bloom.py"),
    ],
}


def _old_namespace(base: str, relpath: str) -> dict:
    """Exec the file as it was at ``base``; its package imports resolve
    against the CURRENT installed package (swaps are composed in
    TARGETS order so callee patches are visible to caller execs)."""
    src = subprocess.run(
        ["git", "show", f"{base}:{relpath}"],
        cwd=REPO, check=True, capture_output=True, text=True,
    ).stdout
    ns: dict = {"__name__": f"_ab_old_{Path(relpath).stem}"}
    exec(compile(src, f"<old:{relpath}>", "exec"), ns)
    return ns


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="af29bc2")
    ap.add_argument("--runs", type=int, default=4, help="runs PER ARM")
    ap.add_argument("--sf", default=None)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    import os

    sf_dir = args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    import importlib

    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="ab-r14")
    spark.sparkContext.setLogLevel("ERROR")

    # resolved per run (not a snapshot dict): queries() re-reads the
    # entry module's globals, so arm swaps of q_* functions take effect
    class _QS:
        def __getitem__(self, name):
            return ent.queries()[name]

    qs = _QS()

    names = args.queries or list(TARGETS)
    results = {}
    for name in names:
        swaps = TARGETS[name]
        mods, new_fns, old_fns = [], [], []
        for dotted, attr, rel in swaps:
            m = importlib.import_module(dotted)
            mods.append((m, attr))
            new_fns.append(getattr(m, attr))
        # compose arm A: patch each callee into its module BEFORE the
        # next (caller) file is exec'd, so the old caller's module-level
        # `from pkg.mod import fn` binds the OLD callee. Restored below.
        for (m, attr), (dotted, _, rel) in zip(mods, swaps):
            ns = _old_namespace(args.base, rel)
            old_fns.append(ns[attr])
            setattr(m, attr, ns[attr])
        for (m, attr), fn in zip(mods, new_fns):
            setattr(m, attr, fn)

        def set_arm(arm: str) -> None:
            fns = old_fns if arm == "A" else new_fns
            for (m, attr), fn in zip(mods, fns):
                setattr(m, attr, fn)

        def out_hash(arm: str):
            set_arm(arm)
            df = qs[name](spark, sf_dir)
            row = df.selectExpr(
                "count(1) AS c",
                "bit_xor(xxhash64(to_json(struct(*)))) AS h",
            ).first()
            return row["c"], row["h"]

        ca, ha = out_hash("A")
        cb, hb = out_hash("B")
        same = (ca, ha) == (cb, hb)
        print(f"{name}: rows A={ca} B={cb} hash_match={same}", flush=True)

        def run(arm: str) -> float:
            set_arm(arm)
            gc.collect()
            spark.sparkContext.setJobDescription(f"ab_r14:{name}:{arm}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            w = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            return w

        walls = {"A": [], "B": []}
        # one untimed warmup pair
        run("A"), run("B")
        for _ in range(args.runs):
            walls["A"].append(run("A"))
            walls["B"].append(run("B"))
        import statistics

        res = {
            "rows_match": same,
            "A_min": round(min(walls["A"]), 3),
            "B_min": round(min(walls["B"]), 3),
            "A_med": round(statistics.median(walls["A"]), 3),
            "B_med": round(statistics.median(walls["B"]), 3),
            "A_all": [round(w, 3) for w in walls["A"]],
            "B_all": [round(w, 3) for w in walls["B"]],
        }
        results[name] = res
        print(f"{name}: {json.dumps(res)}", flush=True)
        set_arm("B")  # leave the working tree active
    print(json.dumps({"sf_dir": sf_dir, "base": args.base, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
