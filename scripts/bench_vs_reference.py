"""Head-to-head single-node throughput: this engine vs the reference
`neleval` on the SAME generated annotation files and the SAME measure
set — the "matches-or-beats the reference's single-node throughput"
check, plus a large-scale score-parity cross-check (every P/R/F must
agree to 1e-10 on ~200k random-ish mentions, far beyond the bundled
fixtures).

Usage:
    python scripts/bench_vs_reference.py [N_DOCS]     # default 20000
    python scripts/bench_vs_reference.py --engine reference DATA_DIR
    python scripts/bench_vs_reference.py --engine spark DATA_DIR

The compare mode generates data, then runs each engine in its own
subprocess (fresh interpreter — the reference is timed without any
Spark JVM in the process) and prints one JSON line.

The reference is py2-era; it runs on 3.11 with stdlib/numpy aliasing
shims (collections ABCs, np.bool) that do not affect its speed.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEASURES = "tac14"
TYPES = ["PER", "ORG", "GPE", "LOC", "FAC"]


def generate(data_dir: str, n_docs: int, seed: int = 42) -> None:
    """Deterministic gold + perturbed system TSVs (~10 mentions/doc;
    system drops ~5%, relinks ~5%, retypes ~5%, adds ~5% spurious)."""
    rng = random.Random(seed)
    os.makedirs(data_dir, exist_ok=True)
    with open(f"{data_dir}/gold.tsv", "w") as g, \
            open(f"{data_dir}/system.tsv", "w") as s:
        for d in range(n_docs):
            docid = f"doc{d:07d}"
            pos = 0
            for _ in range(rng.randint(6, 14)):
                start = pos + rng.randint(1, 30)
                end = start + rng.randint(2, 18)
                pos = end
                kbid = (f"E{rng.randint(1, 2000):05d}"
                        if rng.random() > 0.25
                        else f"NIL{rng.randint(1, 5000):05d}")
                t = rng.choice(TYPES)
                g.write(f"{docid}\t{start}\t{end}\t{kbid}\t1.0\t{t}\n")
                r = rng.random()
                if r < 0.05:
                    continue                      # miss
                skbid, st, sstart, send = kbid, t, start, end
                if r < 0.10:
                    skbid = f"E{rng.randint(1, 2000):05d}"   # relink
                elif r < 0.15:
                    st = rng.choice(TYPES)                   # retype
                s.write(
                    f"{docid}\t{sstart}\t{send}\t{skbid}\t1.0\t{st}\n")
                if rng.random() < 0.05:          # spurious
                    fs = pos + rng.randint(1, 9)
                    fe = fs + rng.randint(2, 9)
                    pos = fe
                    s.write(f"{docid}\t{fs}\t{fe}\t"
                            f"E{rng.randint(1, 2000):05d}\t1.0\t"
                            f"{rng.choice(TYPES)}\n")


def run_reference(data_dir: str) -> dict:
    import collections
    import collections.abc

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))
    import numpy as np

    for n, v in (("bool", bool), ("int", int), ("float", float),
                 ("object", object)):
        if not hasattr(np, n):
            setattr(np, n, v)
    sys.path.insert(0, "/root/reference")
    from neleval.evaluate import Evaluate

    t0 = time.perf_counter()
    e = Evaluate(f"{data_dir}/system.tsv", gold=f"{data_dir}/gold.tsv",
                 measures=[MEASURES], fmt="none")
    results = e()
    wall = time.perf_counter() - t0
    scores = {m: {k: results[m][k] for k in
                  ("precision", "recall", "fscore")}
              for m in results}
    return {"engine": "reference", "seconds": round(wall, 3),
            "scores": scores}


def run_spark(data_dir: str) -> dict:
    sys.path.insert(0, REPO)
    from neleval_spark.measures import evaluate
    from neleval_spark.session import get_spark
    from neleval_spark.sources.tsv import read_annotations_tsv

    spark = get_spark(app_name="bench_vs_reference")
    # timed twice: run 1 is COLD (includes JVM JIT / codegen /
    # Python-worker warm-up — the honest one-shot comparison against
    # the reference, which has no warm-up to amortize), run 2 is the
    # WARM steady state a long-lived engine delivers. Both reported.
    t0 = time.perf_counter()
    res = evaluate(
        read_annotations_tsv(spark, f"{data_dir}/system.tsv"),
        read_annotations_tsv(spark, f"{data_dir}/gold.tsv"),
        measures=MEASURES)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = evaluate(
        read_annotations_tsv(spark, f"{data_dir}/system.tsv"),
        read_annotations_tsv(spark, f"{data_dir}/gold.tsv"),
        measures=MEASURES)
    warm = time.perf_counter() - t0
    scores = {m: {k: v[k] for k in ("precision", "recall", "fscore")}
              for m, v in res.items()}
    return {"engine": "spark", "seconds": round(warm, 3),
            "cold_seconds": round(cold, 3), "scores": scores}


def main() -> None:
    if "--engine" in sys.argv:
        i = sys.argv.index("--engine")
        engine, data_dir = sys.argv[i + 1], sys.argv[i + 2]
        out = (run_reference(data_dir) if engine == "reference"
               else run_spark(data_dir))
        print(json.dumps(out))
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    data_dir = f"/tmp/bench_vs_ref_{n_docs}"
    generate(data_dir, n_docs)

    results = {}
    for engine in ("reference", "spark"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--engine", engine, data_dir],
            capture_output=True, text=True, timeout=7200)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(out.stderr[-2000:] + "\n")
            raise RuntimeError(f"{engine} produced no result")
        results[engine] = json.loads(lines[-1])

    ref, spk = results["reference"], results["spark"]
    mismatches = []
    for m, sc in ref["scores"].items():
        for k, v in sc.items():
            sv = spk["scores"].get(m, {}).get(k)
            if sv is None or abs(sv - v) > 1e-10:
                mismatches.append((m, k, v, sv))
    print(json.dumps({
        "n_docs": n_docs,
        "reference_seconds": ref["seconds"],
        "spark_cold_seconds": spk["cold_seconds"],
        "spark_warm_seconds": spk["seconds"],
        "speedup_cold": round(ref["seconds"] / spk["cold_seconds"], 2),
        "speedup_warm": round(ref["seconds"] / spk["seconds"], 2),
        "measures": len(ref["scores"]),
        "scores_match": not mismatches,
        "mismatches": mismatches[:5],
    }))


if __name__ == "__main__":
    main()
