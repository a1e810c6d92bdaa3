"""Statistical machinery: paired permutation significance tests and
percentile-bootstrap confidence intervals.

Reference semantics (neleval/significance.py):

* permutation test (:52-70): n trials; each trial flips each document's
  (sys1, sys2) contingency matrices with p=.5, sums them, and counts
  trials whose pseudo-difference is at least as extreme as the base
  difference; p = (better + 1) / (n + 1);
* percentile bootstrap (:224-248): resample documents with
  replacement, recompute P/R/F per trial, NIST-interpolated percentile
  bounds (exactly :237-248 — ``percentile_approx`` is NOT equivalent).

Scale design: the reference materializes per-doc Matrix lists on one
machine and joblib-forks trials. Here the per-doc contingency table is
a DataFrame (one row per doc, additive by construction — the whole
reason the measures distribute, SURVEY.md §1.1 'Matrix'), and the
trial loop is ONE ``mapInPandas`` pass over doc partitions: each
partition computes, vectorized in numpy, its partial contribution to
every trial's pseudo-sums simultaneously (O(docs × trials) flops, no
driver materialization of the doc table). Randomness is a
deterministic mix of (doc hash, trial id) — reproducible regardless of
partitioning or executor count. The per-trial resampling is the
Poisson bootstrap (the standard bootstrap-at-scale construction) for
CIs, and multiply-shift hash bits for permutation flips.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIX = np.uint64(0x9E3779B97F4A7C15)
MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def per_doc_contingency(sys_df: DataFrame, gold_df: DataFrame,
                        measure) -> DataFrame:
    """(docid, ptp, fp, rtp, fn) — reference: Evaluate.count
    (evaluate.py:173-181) over iter_pairs' docid union."""
    from ..measures.catalog import get_measure
    from ..measures.contingency import contingency_df

    spec = get_measure(measure)
    return contingency_df(sys_df, gold_df, spec, gcols=["docid"])


MIX_PRIME = 2147483647  # 2^31-1, the shared polynomial-hash modulus


def _trial_partials(joined: DataFrame, n_trials: int, seed: int,
                    mode: str, hash_mode: str = "xxhash64",
                    ) -> np.ndarray:
    """One distributed pass: per partition, vectorized partial sums for
    all trials. Returns [n_trials, 8] (sys1 ptp,fp,rtp,fn, sys2 ...).

    Per-doc randomness seeds from a JVM-side doc hash — no per-row
    (let alone per-byte) Python anywhere in the stats path;
    determinism is independent of partitioning and executor count.

    ``hash_mode="xxhash64"`` (default): 64-bit multiply-shift mixing —
    the production path.  ``hash_mode="poly"``: the engine-agnostic
    polynomial doc hash (textops.token_hash, mod 2^31-1) mixed as
    ``((h * (t + seed + 1)) % (2^31-1))`` — every intermediate fits
    int64 EXACTLY, so a DuckDB oracle replays the identical trial
    flips bit-for-bit (the ``permutation_pvalue`` gate).  Weaker
    mixing than xxhash64; meant for cross-engine verification, not to
    replace the default.
    """
    cols = ["ptp1", "fp1", "rtp1", "fn1", "ptp2", "fp2", "rtp2", "fn2"]
    tseed = np.uint64(seed)
    if hash_mode == "poly":
        from ..functions.textops import token_hash

        joined = joined.withColumn(
            "doc_hash", token_hash(F.col("docid").cast("string")))
    else:
        joined = joined.withColumn(
            "doc_hash", F.xxhash64(F.col("docid").cast("string")))

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m1 = pdf[cols[:4]].to_numpy(dtype=np.float64)
            m2 = pdf[cols[4:]].to_numpy(dtype=np.float64)
            if hash_mode == "poly":
                hp = pdf["doc_hash"].to_numpy(dtype=np.int64)
                ti = np.arange(n_trials, dtype=np.int64)
                # exact in int64: h < 2^31, (t+seed+1) small
                mixed_i = (hp[:, None] * (ti[None, :] + seed + 1)) \
                    % MIX_PRIME
                if mode == "permute":
                    flip = (mixed_i % 2).astype(bool)
                elif mode == "poisson":
                    u = mixed_i.astype(np.float64) / float(MIX_PRIME)
                    flip = None
                else:
                    raise ValueError(mode)
            else:
                h = pdf["doc_hash"].to_numpy(dtype=np.int64) \
                    .view(np.uint64)
                t = np.arange(n_trials, dtype=np.uint64)
                # mix(doc, trial): multiply-shift hash bits
                mixed = (h[:, None] ^ ((t[None, :] + tseed) * MIX)) \
                    * MIX2
                if mode == "permute":
                    flip = (mixed >> np.uint64(63)).astype(bool)
                elif mode == "poisson":
                    # uniform from the top 53 bits
                    u = (mixed >> np.uint64(11)).astype(np.float64) \
                        / float(1 << 53)
                    flip = None
                else:
                    raise ValueError(mode)
            if mode == "permute":
                # pseudo1 = flip ? m2 : m1 ; pseudo2 = flip ? m1 : m2
                p1 = np.einsum("dt,dk->tk", (~flip).astype(np.float64), m1) \
                    + np.einsum("dt,dk->tk", flip.astype(np.float64), m2)
                p2 = np.einsum("dt,dk->tk", (~flip).astype(np.float64), m2) \
                    + np.einsum("dt,dk->tk", flip.astype(np.float64), m1)
            else:
                # Poisson(1) weights via inverse CDF over the uniform
                w = _poisson_icdf(u).astype(np.float64)
                p1 = np.einsum("dt,dk->tk", w, m1)
                p2 = np.einsum("dt,dk->tk", w, m2)
            out = np.hstack([p1, p2]).reshape(n_trials * 8)
            yield pd.DataFrame({"partial": [out.tolist()]})

    parts = joined.mapInPandas(gen, schema="partial array<double>")
    rows = parts.collect()
    total = np.zeros(n_trials * 8)
    for r in rows:
        total += np.asarray(r["partial"])
    return total.reshape(n_trials, 8)


_POISSON_CDF = None


def _poisson_icdf(u: np.ndarray) -> np.ndarray:
    """Inverse CDF of Poisson(1) via table lookup (k ≤ 12 covers
    1 - 1e-13 of the mass)."""
    global _POISSON_CDF
    if _POISSON_CDF is None:
        import math

        pmf = [math.exp(-1) / math.factorial(k) for k in range(13)]
        _POISSON_CDF = np.cumsum(pmf)
    return np.searchsorted(_POISSON_CDF, u).astype(np.int64)


def _metrics_from(mat: np.ndarray) -> dict[str, np.ndarray]:
    """Vectorized P/R/F over [n, 4] (ptp, fp, rtp, fn) arrays with the
    reference's zero-denominator → 0 rule (evaluate.py:279-286)."""
    ptp, fp, rtp, fn = mat[:, 0], mat[:, 1], mat[:, 2], mat[:, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(ptp + fp > 0, ptp / (ptp + fp), 0.0)
        r = np.where(rtp + fn > 0, rtp / (rtp + fn), 0.0)
        f = np.where(p + r > 0, 2 * p * r / (p + r), 0.0)
    return {"precision": p, "recall": r, "fscore": f,
            "ptp": ptp, "fp": fp, "rtp": rtp, "fn": fn}


def _join_per_doc(pd1: DataFrame, pd2: DataFrame) -> DataFrame:
    a = pd1.select(
        "docid", F.col("ptp").alias("ptp1"), F.col("fp").alias("fp1"),
        F.col("rtp").alias("rtp1"), F.col("fn").alias("fn1"))
    b = pd2.select(
        "docid", F.col("ptp").alias("ptp2"), F.col("fp").alias("fp2"),
        F.col("rtp").alias("rtp2"), F.col("fn").alias("fn2"))
    return a.join(b, "docid", "full_outer").na.fill(0.0)


def permutation_test(
    per_doc1: DataFrame,
    per_doc2: DataFrame,
    n_trials: int = 2500,
    metrics: tuple[str, ...] = ("precision", "recall", "fscore"),
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> dict:
    """Paired permutation test between two systems' per-doc
    contingency tables. Returns {metric: {'diff': .., 'p': ..}}.

    ``hash_mode="poly"`` switches the per-(doc, trial) flip bits to
    the engine-agnostic polynomial derivation (see
    :func:`_trial_partials`) so the whole test is replayable in a
    DuckDB oracle; the default xxhash64 mixing is the production
    path."""
    joined = _join_per_doc(per_doc1, per_doc2)

    base = joined.agg(
        *[F.sum(c).alias(c)
          for c in ("ptp1", "fp1", "rtp1", "fn1",
                    "ptp2", "fp2", "rtp2", "fn2")]).collect()[0]
    b1 = np.array([[base["ptp1"], base["fp1"], base["rtp1"], base["fn1"]]],
                  dtype=float)
    b2 = np.array([[base["ptp2"], base["fp2"], base["rtp2"], base["fn2"]]],
                  dtype=float)
    base1 = _metrics_from(b1)
    base2 = _metrics_from(b2)
    base_diff = {m: float(base1[m][0] - base2[m][0]) for m in metrics}

    partials = _trial_partials(joined, n_trials, seed, "permute",
                               hash_mode)
    t1 = _metrics_from(partials[:, :4])
    t2 = _metrics_from(partials[:, 4:])

    out = {}
    for m in metrics:
        diffs = t1[m] - t2[m]
        if base_diff[m] < 0:
            better = int((diffs <= base_diff[m]).sum())
        else:
            better = int((diffs >= base_diff[m]).sum())
        out[m] = {"diff": base_diff[m],
                  "p": (better + 1) / (n_trials + 1)}
    return out


def nist_percentile(ordered, p: float) -> float:
    """Exact NIST interpolated percentile
    (reference: neleval/significance.py:237-248)."""
    k, d = divmod(p / 100 * (len(ordered) + 1), 1)
    k = int(k)
    if 0 < k < len(ordered):
        lo, hi = ordered[k - 1:k + 1]
        return lo + d * (hi - lo)
    elif k == 0:
        return ordered[0]
    return ordered[-1]


def calibrate_trials(
    per_doc: DataFrame,
    trials: tuple[int, ...] = (100, 250, 500, 1000, 2500, 5000, 10000),
    max_trials: int = 20000,
    percentiles: tuple[int, ...] = (90, 95, 99),
    metrics: tuple[str, ...] = ("precision", "recall", "fscore"),
    n_resamples: int = 100,
    seed: int = 42,
) -> list[dict]:
    """How many bootstrap trials are enough? (reference
    Confidence.calibrate_trials, significance.py:272-288).

    Runs ONE distributed bootstrap of ``max_trials``, then — driver-side
    on the tiny trial-score vectors — estimates, for each
    (metric, percentile, n), the stdev of the CI bound over
    ``n_resamples`` subsamples of n trials (sampled without
    replacement, as the reference's ``random.sample``).

    Returns rows {metric, pct, trials, stdev}.
    """
    joined = per_doc.select(
        "docid",
        F.col("ptp").alias("ptp1"), F.col("fp").alias("fp1"),
        F.col("rtp").alias("rtp1"), F.col("fn").alias("fn1"),
    ).withColumns({"ptp2": F.lit(0.0), "fp2": F.lit(0.0),
                   "rtp2": F.lit(0.0), "fn2": F.lit(0.0)})
    partials = _trial_partials(joined, max_trials, seed, "poisson")
    history = _metrics_from(partials[:, :4])

    rng = np.random.default_rng(seed)
    out = []
    for m in metrics:
        X = history[m]
        for p in percentiles:
            v = (100 - p) / 2
            for n in trials:
                if n > max_trials:
                    continue
                stats = [
                    nist_percentile(
                        np.sort(rng.choice(X, size=n, replace=False)), v)
                    for _ in range(n_resamples)
                ]
                out.append({"metric": m, "pct": p, "trials": n,
                            "stdev": float(np.std(stats))})
    return out


# _multinomial_trials collects the per-doc matrix table to the
# driver; beyond this many docs that is a driver OOM risk, so the
# call refuses and tells the user to use the distributed Poisson mode
# (the at-scale default, which never materializes the doc table).
MULTINOMIAL_MAX_DOCS = 1_000_000


def _multinomial_trials(joined: DataFrame, n_trials: int,
                        seed: int) -> np.ndarray:
    """Exact multinomial document resampling (the reference's
    bootstrap: N uniform draws of doc indices with replacement,
    significance.py:224-234) — driver-side, for fixture-parity runs.

    Per-doc matrices collect to the driver sorted by docid (seeded rng
    ⇒ deterministic results regardless of partitioning), then chunks
    of trials draw Multinomial(N, 1/N) count vectors and matrix-
    multiply them into per-trial sums. Use the default Poisson mode at
    scale — it never materializes the doc table; this path is BOUNDED
    at ``MULTINOMIAL_MAX_DOCS`` per-doc rows (≈32 MB of float64 at the
    bound) and raises beyond it rather than OOMing the driver."""
    n_docs_actual = joined.count()
    if n_docs_actual > MULTINOMIAL_MAX_DOCS:
        raise ValueError(
            f"method='multinomial' collects the per-doc table to the "
            f"driver and is bounded at {MULTINOMIAL_MAX_DOCS:,} docs "
            f"(got {n_docs_actual:,}); use the distributed "
            f"method='poisson' (the default) at this scale")
    pdf = joined.select("docid", "ptp1", "fp1", "rtp1", "fn1") \
        .orderBy("docid").toPandas()
    m = pdf[["ptp1", "fp1", "rtp1", "fn1"]].to_numpy(dtype=np.float64)
    n_docs = len(m)
    out = np.zeros((n_trials, 8))
    if n_docs == 0:
        return out
    rng = np.random.default_rng(seed)
    chunk = max(1, int(2e7 / max(n_docs, 1)))
    pvals = np.full(n_docs, 1.0 / n_docs)
    for lo in range(0, n_trials, chunk):
        k = min(chunk, n_trials - lo)
        counts = rng.multinomial(n_docs, pvals, size=k)
        out[lo:lo + k, :4] = counts.astype(np.float64) @ m
    return out


def bootstrap_confidence(
    per_doc: DataFrame,
    n_trials: int = 2500,
    percentiles: tuple[int, ...] = (90, 95, 99),
    metrics: tuple[str, ...] = ("precision", "recall", "fscore"),
    seed: int = 42,
    method: str = "poisson",
) -> dict:
    """Percentile-bootstrap CIs for one system (NIST percentile
    interpolation on the collected trial scores — tiny, driver-side,
    exactly like the reference).

    ``method="poisson"`` (default): distributed Poisson bootstrap —
    per-doc weights drawn independently from the (doc-hash, trial)
    mix; never materializes the doc table.  Asymptotically equivalent
    to the reference's multinomial resample but not bit-comparable.
    ``method="multinomial"``: the reference's exact resampling
    protocol (N docs drawn uniformly with replacement per trial,
    significance.py:224-234), driver-side — use when cross-checking
    CI bounds against the reference on fixture-sized inputs."""
    joined = per_doc.select(
        "docid",
        F.col("ptp").alias("ptp1"), F.col("fp").alias("fp1"),
        F.col("rtp").alias("rtp1"), F.col("fn").alias("fn1"),
    ).withColumns({"ptp2": F.lit(0.0), "fp2": F.lit(0.0),
                   "rtp2": F.lit(0.0), "fn2": F.lit(0.0)})
    if method == "multinomial":
        partials = _multinomial_trials(joined, n_trials, seed)
    elif method == "poisson":
        partials = _trial_partials(joined, n_trials, seed, "poisson")
    else:
        raise ValueError(f"unknown bootstrap method: {method!r}")
    t = _metrics_from(partials[:, :4])

    observed = _metrics_from(np.asarray(
        joined.groupBy().sum("ptp1", "fp1", "rtp1", "fn1").collect(),
        dtype=float))
    out = {}
    for m in metrics:
        values = sorted(t[m].tolist())
        out[m] = {
            p: (nist_percentile(values, (100 - p) / 2),
                nist_percentile(values, 100 - (100 - p) / 2))
            for p in percentiles
        }
        # observed point score alongside the CIs (used by plot-systems'
        # confidence input, mirroring reference Confidence output which
        # carries the overall score)
        out[m]["score"] = float(observed[m][0])
    return out


def significance_tab_format(results: list[dict],
                            metrics=("precision", "recall",
                                     "fscore")) -> str:
    """Reference Significance.tab_format parity (public output format,
    neleval/significance.py:190-214): rows of
    (sys1, sys2, measure, Δ-metric, p-metric ...) with the reference's
    column widths and ``{:+8.3f}/{:8.3f}`` number rendering.

    ``results``: [{'sys1', 'sys2', 'measure',
                   'stats': {metric: {'diff', 'p'}}}] in
    (system-pair, measure) order.
    """
    rows = []
    for row in results:
        stats = row["stats"]
        rows.append(
            [row["sys1"], row["sys2"], row["measure"]]
            + [x for metric in metrics
               for x in (stats[metric]["diff"], stats[metric]["p"])])
    header = (["sys1", "sys2", "measure"]
              + [h for metric in metrics
                 for h in ("Δ-" + metric[:6], "p-" + metric[:6])])
    sys_width = max(
        [len(col) for row in rows for col in row[:2]] + [4])
    measure_width = max([len(row[2]) for row in rows] + [5])
    fmt = "{:%ds}\t{:%ds}\t{:%ds}" % (sys_width, sys_width,
                                      measure_width)
    ret = (fmt + "\t{}" * len(metrics) * 2).format(*header)
    fmt += "".join("\t{:+8.3f}\t{:8.3f}" for _ in metrics)
    ret += "".join("\n" + fmt.format(*row) for row in rows)
    return ret


def confidence_tab_format(data: list[dict],
                          metrics=("precision", "recall", "fscore"),
                          percentiles=(90, 95, 99)) -> str:
    """Reference Confidence.tab_format parity (public output format,
    neleval/significance.py:330-361): header
    ``measure metric 99%( 95%( 90%( score )90% )95% )99%`` and one
    row per (measure, metric) with ``{:.3f}`` cells.

    ``data``: [{'measure', 'overall': {metric: score},
                'intervals': {metric: {pct: (lo, hi)}}}].
    """
    percentiles = sorted(percentiles)
    header = (["measure", "metric"]
              + ["{:d}%(".format(p) for p in reversed(percentiles)]
              + ["score"]
              + ["){:d}%".format(p) for p in percentiles])
    # widths pad only to the longest measure/metric NAME — no header
    # minimum — exactly like the reference (significance.py:350-352),
    # so output is byte-identical even when all names are short
    # (str.format never truncates, so the header renders intact)
    measures = [entry["measure"] for entry in data]
    measure_width = max(len(m) for m in measures)
    metric_width = max(len(m) for m in metrics)
    fmt = "{:%ds}\t{:%ds}" % (measure_width, metric_width)
    rows = []
    for entry in data:
        for metric in metrics:
            iv = entry["intervals"][metric]
            cells = ([iv[p][0] for p in reversed(percentiles)]
                     + [entry["overall"][metric]]
                     + [iv[p][1] for p in percentiles])
            rows.append([fmt.format(entry["measure"], metric)]
                        + ["{:.3f}".format(c) for c in cells])
    n_cells = 2 * len(percentiles) + 1
    ret = (fmt + "\t{}" * n_cells).format(*header)
    ret += "".join("\n" + "\t".join(row) for row in rows)
    return ret


def read_confidence_tab_format(file) -> list[dict]:
    """Re-ingest ``confidence_tab_format`` output (reference
    Confidence.read_tab_format, neleval/significance.py:363-381):
    returns the same [{'measure', 'overall', 'intervals'}] structure,
    keyed by the interval columns found in the header."""
    headers = [field.rstrip() for field in
               next(file).strip().split("\t")]
    by_measure: dict = {}
    for line in file:
        row = dict(zip(headers,
                       (field.rstrip()
                        for field in line.rstrip().split("\t"))))
        measure = row["measure"]
        if measure not in by_measure:
            cis = [int(field[:-2]) for field in headers
                   if field[-2:] == "%("]
            by_measure[measure] = {
                "measure": measure,
                "overall": {},
                "intervals": {m: {} for m in
                              ("precision", "recall", "fscore")},
            }
        metric = row["metric"]
        by_measure[measure]["overall"][metric] = float(row["score"])
        for ci in cis:
            by_measure[measure]["intervals"][metric][ci] = (
                float(row["%d%%(" % ci]), float(row[")%d%%" % ci]))
    return list(by_measure.values())
