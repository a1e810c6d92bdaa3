"""Coherence reranking: hand-built flip/no-flip cases, tie
determinism, the passthrough guard, and a seeded random-corpus
differential vs a pure-Python replica."""

import random

from neleval_spark.pipeline.coherence import DENOM, rerank_by_coherence

CAND_SCHEMA = "url string, mention_id long, eid string, prior long"
EDGE_SCHEMA = "src string, dst string"


def _sym(pairs):
    return sorted({(a, b) for a, b in pairs}
                  | {(b, a) for a, b in pairs})


def _run(spark, cands, edges, **kw):
    out = rerank_by_coherence(
        spark.createDataFrame(cands, CAND_SCHEMA),
        spark.createDataFrame(_sym(edges), EDGE_SCHEMA), **kw)
    rows = out.collect()
    got = {(r["url"], r["mention_id"]):
           (r["eid"], r["prior"], r["votes"], r["combined"])
           for r in rows}
    assert len(got) == len(rows), "duplicate mention row"
    return got


def test_coherent_candidate_overtakes_prior(spark):
    # m0: A (prior 3) vs B (prior 2); m1's winner C relates to B
    cands = [("u1", 0, "A", 3), ("u1", 0, "B", 2), ("u1", 1, "C", 5)]
    got = _run(spark, cands, [("B", "C")], alpha_ppm=400_000)
    eid, prior, votes, combined = got[("u1", 0)]
    assert eid == "B" and votes == 1
    assert combined == 400_000 * 2 + 600_000 * 1
    # m1 keeps C (no competitor)
    assert got[("u1", 1)][0] == "C"


def test_high_alpha_keeps_prior_winner(spark):
    cands = [("u1", 0, "A", 3), ("u1", 0, "B", 2), ("u1", 1, "C", 5)]
    got = _run(spark, cands, [("B", "C")], alpha_ppm=900_000)
    assert got[("u1", 0)][0] == "A"  # 2.7M > 1.8M + 0.1M


def test_votes_exclude_own_mention(spark):
    # single-mention doc: candidate adjacent to ITSELF earns nothing
    cands = [("u1", 0, "A", 1), ("u1", 0, "B", 1)]
    got = _run(spark, cands, [("A", "B")], alpha_ppm=500_000)
    eid, _, votes, _ = got[("u1", 0)]
    assert eid == "A" and votes == 0  # tie -> smallest eid


def test_passthrough_guard_counts_and_keeps_priors(spark):
    cands = [("big", m, f"E{m}", 1) for m in range(5)]
    cands += [("small", 0, "A", 1), ("small", 0, "B", 2),
              ("small", 1, "C", 1)]
    stats = {}
    got = _run(spark, cands, [("A", "C")], alpha_ppm=100_000,
               max_mentions=4, stats=stats)
    assert stats["passthrough_docs"] == 1
    # big doc: prior winners kept, votes pinned 0
    assert got[("big", 2)] == ("E2", 1, 0, 100_000)
    # small doc still reranks: A gets C's vote and beats B
    assert got[("small", 0)][0] == "A"


def _python_rerank(cands, edges, alpha_ppm, max_mentions=256):
    adj = set(edges) | {(b, a) for a, b in edges}
    best_prior = {}
    by_doc = {}
    cset = {}
    for url, m, e, p in cands:
        cset[(url, m, e)] = max(p, cset.get((url, m, e), p))
    for (url, m, e), p in cset.items():
        k = (url, m)
        cur = best_prior.get(k)
        if cur is None or (-p, e) < (-cur[1], cur[0]):
            best_prior[k] = (e, p)
        by_doc.setdefault(url, set()).add(m)
    out = {}
    for (url, m), (we, wp) in best_prior.items():
        if len(by_doc[url]) > max_mentions:
            out[(url, m)] = (we, wp, 0, alpha_ppm * wp)
    for (url, m, e), p in cset.items():
        if (url, m) in out and len(by_doc[url]) > max_mentions:
            continue
        votes = sum(
            1 for m2 in by_doc[url]
            if m2 != m and (e, best_prior[(url, m2)][0]) in adj)
        comb = alpha_ppm * p + (DENOM - alpha_ppm) * votes
        k = (url, m)
        cur = out.get(k)
        if cur is None or (-comb, e) < (-cur[3], cur[0]):
            out[k] = (e, p, votes, comb)
    return out


def test_random_corpora_vs_python_oracle(spark):
    rng = random.Random(33703)
    for trial in range(3):
        cands = []
        for u in range(8):
            for m in range(rng.randint(1, 5)):
                for e in rng.sample(range(12), rng.randint(1, 4)):
                    cands.append((f"u{u}", m, f"E{e}",
                                  rng.randint(1, 9)))
        edges = _sym({(f"E{rng.randrange(12)}", f"E{rng.randrange(12)}")
                      for _ in range(10)})
        edges = [(a, b) for a, b in edges if a != b]
        alpha = rng.choice([200_000, 500_000, 800_000])
        got = _run(spark, cands, edges, alpha_ppm=alpha)
        want = _python_rerank(sorted(set(cands)), edges, alpha)
        assert got == want, f"trial {trial} alpha {alpha}"
