"""Command-line surface mirroring the reference's subcommands
(reference dispatch: neleval/__main__.py:23-78) so a user of the
reference toolkit can run the same workflows on Spark:

    python -m neleval_spark evaluate SYSTEM -g GOLD [-m MEASURE ...]
    python -m neleval_spark prepare-tac LINKS -q QUERIES
    python -m neleval_spark prepare-tac15 SYSTEM
    python -m neleval_spark prepare-brat DIR
    python -m neleval_spark analyze SYSTEM -g GOLD [-s] [-u]
    python -m neleval_spark significance SYS1 SYS2 -g GOLD [-n N]
    python -m neleval_spark confidence SYSTEM -g GOLD [-n N]
    python -m neleval_spark list-measures
    python -m neleval_spark validate-spans FILE
    python -m neleval_spark weights-for-hierarchy JSON [-d DECAY]
    python -m neleval_spark select-alternatives SYSTEM -g GOLD [-f FIELDS]
    python -m neleval_spark run-pipeline CORPUS_PARQUET -o OUT_DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="neleval_spark_cli")


def cmd_evaluate(args):
    from .measures import evaluate
    from .measures.contingency import tab_format
    from .sources.tsv import read_annotations_tsv

    spark = _spark()
    sys_df = read_annotations_tsv(spark, args.system)
    gold_df = read_annotations_tsv(spark, args.gold)
    res = evaluate(sys_df, gold_df,
                   measures=args.measures or "all",
                   group_by=args.group_by or None)
    if args.fmt == "json":
        print(json.dumps(res, indent=4, sort_keys=True))
    else:
        print(tab_format(res))


def cmd_prepare_tac(args):
    from .sources.tac import prepare_tac
    from .sources.tsv import annotations_to_tsv_lines

    spark = _spark()
    df = prepare_tac(spark, args.system, args.queries)
    for r in annotations_to_tsv_lines(df).orderBy(
            "docid", "start", "end").collect():
        print(r["value"])


def cmd_prepare_tac15(args):
    from .sources.tac import prepare_tac15
    from .sources.tsv import annotations_to_tsv_lines

    spark = _spark()
    df = prepare_tac15(spark, args.system)
    for r in annotations_to_tsv_lines(df).orderBy(
            "docid", "start", "end").collect():
        print(r["value"])


def cmd_prepare_brat(args):
    from .sources.brat import read_brat
    from .sources.tsv import annotations_to_tsv_lines

    spark = _spark()
    df = read_brat(spark, args.dir)
    for r in annotations_to_tsv_lines(df).orderBy(
            "docid", "start", "end").collect():
        print(r["value"])


def cmd_analyze(args):
    from .analyze import error_summary, error_table
    from .sources.tsv import read_annotations_tsv

    spark = _spark()
    sys_df = read_annotations_tsv(spark, args.system)
    gold_df = read_annotations_tsv(spark, args.gold)
    if args.summary:
        for r in error_summary(sys_df, gold_df,
                               unique=args.unique).collect():
            print(f"{r['count']}\t{r['label']}")
    else:
        for r in error_table(sys_df, gold_df).orderBy(
                "docid", "start").collect():
            print(f"{r['label']}\t{r['docid']}\t"
                  f"g{r['gold_kbid']}\ts{r['system_kbid']}")


def cmd_significance(args):
    from .sources.tsv import read_annotations_tsv
    from .stats import per_doc_contingency, permutation_test

    spark = _spark()
    gold = read_annotations_tsv(spark, args.gold)
    sys1 = read_annotations_tsv(spark, args.systems[0])
    sys2 = read_annotations_tsv(spark, args.systems[1])
    measure = (args.measures or ["strong_all_match"])[0]
    pd1 = per_doc_contingency(sys1, gold, measure)
    pd2 = per_doc_contingency(sys2, gold, measure)
    res = permutation_test(pd1, pd2, n_trials=args.trials)
    print(json.dumps({measure: res}, indent=4, sort_keys=True))


def cmd_confidence(args):
    from .sources.tsv import read_annotations_tsv
    from .stats import bootstrap_confidence, per_doc_contingency

    spark = _spark()
    gold = read_annotations_tsv(spark, args.gold)
    sys_df = read_annotations_tsv(spark, args.system)
    measure = (args.measures or ["strong_all_match"])[0]
    pdc = per_doc_contingency(sys_df, gold, measure)
    res = bootstrap_confidence(pdc, n_trials=args.trials)
    print(json.dumps({measure: res}, indent=4, sort_keys=True,
                     default=str))


def cmd_list_measures(args):
    from .measures.catalog import MEASURE_SETS, MEASURES

    print("Name\tAggregate\tFilter\tKey")
    for name in sorted(MEASURES):
        m = MEASURES[name]
        print(f"{name}\t{m.agg}\t{m.filter}\t{'+'.join(m.key)}")
    print("\nGroups:", ", ".join(sorted(MEASURE_SETS)))


def cmd_validate_spans(args):
    from .operators.validate import validate_spans
    from .sources.tsv import read_annotations_tsv

    spark = _spark()
    df = read_annotations_tsv(spark, args.system)
    issues = validate_spans(df, duplicate=args.duplicate,
                            crossing=args.crossing, nested=args.nested)
    for r in issues.collect():
        print(r)


def cmd_weights(args):
    from .operators.weights import weights_for_hierarchy

    spark = _spark()
    df = weights_for_hierarchy(spark, args.hierarchy, decay=args.decay)
    for r in df.collect():
        print(f"{r['gold_type']}\t{r['sys_type']}\t{r['weight']:f}")


def cmd_select_alternatives(args):
    from .operators.select_alternatives import select_alternatives
    from .sources.tsv import annotations_to_tsv_lines, read_annotations_tsv

    spark = _spark()
    gold = read_annotations_tsv(spark, args.gold)
    sys_df = read_annotations_tsv(spark, args.system)
    fields = tuple(args.fields.split(","))
    out = select_alternatives(gold, sys_df, fields=fields)
    for r in annotations_to_tsv_lines(out).orderBy(
            "docid", "start", "end").collect():
        print(r["value"])


def cmd_run_pipeline(args):
    from .pipeline import kb_table
    from .pipeline.run import run_pipeline

    spark = _spark()
    pages = spark.read.parquet(args.corpus)
    res = run_pipeline(pages, kb_table(spark), out_dir=args.out,
                       n_buckets=args.buckets, resume=not args.no_resume)
    n = res["triples"].count()
    print(json.dumps({"triples": n, "out": args.out}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="neleval_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, conf):
        sp = sub.add_parser(name)
        conf(sp)
        sp.set_defaults(fn=fn)

    def _eval(sp):
        sp.add_argument("system")
        sp.add_argument("-g", "--gold", required=True)
        sp.add_argument("-m", "--measure", dest="measures",
                        action="append")
        sp.add_argument("-b", "--group-by", dest="group_by",
                        action="append")
        sp.add_argument("-f", "--fmt", default="tab",
                        choices=["tab", "json"])

    add("evaluate", cmd_evaluate, _eval)
    add("prepare-tac", cmd_prepare_tac, lambda sp: (
        sp.add_argument("system"),
        sp.add_argument("-q", "--queries", required=True)))
    add("prepare-tac15", cmd_prepare_tac15,
        lambda sp: sp.add_argument("system"))
    add("prepare-brat", cmd_prepare_brat,
        lambda sp: sp.add_argument("dir"))
    add("analyze", cmd_analyze, lambda sp: (
        sp.add_argument("system"),
        sp.add_argument("-g", "--gold", required=True),
        sp.add_argument("-s", "--summary", action="store_true"),
        sp.add_argument("-u", "--unique", action="store_true")))
    add("significance", cmd_significance, lambda sp: (
        sp.add_argument("systems", nargs=2),
        sp.add_argument("-g", "--gold", required=True),
        sp.add_argument("-n", "--trials", type=int, default=2500),
        sp.add_argument("-m", "--measure", dest="measures",
                        action="append")))
    add("confidence", cmd_confidence, lambda sp: (
        sp.add_argument("system"),
        sp.add_argument("-g", "--gold", required=True),
        sp.add_argument("-n", "--trials", type=int, default=2500),
        sp.add_argument("-m", "--measure", dest="measures",
                        action="append")))
    add("list-measures", cmd_list_measures, lambda sp: None)
    add("validate-spans", cmd_validate_spans, lambda sp: (
        sp.add_argument("system"),
        sp.add_argument("--duplicate", default="error"),
        sp.add_argument("--crossing", default="warn"),
        sp.add_argument("--nested", default="ignore")))
    add("weights-for-hierarchy", cmd_weights, lambda sp: (
        sp.add_argument("hierarchy"),
        sp.add_argument("-d", "--decay", type=float, default=0.5)))
    add("select-alternatives", cmd_select_alternatives, lambda sp: (
        sp.add_argument("system"),
        sp.add_argument("-g", "--gold", required=True),
        sp.add_argument("-f", "--fields", default="eid")))
    add("run-pipeline", cmd_run_pipeline, lambda sp: (
        sp.add_argument("corpus"),
        sp.add_argument("-o", "--out", required=True),
        sp.add_argument("--buckets", type=int, default=64),
        sp.add_argument("--no-resume", action="store_true")))

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
