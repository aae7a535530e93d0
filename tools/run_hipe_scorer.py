#!/usr/bin/env python3
"""Run the reference HIPE scorer in-process (ground truth for parity specs).

The scorer imports `smart_open` (not installed, zero-egress sandbox); it
only uses it as a drop-in `open`, so a shim module is injected. Usage:

  python3 tools/run_hipe_scorer.py TRUE.tsv PRED.tsv COLUMN nel|nerc \
      [--nbest N] [--ner-col COL] [--extra-col COL] [--merge-lines]

Prints the scorer's (eval_per_tag + ALL) dict as JSON on stdout.
"""
import argparse
import json
import sys
import types

# shim: utils.py does `from smart_open import open` and uses it as builtin open
_shim = types.ModuleType("smart_open")
_shim.open = open
sys.modules["smart_open"] = _shim

SCORER = "/root/reference/lib/bert_classification/HIPE-scorer"
sys.path.insert(0, SCORER)

from hipe_evaluation.ner_eval import Evaluator  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("true_tsv")
    ap.add_argument("pred_tsv")
    ap.add_argument("column")
    ap.add_argument("eval_type", choices=["nel", "nerc"])
    ap.add_argument("--nbest", type=int, default=1)
    ap.add_argument("--ner-col", default=None,
                    help="NEL boundary column (additional_columns)")
    ap.add_argument("--extra-col", default=None,
                    help="second link column (union mode, e.g. NEL-METO)")
    ap.add_argument("--merge-lines", action="store_true")
    ap.add_argument("--noise-level", default=None,
                    help="LED band 'LO,HI' (filter_entities_by_noise)")
    ap.add_argument("--time-period", default=None,
                    help="date range 'YYYY-MM-DD,YYYY-MM-DD' "
                         "(filter_entities_by_date, end exclusive)")
    args = ap.parse_args()

    noise = None
    if args.noise_level:
        lo, hi = args.noise_level.split(",")
        noise = (float(lo), float(hi))
    period = None
    if args.time_period:
        from datetime import datetime
        a, b = args.time_period.split(",")
        period = (datetime.strptime(a, "%Y-%m-%d"),
                  datetime.strptime(b, "%Y-%m-%d"))

    ev = Evaluator(args.true_tsv, args.pred_tsv)
    cols = [args.column] + ([args.extra_col] if args.extra_col else [])
    eval_global, eval_per_tag = ev.evaluate(
        cols if len(cols) > 1 else args.column,
        eval_type=args.eval_type,
        tags=None,
        merge_lines=args.merge_lines,
        n_best=args.nbest,
        additional_columns=[args.ner_col] if args.ner_col else None,
        noise_level=noise,
        time_period=period,
    )
    eval_per_tag["ALL"] = eval_global
    json.dump(eval_per_tag, sys.stdout, indent=1, default=str)


if __name__ == "__main__":
    main()
