#!/usr/bin/env python3
"""Generate seeded randomized NEL fixture pairs + reference-scorer expected
results (differential fuzz for NelEval — edge cases the committed unit
fixtures don't reach: singleton links on O tokens, consecutive equal links,
mid-span link changes, pipe-ranked alternatives, `_` links inside NER spans,
NIL/QID confusions, boundary shifts).

Writes unittest-style TSV pairs and, per pair, expected JSONs for:
  original mode (link-column segmentation) at n_best=1 and n_best=3,
  ner mode (NE-COARSE-LIT boundaries) at n_best=1.

Usage: python3 tools/gen_nel_fuzz.py OUTDIR [n_pairs]
"""
import json
import random
import subprocess
import sys

HEADER = ("TOKEN\tNE-COARSE-LIT\tNE-COARSE-METO\tNE-FINE-LIT\tNE-FINE-METO"
          "\tNE-FINE-COMP\tNE-NESTED\tNEL-LIT\tNEL-METO\tMISC")

QIDS = ["Q1", "Q7", "Q42", "Q130879", "Q2826560", "NIL"]
TYPES = ["org", "loc", "pers"]


def gen_doc(rng, doc_i):
    n = rng.randint(20, 60)
    toks = [f"w{doc_i}t{i}" for i in range(n)]
    ner = ["O"] * n
    gold_nel = ["_"] * n
    pred_ner = ["O"] * n
    pred_nel = ["_"] * n

    i = 0
    while i < n - 3:
        if rng.random() < 0.35:
            ln = rng.randint(1, 3)
            t = rng.choice(TYPES)
            q = rng.choice(QIDS)
            for j in range(ln):
                ner[i + j] = ("B-" if j == 0 else "I-") + t
                gold_nel[i + j] = q
            # prediction perturbations
            r = rng.random()
            if r < 0.35:  # exact copy
                for j in range(ln):
                    pred_ner[i + j] = ner[i + j]
                    pred_nel[i + j] = q
            elif r < 0.5:  # wrong link, same span (IV)
                wrong = rng.choice([x for x in QIDS if x != q])
                cell = wrong if rng.random() < 0.5 else f"{wrong}|{q}"
                for j in range(ln):
                    pred_ner[i + j] = ner[i + j]
                    pred_nel[i + j] = cell
            elif r < 0.65 and ln > 1:  # boundary shift (V/VI)
                for j in range(1, ln):
                    pred_ner[i + j] = ("B-" if j == 1 else "I-") + t
                    pred_nel[i + j] = q if rng.random() < 0.7 else rng.choice(QIDS)
            elif r < 0.75:  # mid-span link change (pred split rule)
                for j in range(ln):
                    pred_ner[i + j] = ner[i + j]
                    pred_nel[i + j] = q if j == 0 else rng.choice(QIDS)
            elif r < 0.85:  # '_' link inside a NER span (dropped by tags)
                for j in range(ln):
                    pred_ner[i + j] = ner[i + j]
                    pred_nel[i + j] = "_"
            # else: miss entirely (III)
            i += ln + rng.randint(1, 3)
        else:
            # occasional singleton link on an O token (utils.py:395-396)
            if rng.random() < 0.08:
                gold_nel[i] = rng.choice(QIDS)
            if rng.random() < 0.08:
                pred_nel[i] = rng.choice(QIDS)
                if rng.random() < 0.3:
                    pred_nel[i] += "|" + rng.choice(QIDS)
            i += 1
    # consecutive equal links across two entities (concatNIL trap)
    if n > 12 and rng.random() < 0.8:
        q = rng.choice(QIDS)
        for base in (n - 8, n - 5):
            for j in range(2):
                ner[base + j] = ("B-" if j == 0 else "I-") + rng.choice(TYPES)
                gold_nel[base + j] = q
                pred_ner[base + j] = ner[base + j]
                pred_nel[base + j] = q
        # make them adjacent in pred (no gap)
        for j in range(n - 6, n - 5):
            pred_nel[j] = q

    def lines(ner_col, nel_col):
        out = [f"# document_id = fuzzdoc{doc_i}", "# date = 1920-01-01"]
        for k in range(n):
            out.append("\t".join([
                toks[k], ner_col[k], "O", ner_col[k], "O", "O", "O",
                nel_col[k], "_", "_"]))
        return out

    return lines(ner, gold_nel), lines(pred_ner, pred_nel)


def main():
    outdir = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import os
    os.makedirs(outdir, exist_ok=True)
    for p in range(n_pairs):
        rng = random.Random(1000 + p)
        gold_lines = [HEADER]
        pred_lines = [HEADER]
        for d in range(rng.randint(3, 5)):
            g, q = gen_doc(rng, d)
            gold_lines += g
            pred_lines += q
        gold_f = f"{outdir}/fuzz-{p}-true.tsv"
        pred_f = f"{outdir}/fuzz-{p}-pred.tsv"
        open(gold_f, "w").write("\n".join(gold_lines) + "\n")
        open(pred_f, "w").write("\n".join(pred_lines) + "\n")
        for tag, extra in (
            ("original_n1", ["--merge-lines"]),
            ("original_n3", ["--merge-lines", "--nbest", "3"]),
            ("ner_n1", ["--merge-lines", "--ner-col", "NE-COARSE-LIT"]),
        ):
            out = subprocess.run(
                [sys.executable, "tools/run_hipe_scorer.py", gold_f, pred_f,
                 "NEL-LIT", "nel"] + extra,
                capture_output=True, text=True, check=True)
            ref = json.loads(out.stdout)
            with open(f"{outdir}/fuzz-{p}-{tag}.json", "w") as f:
                json.dump(ref, f, indent=1)
        print(f"pair {p}: {len(gold_lines)} lines")


if __name__ == "__main__":
    main()
