#!/usr/bin/env python3
"""Generate seeded randomized TIME/LED slice fixtures + reference-scorer
expected results (differential fuzz for the token-level sliced evaluation:
SpanEval.reportSlicedTokens / NelEval.reportSlicedFromTokens).

No sliced expectations are committed anywhere in the reference repo, so
these regimes (`--time_period`, `--noise_level`) can only be validated
differentially. Planted edge cases:
  - documents on both sides of the period boundary, incl. exactly at the
    start (inclusive) and exactly at the end (exclusive);
  - a pred document whose date differs from gold (the filter must read
    the GOLD token's date, filter_entities_by_date);
  - LED annotations on gold entity tokens, incl. MIXED LED within one
    entity (token filtering truncates/splits the span) and LED exactly at
    a band edge; pred OCR-INFO carries DIFFERENT values (the filter must
    read the GOLD token's LED, filter_entities_by_noise);
  - un-annotated tokens (kept by every noise band);
  - the usual NER/NEL perturbations (boundary shifts, wrong types/links,
    misses, spurious singletons).

Per pair writes 13-column TSVs and expected JSONs for:
  nerc (NE-COARSE-LIT) x {all, time, led_lo, led_hi}
  nel original mode n_best=1 x {all, time, led_lo, led_hi}
  nel ner-boundary mode n_best=1 x {all, time, led_lo, led_hi}

Usage: python3 tools/gen_slice_fuzz.py OUTDIR [n_pairs]
"""
import json
import random
import subprocess
import sys

HEADER = ("TOKEN\tNE-COARSE-LIT\tNE-COARSE-METO\tNE-FINE-LIT\tNE-FINE-METO"
          "\tNE-FINE-COMP\tNE-NESTED\tNEL-LIT\tNEL-METO\tRENDER\tSEG"
          "\tOCR-INFO\tMISC")

QIDS = ["Q1", "Q7", "Q42", "Q130879", "NIL"]
TYPES = ["org", "loc", "pers"]
DATES = ["1890-05-01", "1900-01-01", "1915-07-23", "1929-12-31",
         "1930-01-01", "1950-03-03"]

TIME = ("1900-01-01", "1930-01-01")
LED_LO = (0.0, 0.1)
LED_HI = (0.1, 1.1)


def gen_doc(rng, doc_i):
    n = rng.randint(20, 50)
    toks = [f"w{doc_i}t{i}" for i in range(n)]
    g_ner = ["O"] * n
    g_nel = ["_"] * n
    g_ocr = ["_"] * n
    p_ner = ["O"] * n
    p_nel = ["_"] * n
    p_ocr = ["_"] * n

    i = 0
    while i < n - 4:
        if rng.random() < 0.4:
            ln = rng.randint(1, 3)
            # "up-upi" exercises get_all_tags' last-dash-segment quirk:
            # its tag is "upi" != its e_type, so the scorer silently drops
            # these entities from BOTH sides — the engine's gate must too
            t = rng.choice(TYPES + (["up-upi"] if rng.random() < 0.25 else []))
            q = rng.choice(QIDS)
            # LED shapes: none / uniform / mixed-within-entity / band edge
            led_mode = rng.random()
            for j in range(ln):
                g_ner[i + j] = ("B-" if j == 0 else "I-") + t
                g_nel[i + j] = q
                if led_mode < 0.25:
                    pass  # un-annotated: kept by every band
                elif led_mode < 0.55:
                    g_ocr[i + j] = f"LED{rng.choice([0.0,0.05,0.23,0.47]):.2f}"
                elif led_mode < 0.85:
                    g_ocr[i + j] = f"LED{rng.choice([0.0,0.05,0.1,0.3]):.2f}"
                    if j > 0 and rng.random() < 0.8:  # mixed within entity
                        g_ocr[i + j] = f"LED{rng.choice([0.02,0.15,0.4]):.2f}"
                else:
                    g_ocr[i + j] = "LED0.10"  # exactly at the band edge
                # adversarial: pred OCR-INFO differs — must be ignored
                p_ocr[i + j] = f"LED{rng.random():.2f}"
            r = rng.random()
            if r < 0.4:  # exact copy
                for j in range(ln):
                    p_ner[i + j] = g_ner[i + j]
                    p_nel[i + j] = q
            elif r < 0.55:  # wrong type and/or link, same span; half the
                # time the right link hides in a ranked |-alternative, so
                # n_best=1 and n_best=3 sliced expectations diverge
                t2 = rng.choice([x for x in TYPES if x != t])
                q2 = rng.choice([x for x in QIDS if x != q])
                cell = q2 if rng.random() < 0.5 else f"{q2}|{q}"
                for j in range(ln):
                    p_ner[i + j] = ("B-" if j == 0 else "I-") + t2
                    p_nel[i + j] = cell
            elif r < 0.7 and ln > 1:  # boundary shift
                for j in range(1, ln):
                    p_ner[i + j] = ("B-" if j == 1 else "I-") + t
                    p_nel[i + j] = q if rng.random() < 0.7 else rng.choice(QIDS)
            elif r < 0.8:  # span extended one token right
                for j in range(ln + 1):
                    if i + j < n:
                        p_ner[i + j] = ("B-" if j == 0 else "I-") + t
                        p_nel[i + j] = q
            # else: miss (III)
            i += ln + rng.randint(1, 3)
        else:
            if rng.random() < 0.06:  # spurious singleton pred; "time" never
                # occurs in gold, so the NERC tag gate must drop it
                p_ner[i] = "B-" + rng.choice(TYPES + ["time"])
                p_nel[i] = rng.choice(QIDS)
            if rng.random() < 0.05:  # singleton gold link on O token
                g_nel[i] = rng.choice(QIDS)
                g_ocr[i] = f"LED{rng.choice([0.05,0.2]):.2f}"
            i += 1

    def lines(date, ner, nel, ocr):
        out = [f"# document_id = slicedoc{doc_i}", f"# date = {date}"]
        for k in range(n):
            out.append("\t".join([
                toks[k], ner[k], "O", ner[k], "O", "O", "O",
                nel[k], "_", "_", "_", ocr[k], "_"]))
        return out

    date = rng.choice(DATES)
    # one doc per pair: pred carries a DIFFERENT date — the reference
    # filters on the gold token's date, so this must not change anything
    pred_date = "1850-01-01" if doc_i == 1 else date
    return (lines(date, g_ner, g_nel, g_ocr),
            lines(pred_date, p_ner, p_nel, p_ocr))


SLICES = [
    ("all", []),
    ("time", ["--time-period", f"{TIME[0]},{TIME[1]}"]),
    ("led_lo", ["--noise-level", f"{LED_LO[0]},{LED_LO[1]}"]),
    ("led_hi", ["--noise-level", f"{LED_HI[0]},{LED_HI[1]}"]),
]


def main():
    outdir = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import os
    os.makedirs(outdir, exist_ok=True)
    for p in range(n_pairs):
        rng = random.Random(7000 + p)
        gold_lines = [HEADER]
        pred_lines = [HEADER]
        for d in range(rng.randint(4, 6)):
            g, q = gen_doc(rng, d)
            gold_lines += g
            pred_lines += q
        gold_f = f"{outdir}/sf-{p}-true.tsv"
        pred_f = f"{outdir}/sf-{p}-pred.tsv"
        open(gold_f, "w").write("\n".join(gold_lines) + "\n")
        open(pred_f, "w").write("\n".join(pred_lines) + "\n")
        for sname, sargs in SLICES:
            for tag, cmd in (
                (f"nerc_{sname}",
                 ["NE-COARSE-LIT", "nerc"]),
                (f"nel_orig_{sname}",
                 ["NEL-LIT", "nel", "--merge-lines"]),
                (f"nel_ner_{sname}",
                 ["NEL-LIT", "nel", "--merge-lines",
                  "--ner-col", "NE-COARSE-LIT"]),
                (f"nel_n3_{sname}",
                 ["NEL-LIT", "nel", "--merge-lines", "--nbest", "3"]),
            ):
                out = subprocess.run(
                    [sys.executable, "tools/run_hipe_scorer.py",
                     gold_f, pred_f] + cmd + sargs,
                    capture_output=True, text=True, check=True)
                ref = json.loads(out.stdout)
                with open(f"{outdir}/sf-{p}-{tag}.json", "w") as f:
                    json.dump(ref, f, indent=1)
        print(f"pair {p}: {len(gold_lines)} lines")


if __name__ == "__main__":
    main()
