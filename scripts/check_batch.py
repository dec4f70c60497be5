# -*- coding: utf-8 -*-
"""Validate a TSV batch of lexicon entries against the gold oracle.

Usage: python scripts/check_batch.py <batch.tsv>
Prints one line per entry that disagrees with gold under primary_match
(word, ours, gold) so authoring errors can be reviewed and fixed by hand.
Entries for words gold doesn't have are counted but not printed.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from scripts.eval_en_oracle import load_gold, gold_variants, primary_match  # noqa: E402


def main():
    gold = load_gold()
    if gold is None:
        print("no gold; skipping")
        return 0
    n = bad = oov = 0
    with open(sys.argv[1], encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, _, ipa = line.partition("\t")
            if not ipa:
                continue
            n += 1
            value = gold.get(word) or gold.get(word.lower()) \
                or gold.get(word.capitalize())
            if value is None:
                oov += 1
                continue
            refs = gold_variants(value)
            if not any(primary_match(ipa, r) for r in refs):
                bad += 1
                print(f"{word}\t{ipa}\t{refs[0]}")
    print(f"# {n} entries, {oov} not in gold, {bad} disagree", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
