#!/usr/bin/env python
"""Regenerate README.md's test-count sentence from pytest --collect-only.

Rounds 2-4 each flagged the front page lagging the suite (the counts were
hand-maintained and every round added tests after the README was last
touched). This script makes the number mechanical:

    python scripts/update_test_counts.py          # rewrite README in place
    python scripts/update_test_counts.py --check  # exit 1 if README is stale

The sentence it owns matches the regex in COUNT_RE; everything after the
colon is left alone.
"""

import argparse
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
COUNT_RE = re.compile(
    r"\d+ test instances \(\d+ functions; \d+ in the default profile, \d+\n"
    r"`-m slow` heavies")


def collect(extra=()):
    """-> (selected, collected) from one pytest --collect-only run.

    pytest prints "N tests collected" when nothing is deselected and
    "S/N tests collected (D deselected)" otherwise — the conftest
    deselects -m slow by default, so the plain run shows BOTH numbers;
    taking only the first (as this script originally did) reported the
    default profile as the total and "0 slow".
    """
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         *extra],
        cwd=ROOT, capture_output=True, text=True)
    m = re.search(r"(\d+)(?:/(\d+))? tests collected", out.stdout)
    if not m:
        raise SystemExit(f"could not parse pytest collect output:\n"
                         f"{out.stdout[-2000:]}")
    selected = int(m.group(1))
    return selected, int(m.group(2) or selected)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    default, total = collect()
    slow = total - default
    # functions: count unique test function names (parametrize collapses)
    # over the FULL collection (-m '' overrides the default deselection)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-m", ""],
        cwd=ROOT, capture_output=True, text=True)
    funcs = len({line.split("[")[0] for line in out.stdout.splitlines()
                 if "::" in line})

    new = (f"{total} test instances ({funcs} functions; {default} in the "
           f"default profile, {slow}\n`-m slow` heavies")
    readme = (ROOT / "README.md").read_text()
    if not COUNT_RE.search(readme):
        raise SystemExit("README test-count sentence not found "
                         "(COUNT_RE out of sync)")
    updated = COUNT_RE.sub(new, readme)
    if args.check:
        if updated != readme:
            print(f"README stale: suite has {total} instances "
                  f"({default} default + {slow} slow, {funcs} functions)")
            return 1
        print("README test counts current")
        return 0
    (ROOT / "README.md").write_text(updated)
    print(f"README updated: {total} instances ({funcs} functions; "
          f"{default} default + {slow} slow)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
