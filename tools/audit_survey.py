#!/usr/bin/env python3
"""Audit SURVEY.md's operator-inventory gate columns.

Every row of the SURVEY section-2 tables must point at something
that exists: a qNN gate registered in SparkEntry.queries and/or a
ScalaTest class that is actually defined (classes live inside
arbitrary .scala files, so grep for the definition, not the file
name).

Usage: python3 tools/audit_survey.py   (exit 1 on dangling refs)
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def survey_rows():
    rows, in_s2 = [], False
    for line in open(os.path.join(ROOT, "SURVEY.md")):
        if line.startswith("## 2."):
            in_s2 = True
            continue
        if in_s2 and line.startswith("## "):
            break
        if in_s2 and line.startswith("|") and not line.startswith("|---"):
            rows.append(line.rstrip())
    return rows


def main():
    entry = open(os.path.join(
        ROOT, "src/main/scala/graft/SparkEntry.scala")).read()
    gates = set(re.findall(r'"(q\d+[a-z0-9_]*)"', entry))
    classes = set()
    test_dir = os.path.join(ROOT, "src/test/scala/graft")
    for f in os.listdir(test_dir):
        if f.endswith(".scala"):
            src = open(os.path.join(test_dir, f)).read()
            classes.update(re.findall(r"class\s+(\w+)\s+extends", src))
    bad = []
    for r in survey_rows():
        cols = [c.strip() for c in r.split("|")]
        gatecol = cols[-2] if cols and cols[-1] == "" else cols[-1]
        toks = re.findall(r"q\d+|[A-Z]\w*Spec", gatecol)
        for t in toks:
            if t.startswith("q"):
                if not any(g == t or g.startswith(t + "_") for g in gates):
                    bad.append((t, gatecol[:70]))
            elif t not in classes:
                bad.append((t, gatecol[:70]))
    print(f"rows audited: {len(survey_rows())}, dangling refs: {len(bad)}")
    for t, ctx in bad:
        print(f"  DANGLING {t}  in: {ctx}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
