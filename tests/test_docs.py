"""Docs integrity guard (round-3 verdict weak #2 / next #7).

Round 3 shipped a capability report citing chip-run artifacts that were
never produced.  This test makes that structurally impossible: every
repo-path reference in ``docs/*.md`` and ``README.md`` must point at an
existing file or directory.

Conventions the scanner honors:
  * glob/template tokens (``*``, ``{``, ``<``) are not concrete paths;
  * ``assets/`` is volatile training output (gitignored, rotated
    between rounds): bare run-dir mentions (no file extension) are
    provenance prose, and a line marked ``(rotated)`` cites data that
    was deliberately cleaned up after its numbers were recorded;
  * ``PARITY.md`` is excluded — its left column names *reference-repo*
    paths by design.
"""

import glob
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAT = re.compile(
    r"\b(docs|scripts|tests|conf|prior_diffuse_tpu|assets)/[A-Za-z0-9_./{<*-]+"
)


def _doc_files():
    return sorted(glob.glob(os.path.join(ROOT, "docs", "*.md"))) + [
        os.path.join(ROOT, "README.md")
    ]


def test_no_phantom_path_references():
    missing = []
    for md in _doc_files():
        with open(md) as f:
            for lineno, line in enumerate(f, 1):
                if "(rotated)" in line:
                    continue
                for m in PAT.finditer(line):
                    p = m.group(0).rstrip("./")
                    if any(c in p for c in "*{<"):
                        continue  # glob / template, not a concrete path
                    if p.startswith("assets/"):
                        if "." not in os.path.basename(p):
                            continue  # run-dir provenance prose
                        if not os.path.isdir(os.path.join(ROOT, "assets")):
                            continue  # fresh clone: assets/ absent by design
                    if not os.path.exists(os.path.join(ROOT, p)):
                        missing.append(
                            f"{os.path.relpath(md, ROOT)}:{lineno}: {p}"
                        )
    assert not missing, (
        "docs cite nonexistent paths (phantom artifacts):\n"
        + "\n".join(missing)
    )


def test_scanner_sees_real_references():
    """Self-check: the scanner actually extracts references (an empty
    scan would make the guard vacuous)."""
    refs = []
    for md in _doc_files():
        with open(md) as f:
            refs += PAT.findall(f.read())
    assert len(refs) > 10
