"""Docs-artifact consistency guard.

Rounds 3 and 4 both shipped docs citing measurement artifacts
(SERVE_r04.json) that existed nowhere in the repo — an uncommitted
artifact is indistinguishable from an invented one (VERDICT r04 weak
#1). This test makes that failure class impossible: every
``{BENCH,SERVE,TRAIN,MULTICHIP}_rNN`` citation anywhere in the docs or
the package must resolve to a committed JSON file at the repo root.
"""

import json
import os
import re
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# suffixed stems (e.g. a builder-measured BENCH_r05_qwen_builder.json)
# are artifacts too — a citation of one must also resolve to a
# committed file, not just the bare driver-written _rNN names
CITE = re.compile(r"\b((?:BENCH|SERVE|TRAIN|MULTICHIP)_r\d+(?:_[a-z0-9_]+)?)\b")

# Everything a reader might treat as a claim: top-level docs, docs/,
# tools/README, and the package source (code comments cite artifacts too).
SCAN = ["README.md", "PARITY.md", "BASELINE.md", "bench.py",
        "bench_serve.py", "bench_train.py", "__graft_entry__.py"]


def _scan_files():
    for name in SCAN:
        path = os.path.join(ROOT, name)
        if os.path.exists(path):
            yield path
    for sub in ("docs", "tools", "crab_tpu", "tests"):
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, sub)):
            for f in files:
                if f.endswith((".md", ".py")):
                    yield os.path.join(dirpath, f)


def _citations():
    cites = {}
    for path in _scan_files():
        if os.path.abspath(path) == os.path.abspath(__file__):
            continue
        with open(path, errors="replace") as fh:
            for lineno, line in enumerate(fh, 1):
                for m in CITE.finditer(line):
                    cites.setdefault(m.group(1), []).append(
                        f"{os.path.relpath(path, ROOT)}:{lineno}"
                    )
    return cites


def _tracked():
    try:
        out = subprocess.run(
            ["git", "ls-files"], cwd=ROOT, capture_output=True, text=True,
            timeout=30,
        )
        if out.returncode == 0:
            return set(out.stdout.split())
    except (OSError, subprocess.TimeoutExpired):
        pass
    return None  # no git — fall back to existence-only checks


def test_every_cited_artifact_exists_and_is_tracked():
    cites = _citations()
    assert cites, "scanner is broken: no artifact citations found at all"
    tracked = _tracked()
    problems = []
    for stem, sites in sorted(cites.items()):
        fname = stem + ".json"
        path = os.path.join(ROOT, fname)
        if not os.path.exists(path):
            problems.append(
                f"{fname} cited at {sites[:3]} but does not exist"
            )
            continue
        if tracked is not None and fname not in tracked:
            problems.append(
                f"{fname} cited at {sites[:3]} but is not committed "
                "(git ls-files does not list it)"
            )
    assert not problems, "phantom artifact citations:\n" + "\n".join(problems)


def test_cited_artifacts_are_valid_json():
    for stem in sorted(_citations()):
        path = os.path.join(ROOT, stem + ".json")
        if not os.path.exists(path):
            pytest.skip("existence failures reported by the other test")
        with open(path) as fh:
            json.load(fh)  # raises on truncated/corrupt artifacts
