"""Repo hygiene: claims in the docs must be backed by files in git.

Round-4 lesson (VERDICT r4 "What's missing" #1/#2): docs/RESULTS.md cited
evidence files that were lost to a workspace reset, and the golden
extraction capsule the test suite asserts on was silently swallowed by a
blanket ``*.npz`` gitignore — so a fresh clone failed its own suite while
the docs claimed otherwise.  These tests make both failure modes loud.
"""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args):
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True)


def _tracked(path):
    return _git("ls-files", "--error-unmatch", path).returncode == 0


def _cited_evidence_paths():
    """Every exps/... evidence file cited in docs/RESULTS.md."""
    text = open(os.path.join(REPO, "docs", "RESULTS.md")).read()
    paths = set(re.findall(r"exps/[\w./-]+?\.(?:jsonl?|log)", text))
    assert paths, "RESULTS.md cites no evidence files — parsing broke?"
    return sorted(paths)


def test_results_md_citations_exist():
    missing = [p for p in _cited_evidence_paths()
               if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, (
        f"docs/RESULTS.md cites evidence files that do not exist: {missing}")


def test_results_md_citations_tracked_in_git():
    """Existing locally is not enough — a fresh clone must get them."""
    if _git("rev-parse", "--git-dir").returncode != 0:
        import pytest
        pytest.skip("not a git checkout")
    untracked = [p for p in _cited_evidence_paths() if not _tracked(p)]
    assert not untracked, (
        f"docs/RESULTS.md cites evidence files that are not in git "
        f"(gitignored or never added): {untracked}")


def test_asserted_test_fixtures_not_gitignored():
    """Any file under tests/ that exists on disk must be visible to git —
    a gitignored fixture passes locally and breaks every fresh clone."""
    if _git("rev-parse", "--git-dir").returncode != 0:
        import pytest
        pytest.skip("not a git checkout")
    bad = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "tests")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".pyc", ".log")):
                continue
            rel = os.path.relpath(os.path.join(root, f), REPO)
            if _git("check-ignore", "-q", rel).returncode == 0:
                bad.append(rel)
    assert not bad, f"test fixtures are gitignored: {bad}"
