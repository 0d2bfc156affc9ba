"""Driver-evidence staleness gate (round-8 verdict, next-round #2).

The driver hash-verifies only the FIRST 50 registry entries per round, so a
query's official green can silently age while its host module keeps
changing — exactly what happened to the 14 r5 greens flagged by the round-8
verdict (corpus.py took 11 commits after their last driver row). This test
makes that impossible to miss: a registry query whose latest driver green
is >= STALE_ROUNDS rounds old *and* whose host module changed since that
round's snapshot commit MUST occupy one of the current 50 verify slots.

Round arithmetic: the round "in progress" is max(recorded rounds) + 1 —
CORRECTNESS_r{N}.json lands in the `round N: verdict/...` driver commit,
which is also the code snapshot the round-N evidence was produced from.

Queries with NO driver row at all (new this round) must always be slotted.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STALE_ROUNDS = 4  # a green this many rounds behind the in-progress round


def _latest_greens() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    rounds: set[int] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.add(r)
        for q, v in json.load(open(f)).items():
            green = (
                v.get("err") is None
                and v.get("rows_match")
                and v.get("hash_match") is not False  # rows-only: None
            )
            if green:
                latest[q] = max(latest.get(q, 0), r)
    return latest, (max(rounds) + 1 if rounds else 1)


def _round_commit(r: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(rf"round {r}: verdict", subject):
            return sha
    return None


def _changed_since(commit: str, relpath: str) -> bool:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{commit}..HEAD", "--", relpath],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return bool(out.strip())


def _module_relpath(qname: str) -> str:
    from kitkat_spark.queries import QUERIES

    mod = sys.modules[QUERIES[qname].__module__]
    return os.path.relpath(mod.__file__, REPO)


def test_stale_changed_queries_are_slotted():
    from kitkat_spark.queries import QUERIES

    latest, current = _latest_greens()
    slots = set(list(QUERIES)[:50])
    commit_cache: dict[int, str | None] = {}
    violations = []
    for q in QUERIES:
        r = latest.get(q)
        if r is None:
            if q not in slots:
                violations.append((q, "never driver-verified"))
            continue
        if current - r < STALE_ROUNDS or q in slots:
            continue
        commit = commit_cache.setdefault(r, _round_commit(r))
        if commit is None:
            continue  # round commit not found (shallow clone): skip
        rel = _module_relpath(q)
        if _changed_since(commit, rel):
            violations.append((q, f"green r{r}, {rel} changed since"))
    assert not violations, (
        f"stale driver evidence must be re-slotted in queries._VERIFY_FIRST "
        f"(first 50): {violations}"
    )
