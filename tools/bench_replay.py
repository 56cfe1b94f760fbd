"""Same-data code-replay bench: run a PREVIOUS round's bench.py against
TODAY's testdata.

Why: the round driver regenerates the testdata parquet between rounds, so
round-over-round bench deltas conflate code changes with data-epoch
changes (r3→r4: same-code queries moved +30% on regenerated files, and
the r3 code crashed outright on the r4 physical timestamp type). Running
the previous round's code on the CURRENT files isolates the code delta.

The "previous round" resolves to the most recent commit whose subject
matches ``round N: ...`` — the driver's end-of-round snapshot commit —
unless ``--ref`` pins something else. The commit is checked out into a
throwaway ``git worktree`` under $TMPDIR and its own bench.py runs there
with the same SPARK_GRAFT_* environment.

Usage: python tools/bench_replay.py [--ref COMMIT] [--timeout 900]
Prints ONE JSON line: {"ref": sha, "subject": ..., "parsed": {...bench json...}}
(or {"ref": ..., "error": ...} when the replay fails — e.g. the old code
cannot read today's files, which is itself signal).

bench.py embeds this as the ``replay`` block of its own JSON line BY
DEFAULT (the driver's per-round BENCH capture must carry it); export
SPARK_GRAFT_REPLAY=0 to skip it while iterating locally.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def resolve_previous_round_ref() -> tuple[str, str] | None:
    """(sha, subject) of the most recent driver end-of-round commit.

    Matched against the SUBJECT line only, in Python — `git log --grep`
    matches any line of the message BODY too, and commit bodies in this
    repo routinely quote "round N:" strings (survey notes, this very
    file's docstring), which would misresolve the snapshot."""
    import re

    out = subprocess.run(
        ["git", "log", "--format=%H\x01%s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition("\x01")
        if re.match(r"^round \d+:", subject):
            return sha, subject
    return None


def pick_parsed(stdout: str) -> tuple[dict | None, str]:
    """Pick the replayed bench's record from its stdout JSON lines.

    The replayed bench (r5+) prints the FULL record on an earlier line
    and a compact line last; the compact line POPS 'queries' past the
    driver's 1500-char tail, which silently disabled the caller's
    headline adjudication (ADVICE r11). Prefer the last line that still
    carries per-query timings — it also brings 'queries_steady',
    enabling best-vs-best comparison — and say which line was used so a
    missing-queries replay is visible on the record. Pure for tests."""
    parsed_lines = []
    for line in stdout.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed_lines.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # progress-bar chunk merged into the line
    if not parsed_lines:
        return None, "none"
    # A compact line under the tail limit ALSO carries 'queries' (same
    # first-run values) but never 'queries_steady' — rank full-record
    # lines above it so best-vs-best adjudication keeps its evidence.
    def rank(p: dict) -> int:
        if isinstance(p.get("queries_steady"), dict):
            return 2
        if isinstance(p.get("queries"), dict):
            return 1
        return 0

    best = max(rank(p) for p in parsed_lines)
    picked = [p for p in parsed_lines if rank(p) == best][-1]
    return picked, {2: "full", 1: "queries_no_steady", 0: "compact_no_queries"}[
        best
    ]


def replay(ref: str | None = None, timeout: int = 900) -> dict:
    if ref is None:
        resolved = resolve_previous_round_ref()
        if resolved is None:
            return {"error": "no 'round N:' commit found to replay"}
        sha, subject = resolved
    else:
        sha = subprocess.run(
            ["git", "rev-parse", ref], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        subject = subprocess.run(
            ["git", "log", "-n", "1", "--format=%s", sha], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    wt = tempfile.mkdtemp(prefix=f"lakeshack_replay_{sha[:8]}_")
    result: dict = {"ref": sha, "subject": subject}
    try:
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, sha],
            cwd=REPO, capture_output=True, text=True, check=True,
        )
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the worktree's own modules only
        # The replayed bench.py (r5+) has its own replay block — without
        # this, each replay would replay ITS previous round, recursing
        # through the whole round history.
        env["SPARK_GRAFT_REPLAY"] = "0"
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=wt, env=env,
            capture_output=True, text=True, timeout=timeout,
        )
        if proc.returncode != 0:
            result["error"] = (proc.stderr or proc.stdout)[-2000:]
            return result
        parsed, which = pick_parsed(proc.stdout)
        if parsed is None:
            result["error"] = "no JSON line in replayed bench output"
            return result
        result["parsed"] = parsed
        result["parsed_line"] = which
        return result
    except subprocess.TimeoutExpired:
        result["error"] = f"replay timed out after {timeout}s"
        return result
    except subprocess.CalledProcessError as exc:
        result["error"] = (exc.stderr or str(exc))[-2000:]
        return result
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True, text=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    print(json.dumps(replay(args.ref, args.timeout)))


if __name__ == "__main__":
    main()
