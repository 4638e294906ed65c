"""ONE-command round closure (round-6 verdict task #1).

Rounds 5 and 6 both shipped commits past the committed verification
record. This tool makes the round's final act mechanical and
self-checking -- run it LAST, and its output IS the final commit:

    python tools/close_round.py --round 7 [--commit]

Steps, in order, each a hard gate (any failure aborts with a nonzero
exit and NO artifacts are committed):

1. Full correctness gate at THREE scales (sf0.001, sf0.01, sf0.1),
   each scale a fresh subprocess/JVM, all writing
   ``CORRECTNESS_local_r{N}.txt`` (first scale truncates, later scales
   append, every run prefixed with a header line).
   ``check_correctness.py`` itself errors if a full run covers fewer
   names than the registry; this tool ADDITIONALLY re-parses the
   artifact and asserts each scale section names every registered
   query with an ``ok`` line.
2. ``plan_audit.py`` regeneration of PLANS.md -- its completeness
   guard errors if any registered query lacks an AUDIT entry (or an
   entry is stale/duplicated), so PLANS.md can no longer trail the
   registry.
3. Bench coverage rule (``bench.assert_bench_coverage``) -- every
   registered query is benched or explicitly excluded with a category.
4. COVERAGE.md cross-check: the file's LAST ``Registry: N`` statement
   must equal the live registry count.
5. With ``--commit``: git-add the artifacts and commit them as the
   round's closing commit.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1"]


def registry_names() -> set[str]:
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import (
        all_queries,
    )
    return set(all_queries())


def run_gate(artifact: str) -> None:
    for i, sf in enumerate(SCALES):
        flag = "--out" if i == 0 else "--out-append"
        print(f"== close_round: full gate at {sf} ==", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/check_correctness.py"),
             flag, artifact, sf],
            cwd=REPO,
        )
        if r.returncode != 0:
            raise SystemExit(f"gate FAILED at {sf} (see {artifact})")


def verify_artifact(artifact: str, names: set[str]) -> None:
    """Re-parse the artifact: each full-run section must carry an
    ``ok`` line for every registered query."""
    sections: list[tuple[str, set[str]]] = []
    with open(artifact) as f:
        for line in f:
            if line.startswith("# run:"):
                sections.append((line.strip(), set()))
            elif line.startswith("ok   ") and sections:
                sections[-1][1].add(line.split()[1].rstrip(":"))
    full = [(h, oks) for h, oks in sections if "filter=FULL" in h]
    if len(full) != len(SCALES):
        raise SystemExit(
            f"artifact has {len(full)} full-run sections, expected "
            f"{len(SCALES)} -- stale or partial {artifact}"
        )
    for header, oks in full:
        missing = names - oks
        if missing:
            raise SystemExit(
                f"artifact section {header!r} missing ok-lines for "
                f"{len(missing)} queries: {sorted(missing)[:10]}..."
            )
    print(f"artifact OK: {len(full)} scales x {len(names)} queries green")


def run_plan_audit() -> None:
    print("== close_round: regenerating PLANS.md ==", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/plan_audit.py")],
        cwd=REPO,
    )
    if r.returncode != 0:
        raise SystemExit("plan_audit FAILED (completeness or plan error)")


def check_bench_coverage() -> None:
    import bench
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import (
        all_queries,
    )
    bench.assert_bench_coverage(all_queries())
    print(f"bench coverage OK: {len(bench.HEADLINE)} benched + "
          f"{len(bench.BENCH_EXCLUDED)} excluded")


def check_coverage_md(n_registry: int) -> None:
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    counts = re.findall(r"Registry(?:\s+count)?:\s*(\d+)", text)
    if not counts:
        raise SystemExit("COVERAGE.md states no 'Registry: N' count")
    if int(counts[-1]) != n_registry:
        raise SystemExit(
            f"COVERAGE.md's last registry count {counts[-1]} != live "
            f"registry {n_registry} -- update the narrative before closing"
        )
    print(f"COVERAGE.md OK: registry count {counts[-1]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--commit", action="store_true",
                    help="git-commit the artifacts on success")
    ap.add_argument("--skip-gate", action="store_true",
                    help="re-verify an existing artifact without re-running "
                         "(for resuming after an unrelated failure)")
    args = ap.parse_args()
    artifact = os.path.join(REPO, f"CORRECTNESS_local_r{args.round}.txt")

    names = registry_names()
    print(f"registry: {len(names)} queries")
    check_bench_coverage()
    check_coverage_md(len(names))
    if not args.skip_gate:
        run_gate(artifact)
    verify_artifact(artifact, names)
    run_plan_audit()

    if args.commit:
        files = [artifact, os.path.join(REPO, "PLANS.md")]
        subprocess.run(["git", "add"] + files, cwd=REPO, check=True)
        r = subprocess.run(
            ["git", "commit", "-m",
             f"Close round {args.round}: full three-scale gate artifact + "
             "regenerated plan audit"],
            cwd=REPO,
        )
        if r.returncode != 0:
            raise SystemExit("git commit failed (nothing to commit?)")
    print("close_round: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
