"""Deploy-only-what-changed gate (reference parity).

The reference CI deploys a component (UDF / stored-proc directory) only when
``git diff`` shows changes under it since a ref
(``scripts/deployment_files/snowflake_deployer.py:210-237``, wired into
``.github/workflows/snowpark-ci-cd.yml``). The engine analogue: each package
component (operators, sources, plans, streaming, ops, functions, queries) is
a deploy unit; this tool reports which units changed so CI can re-run only
their test modules.

Usage::

    python scripts/deploy_changed.py [--ref HEAD~1] [--repo /root/repo]

Prints one line per changed component: ``<component>\t<test module>``, and
exits 0. No changes -> prints nothing (the CI job skips everything).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

PACKAGE = "incremental_datapipeline_using_snowflake_spark"

# component -> test modules that cover it (the deploy action for an engine
# library is "re-verify", the analogue of the reference's re-CREATE)
COMPONENT_TESTS = {
    f"{PACKAGE}/operators": ["tests/test_operators.py", "tests/test_properties.py"],
    f"{PACKAGE}/sources": ["tests/test_pipeline.py"],
    f"{PACKAGE}/plans": ["tests/test_pipeline.py", "tests/test_plans.py"],
    f"{PACKAGE}/streaming": ["tests/test_streaming.py", "tests/test_stateful.py"],
    f"{PACKAGE}/ops": ["tests/test_ops.py", "tests/test_multimodal.py"],
    f"{PACKAGE}/functions": ["tests/test_kernels.py"],
    f"{PACKAGE}/queries": ["tests/test_plans.py"],
}


def changed_paths(repo: str, ref: str) -> list[str]:
    """``git diff --name-only <ref> HEAD`` relative to the repo root; on any
    git failure, returns a sentinel meaning "assume everything changed"
    (the reference's fail-open behavior)."""
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", ref, "HEAD"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return ["*"]
    return [p for p in out.strip().splitlines() if p]


def changed_components(repo: str, ref: str) -> dict[str, list[str]]:
    """Map of changed component -> its test modules."""
    paths = changed_paths(repo, ref)
    if paths == ["*"]:
        return dict(COMPONENT_TESTS)
    out: dict[str, list[str]] = {}
    for comp, tests in COMPONENT_TESTS.items():
        if any(p.startswith(comp + "/") or p == comp for p in paths):
            out[comp] = tests
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD~1")
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    args = ap.parse_args()
    for comp, tests in sorted(changed_components(args.repo, args.ref).items()):
        print(f"{comp}\t{' '.join(tests)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
