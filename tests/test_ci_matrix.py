"""The GitHub workflow's regression matrix must stay in lockstep with the
local runner's (`tst/launch_ci_runner.py::MATRIX`) — the workflow is the
public matrix of record (reference: `.github/workflows/ci.yml:122-140`
carries the full set of gated configs there), and round-4 review found the
two had drifted (6 rows present locally but absent from the workflow).

This test parses the workflow YAML and compares row-for-row against the
runner's non-slow rows, so adding a gate to one place without the other
fails CI instead of silently narrowing public coverage.
"""

import os
import sys

import yaml

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tst"))


def _runner_rows():
    import launch_ci_runner as runner

    rows = set()
    for row in runner.MATRIX:
        script, deck, ndev, extra = row[:4]
        slow = len(row) > 4 and row[4] == "slow"
        if slow:
            continue
        rows.add((script, deck, ndev, " ".join(extra)))
    return rows


def _workflow_rows():
    path = os.path.join(_ROOT, ".github", "workflows", "ci.yml")
    with open(path) as f:
        wf = yaml.safe_load(f)
    include = wf["jobs"]["regression"]["strategy"]["matrix"]["include"]
    return {
        (r["script"], r["input"], int(r["devices"]), r.get("args", "").strip())
        for r in include
    }


def test_workflow_matrix_matches_runner():
    runner = _runner_rows()
    workflow = _workflow_rows()
    missing = runner - workflow
    extra = workflow - runner
    assert not missing and not extra, (
        f"workflow/runner matrix drift:\n  missing from workflow: "
        f"{sorted(missing)}\n  extra in workflow: {sorted(extra)}"
    )
