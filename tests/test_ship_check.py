"""The evidence-artifact ship gate runs inside the test suite: a
SCALE.md "measured" citation without its recorded JSON key, or a
plan-audited query missing from PLANS.md, fails pytest itself
(round-6 VERDICT #4 — both round-5 defects become unshippable)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_evidence_artifacts_consistent():
    from ship_check import check

    assert check(REPO) == []


def test_gate_catches_unrecorded_citation(tmp_path):
    """The round-5 defect class reproduced: a cited key absent from
    the JSON must be flagged."""
    from ship_check import _scale_citation_problems

    (tmp_path / "SCALE.md").write_text(
        "Measured ladder: `SCALE_TRAINOPS.json:fixed_batch_ghost`."
    )
    (tmp_path / "SCALE_TRAINOPS.json").write_text(json.dumps({"real": 1}))
    (tmp_path / "SCALE_CURVE.json").write_text("{}")
    problems = _scale_citation_problems(tmp_path)
    assert len(problems) == 1 and "fixed_batch_ghost" in problems[0]


def test_gate_catches_missing_plan_entry(tmp_path):
    """The other round-5 defect class: a plan-audited query with no
    PLANS.md section must be flagged (here against a stripped copy of
    the real PLANS.md, with the audit list pinned explicitly)."""
    import re

    from ship_check import _plan_audit_problems

    real = (REPO / "PLANS.md").read_text()
    first = re.search(r"^## (\w+)$", real, flags=re.MULTILINE).group(1)
    stripped = real.replace(f"## {first}\n", f"## {first}_renamed\n", 1)
    (tmp_path / "PLANS.md").write_text(stripped)
    problems = _plan_audit_problems(tmp_path, required=[first])
    assert len(problems) == 1 and first in problems[0]
    # and the intact copy passes for the same audit list
    (tmp_path / "PLANS.md").write_text(real)
    assert _plan_audit_problems(tmp_path, required=[first]) == []


def test_gate_scans_every_markdown_file(tmp_path):
    """Round-6 VERDICT #1a: the unbacked-citation defect shipped
    *around* the SCALE.md-only gate, in COVERAGE.md — a citation of a
    missing key in ANY builder markdown must now fail (judge-authored
    VERDICT.md/ADVICE.md excepted: they cite keys as instructions)."""
    from ship_check import _scale_citation_problems

    (tmp_path / "COVERAGE.md").write_text(
        "evidence: `SCALE_TRAINOPS.json:never_recorded_key`"
    )
    (tmp_path / "VERDICT.md").write_text(
        "record SCALE_TRAINOPS.json:future_key next round"
    )
    (tmp_path / "SCALE_TRAINOPS.json").write_text(json.dumps({"real": 1}))
    (tmp_path / "SCALE_CURVE.json").write_text("{}")
    problems = _scale_citation_problems(tmp_path)
    assert len(problems) == 1
    assert "COVERAGE.md" in problems[0]
    assert "never_recorded_key" in problems[0]


def test_gate_catches_stale_cited_literal(tmp_path):
    """Round-7 VERDICT #1b — the third-round defect class made
    unshippable: a paragraph citing a recorded key but quoting a
    superseded run's numbers (the N→M and exponent shapes) must fail;
    the same paragraph with the recorded numbers must pass."""
    from ship_check import _literal_freshness_problems

    (tmp_path / "SCALE_TRAINOPS.json").write_text(json.dumps({
        "mask_fold": {
            "runs": [
                {"scale": 1, "seconds": 1.622, "bytes": 229458},
                {"scale": 64, "seconds": 2.254, "bytes": 1159506},
            ],
            "seconds_exponent": 0.079,
        }
    }))
    (tmp_path / "SCALE_CURVE.json").write_text("{}")
    stale = (
        "Measured: scoped fold 1.5→2.3 s across 64× (exponent 0.08) — "
        "`SCALE_TRAINOPS.json:mask_fold`."
    )
    (tmp_path / "SCALE.md").write_text(stale)
    problems = _literal_freshness_problems(tmp_path)
    assert len(problems) == 1 and "'1.5'" in problems[0], problems
    fresh = (
        "Measured: scoped fold 1.6→2.3 s across 64× (exponent 0.08), "
        "bytes 0.23→1.16 MB — `SCALE_TRAINOPS.json:mask_fold`."
    )
    (tmp_path / "SCALE.md").write_text(fresh)
    assert _literal_freshness_problems(tmp_path) == []
    # a paragraph with no citation is not policed (plain prose)
    (tmp_path / "SCALE.md").write_text("grew 1.5→2.3 s somewhere")
    assert _literal_freshness_problems(tmp_path) == []
