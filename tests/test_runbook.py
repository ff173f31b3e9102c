"""Real-weights runbook (runs/real_weights_runbook.sh): structure + the
stages runnable in this download-blocked env.

The heavy full-geometry dry run is scripts/runbook_dryrun.py (run manually,
~10 min; its result is recorded in COVERAGE.md) — these tests pin the
script's grammar and that every path it references exists, so the runbook
cannot rot silently.
"""

import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RUNBOOK = REPO / "runs" / "real_weights_runbook.sh"


def test_runbook_exists_and_parses():
    assert RUNBOOK.exists()
    # bash syntax check
    r = subprocess.run(["bash", "-n", str(RUNBOOK)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


def test_runbook_referenced_paths_exist():
    text = RUNBOOK.read_text()
    for rel in re.findall(r"(?:tests|scripts)/[\w./]+\.(?:py|sh)", text):
        assert (REPO / rel).exists(), rel
    # the CLI surface it drives
    assert (REPO / "segment.py").exists()
    # the parity stage's pytest marker is registered (a typo'd marker
    # would silently select nothing)
    assert "requires_weights" in (REPO / "pyproject.toml").read_text()


def test_runbook_rejects_unknown_stage():
    r = subprocess.run(["bash", str(RUNBOOK), "nonsense"],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "unknown stage" in r.stderr
