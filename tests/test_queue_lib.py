"""Queue-marker verification (scripts/queue_lib.sh).

Round-4 post-mortem: five queue steps were recorded done by bare
touch-files without ever running (VERDICT r4 weak #5) — a watchdog
restart then silently skipped a whole measurement round. The hardened
markers record their output artifacts and re-verify them, so an empty
or hand-touched marker no longer skips a step.
"""

import subprocess
from pathlib import Path

import pytest

LIB = Path(__file__).resolve().parents[1] / "scripts" / "queue_lib.sh"


def run_sh(snippet: str, cwd) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["bash", "-c", f"set -u; . {LIB}; {snippet}"],
        cwd=cwd, capture_output=True, text=True)


@pytest.fixture
def qdir(tmp_path):
    (tmp_path / "exp").mkdir()
    return tmp_path


def test_marker_requires_artifacts(qdir):
    r = run_sh("marker s1", qdir)
    assert r.returncode != 0
    assert "no artifacts declared" in r.stderr
    assert not (qdir / "exp/.queue/s1.done").exists()


def test_marker_refuses_missing_artifact(qdir):
    r = run_sh("marker s1 exp/out.log", qdir)
    assert r.returncode != 0
    assert "REFUSED" in r.stderr
    assert not (qdir / "exp/.queue/s1.done").exists()


def test_marker_refuses_empty_artifact(qdir):
    (qdir / "exp/out.log").touch()
    r = run_sh("marker s1 exp/out.log", qdir)
    assert r.returncode != 0
    assert "REFUSED" in r.stderr


def test_marker_roundtrip_and_done(qdir):
    (qdir / "exp/out.log").write_text("finished\n")
    (qdir / "exp/best.mdl").write_text("weights")
    r = run_sh("marker s1 exp/out.log exp/best.mdl && done_already s1", qdir)
    assert r.returncode == 0, r.stderr
    recorded = (qdir / "exp/.queue/s1.done").read_text().splitlines()
    assert recorded == ["exp/out.log", "exp/best.mdl"]


def test_hand_touched_empty_marker_does_not_skip(qdir):
    (qdir / "exp/.queue").mkdir()
    (qdir / "exp/.queue/s1.done").touch()  # the round-4 failure mode
    r = run_sh("done_already s1", qdir)
    assert r.returncode != 0


def test_marker_with_deleted_artifact_reruns(qdir):
    (qdir / "exp/out.log").write_text("finished\n")
    assert run_sh("marker s1 exp/out.log", qdir).returncode == 0
    (qdir / "exp/out.log").unlink()  # e.g. an exp/ wipe
    assert run_sh("done_already s1", qdir).returncode != 0


def test_step_runs_until_marked(qdir):
    (qdir / "exp/out.log").write_text("x\n")
    r = run_sh("start=1; step 1 s1 && marker s1 exp/out.log; "
               "step 1 s1 && echo RERUN || echo SKIP", qdir)
    assert r.returncode == 0
    assert r.stdout.strip().endswith("SKIP")


def test_r4c_queue_embeds_same_semantics(qdir):
    """The running queue keeps an inline copy; its marker must refuse a
    missing artifact too (guards against the lib and the inline copy
    drifting apart)."""
    r4c = Path(__file__).resolve().parents[1] / "scripts" / "tpu_queue_r4c.sh"
    src = r4c.read_text()
    assert "REFUSED: missing/empty artifact" in src
    assert 'printf \'%s\\n\' "$@" > "exp/.queue/$name.done"' in src
