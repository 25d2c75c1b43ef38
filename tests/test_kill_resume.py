"""Kill/resume (SURVEY.md §5.2 #6): a validation subprocess is SIGKILLed
mid-run; the restarted run skips every window already bearing _DONE and the
final outputs match a clean uninterrupted run."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SCRIPT = """
import sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from driftray.pipeline import run_validation
from driftray.spec import repo_files_spec
run_validation({input!r}, {out!r}, repo_files_spec(),
               check_uniqueness=False, windows_per_pass=1)
print("COMPLETE")
"""


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from driftray.fixtures import RepoFilesConfig, write_repo_files

    d = str(tmp_path_factory.mktemp("kill_fixture"))
    write_repo_files(d, 6000, RepoFilesConfig(window_rows=1000))
    return d


def _launch(fixture_dir, out):
    code = RUN_SCRIPT.format(repo=REPO, input=f"{fixture_dir}/repo_files.parquet",
                             out=out)
    return subprocess.Popen([sys.executable, "-c", code], cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)


def _done_windows(out):
    if not os.path.isdir(out):
        return set()
    return {d for d in os.listdir(out)
            if d.startswith("window=") and os.path.exists(f"{out}/{d}/_DONE")}


@pytest.mark.timeout(600)
def test_sigkill_mid_run_then_resume(fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    proc = _launch(fixture_dir, out)
    # wait for at least one window to complete, then SIGKILL the whole run
    deadline = time.time() + 240
    while time.time() < deadline and len(_done_windows(out)) < 1:
        if proc.poll() is not None:
            break
        time.sleep(0.5)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        killed = True
    else:
        killed = False  # machine was fast enough to finish — still verifies resume
    done_after_kill = _done_windows(out)
    assert killed is False or len(done_after_kill) < 6, "kill landed too late to test"

    # restart: must complete the remaining windows and touch nothing done
    mtimes = {w: os.path.getmtime(f"{out}/{w}/_DONE") for w in done_after_kill}
    p2 = _launch(fixture_dir, out)
    out2, _ = p2.communicate(timeout=300)
    assert "COMPLETE" in out2
    assert len(_done_windows(out)) == 6
    for w, m in mtimes.items():
        assert os.path.getmtime(f"{out}/{w}/_DONE") == m, f"{w} was recomputed"

    # and the merged lineage equals a clean single run
    clean = str(tmp_path / "clean")
    p3 = _launch(fixture_dir, clean)
    p3.communicate(timeout=300)
    for w in range(6):
        with open(f"{out}/window={w}/lineage.json") as f:
            a = json.load(f)
        with open(f"{clean}/window={w}/lineage.json") as f:
            b = json.load(f)
        assert a["counters"] == b["counters"]
        assert a["n_rows"] == b["n_rows"]
