"""Multi-host smoke test: 2 jax.distributed CPU processes, 8-device
global mesh, row-band sharded render identical on both hosts (SURVEY.md
§4's prescribed multi-node substitute; VERDICT r2 item 8)."""

import pathlib
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_dryrun():
    script = (
        pathlib.Path(__file__).resolve().parents[1]
        / "experiments"
        / "dryrun_multihost.py"
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=560,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"
        },
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "MULTIHOST DRYRUN OK" in out.stdout
