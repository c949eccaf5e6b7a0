"""Two-process (DCN-shaped) sharded-solve dryrun — exercises
jax.distributed.initialize, a process-spanning mesh, cross-process psum
diagnostics and addressable-shard extraction (multihost_dryrun.py).

Marked slow (spawns two fresh interpreters; ~1-2 min): CI runs it on the
full -m slow job, the default job skips it."""

import json
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = pathlib.Path(__file__).resolve().parent.parent


def test_two_process_sharded_solve(tmp_path):
    env = dict(
        PYTHONPATH=str(_REPO),
        PATH="/usr/bin:/bin:/usr/local/bin",
        MULTIHOST_PORT="53731",
    )
    proc = subprocess.run(
        [sys.executable, str(_REPO / "multihost_dryrun.py")],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    result = json.loads((tmp_path / "MULTIHOST.json").read_text())
    assert result["ok"] is True
    # r4 schema: both the 2x4 and the 4x2 process/device topologies
    topos = {(t["processes"], t["devices_per_process"])
             for t in result["topologies"]}
    assert topos == {(2, 4), (4, 2)}
    assert all(t["ok"] for t in result["topologies"])
