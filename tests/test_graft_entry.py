"""Driver entry-point contract: dryrun_multichip runs a fully sharded train
step on the virtual 8-device mesh (what the driver executes)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "OK" in out
    assert "'data': 4" in out and "'model': 2" in out


def test_dryrun_multichip_odd():
    # odd device counts fall back to pure DP
    graft.dryrun_multichip(1)
