"""The graded multi-process dryrun path (VERDICT r3 item 3), pinned.

`__graft_entry__._dryrun_multiprocess` is what the driver's
`dryrun_multichip` runs in addition to the single-process virtual
meshes: a 2-process jax.distributed cluster (gloo CPU collectives)
executing the FULL loop — train step + beam-3 decode + eval loss — over
the GLOBAL data mesh with the dataset host-sharded per process, parent
asserting cross-process loss equality. This test runs it at 2x2 (two
processes, two virtual devices each) so the pytest suite keeps the
driver artifact's code path green without the driver.
"""

import importlib.util
import os
import sys


def test_dryrun_multiprocess_2x2(capsys):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_graft_entry_test", os.path.join(repo, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_graft_entry_test"] = mod
    spec.loader.exec_module(mod)

    mod._dryrun_multiprocess(4, nprocs=2)  # asserts internally
    out = capsys.readouterr().out
    assert "dryrun_multichip ok: multiprocess 2proc x 2dev" in out
    assert "cross-process loss equal" in out
