"""Driver-contract checks: multi-chip dry run on the virtual CPU mesh."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
