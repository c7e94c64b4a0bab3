"""Driver-contract tests: __graft_entry__ entry() and dryrun_multichip."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_rejects_too_many():
    import __graft_entry__ as g

    with pytest.raises(RuntimeError):
        g.dryrun_multichip(1024)
