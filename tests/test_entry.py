"""Driver entry points: single-chip trace + multi-chip dry run."""

import jax
import pytest

import __graft_entry__ as entry_mod


def test_entry_traces():
    fn, args = entry_mod.entry()
    # lowering (trace) must succeed; full compile is exercised by the driver
    jax.jit(fn).lower(*args)


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    entry_mod.dryrun_multichip(8)
