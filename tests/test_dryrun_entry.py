"""The driver's certification entry points, run as CI.

Round-4 lesson: a 629-test green suite coexisted with a RED driver
multichip signal because nothing under tests/ invoked
``__graft_entry__.dryrun_multichip`` — the dp/tp/fsdp/sp/pp/LoRA-quant/
w8a8/generate composition it exercises is not covered end-to-end anywhere
else. These tests run the exact functions the driver runs, in the same
virtual 8-device CPU environment (conftest.py), so the suite is red
whenever the driver's check would be.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft_entry


def test_entry_compiles():
    fn, args = graft_entry.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


@pytest.mark.slow
def test_dryrun_multichip_8():
    # Same environment as the driver: conftest already forced the CPU
    # platform with 8 virtual devices; dryrun_multichip asserts it got 8.
    graft_entry.dryrun_multichip(8)
