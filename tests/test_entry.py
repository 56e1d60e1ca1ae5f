"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 gate failure: dryrun_multichip imported JAX without forcing the CPU
platform, so the real TPU client initialized (and died on a libtpu version
mismatch through the axon tunnel). These tests pin the hermetic behavior.
"""

import jax

import __graft_entry__ as entrymod


def test_dryrun_multichip_8_devices():
    # conftest already forces cpu/8; the entry must also be safe to call and
    # must run one full DP train step to a finite loss.
    entrymod.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    fn, args = entrymod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[2].shape[0], 3)
    assert bool(jax.numpy.isfinite(out).all())
