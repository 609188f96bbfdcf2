"""The driver entry points must always work: entry() compiles single-device
and dryrun_multichip(8) runs the full sharded step on the virtual mesh.
(Round 2 regression: a decode_db call-signature change broke the dryrun
without any suite test noticing.)"""
import jax


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    d, i = out
    assert d.shape[0] == i.shape[0]


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
