"""The driver entry points must always work: single-chip forward compile
and the full multichip dry run (GSPMD + shard_map) on the virtual mesh."""
import jax
import numpy as np


class TestGraftEntry:
    def test_entry_forward(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.ndim == 3
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()

    def test_dryrun_multichip(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)  # raises on any compile/execute failure
