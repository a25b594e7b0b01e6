"""Driver entry-point smoke tests: entry() serves the flagship fused path
and matches the unfused XLA oracle."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_fused_matches_unfused():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.ndim == 2 and out.shape[1] >= 1

    from syllable_detector_tpu.models.detector import offline_outputs

    _, spec, params = __graft_entry__._sample_setup()
    # entry's example input is the pre-slabbed [rows, hop] form; the
    # unfused oracle consumes the flat sample stream
    x1d = np.asarray(args[0]).reshape(-1)
    want = np.asarray(offline_outputs(spec, params, x1d))[: out.shape[0]]
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)
