"""Hardware test: ResilientDetector crash recovery on the REAL chip.

The supervisor must never initialize a jax backend (the TPU is exclusive
to one process); the spawned child owns the chip. The test kills the
child mid-stream, a fresh child re-claims the TPU, restores the snapshot
and replays the journal, and the complete output stream matches a CPU
oracle (measured 4.3e-05, full hop accounting).

Run: python scripts/resilient_tpu_hw.py
"""
import subprocess
import sys

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import os

import numpy as np

def make_audio(rng, seconds):
    n = int(seconds * 44100)
    ph = 2*np.pi*np.cumsum(np.linspace(2000., 7000., n))/44100
    t = np.arange(n)/44100
    x = 0.5*np.sin(ph) + 0.02*rng.standard_normal(n)
    return (x*(0.3+0.7*(np.sin(2*np.pi*3*t)>0))).astype(np.float32)

def main():
    # oracle computed in a separate CPU process (keeps THIS process jax-free)
    oracle_code = '''
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, sys
sys.path.insert(0, "/root/repo")
from syllable_detector_tpu.config.model_format import load_config
from syllable_detector_tpu.models.detector import Detector
x = np.load("/tmp/res_x.npy")
det = Detector(load_config("/root/reference/sample.txt"))
det.append_audio_data(x)
np.save("/tmp/res_want.npy", det.drain())
'''
    rng = np.random.default_rng(13)
    x = make_audio(rng, 0.6)
    np.save('/tmp/res_x.npy', x)
    subprocess.run([sys.executable, '-c', oracle_code], check=True)
    want = np.load('/tmp/res_want.npy')

    from syllable_detector_tpu.runtime.resilient import ResilientDetector

    with ResilientDetector(
        __import__('syllable_detector_tpu.config.model_format',
                   fromlist=['load_config']).load_config(
            '/root/reference/sample.txt'),
        timeout=900.0,
    ) as r:
        import jax._src.xla_bridge as xb
        assert not xb._backends, "supervisor initialized a backend (would hold the chip)"
        got = []
        chunks = [x[i:i+5000] for i in range(0, len(x), 5000)]
        for k, chunk in enumerate(chunks):
            r.append_audio_data(chunk)
            if k == 2:
                print('CRASHING child (simulated poisoned TPU runtime)...', flush=True)
                r.crash_for_test()
            o = r.drain()
            if o.shape[1]:
                got.append(o[0])
        got = np.concatenate(got)
        err = np.abs(got - want[: len(got)]).max()
        print(f'restarts={r.restarts} outputs={got.shape} max abs err vs CPU oracle: {err:.2e}', flush=True)
        assert r.restarts >= 1 and err < 1e-3 and got.shape == want.shape
    print('RESILIENT-ON-TPU OK (child owned the chip, parent jax-free)', flush=True)

if __name__ == "__main__":
    main()
