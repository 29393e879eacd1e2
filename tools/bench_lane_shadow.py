#!/usr/bin/env python
"""VERDICT r3 item 9: is the demod kernel's per-step cost at the
64-channel north-star shape issue/latency-bound (flat in lane count) or
dependency/occupancy-bound?

Measures the Mosaic demod kernel (carrier PLL + M&M timing + demap,
dsp/receiver_pallas.py) wall time per chunk at 64/128/256/512 channels
with a FIXED per-channel chunk length, using the serialized device-loop
marginal.  If wall(128) ~ wall(64), the second lane-half is free — an
odd/even time-segment interleave (two chunk streams per channel with
state handoff, as parallel/timeshard.py does across devices) would
double per-channel throughput inside ONE kernel.  If wall scales with
channels, the kernel is already throughput-bound and the interleave
buys nothing.

Usage: python tools/bench_lane_shadow.py
Prints one JSON line per channel count.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench_demod(nchan, nsamp=None):
    import jax
    import jax.numpy as jnp
    from leansdr_tpu.dsp import receiver, receiver_pallas as rp
    from leansdr_tpu.dsp.cstln import Predef, make_dvbs2_constellation

    nsamp = nsamp or 512 * receiver.CHUNK
    cstln = make_dvbs2_constellation(Predef.QPSK, "1/2")
    params = receiver.ReceiverParams(omega=2.0, sampler="rrc",
                                     nsymbols=4, exact_lut=False)
    sc = rp.sym_constants(cstln)
    planes = rp.pack_state(receiver.init_state(params, nchan))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(
        scale=75.0, size=(nchan, nsamp + 1, 2)).astype(np.float32))

    def call(st):
        st, packed = rp.demod_pallas(params, sc, st, x)
        return st, packed

    st, _ = call(planes)
    float(np.asarray(st).sum())

    def timed(reps):
        best = 1e9
        for _ in range(3):
            st = planes
            t0 = time.perf_counter()
            for _ in range(reps):
                st, out = call(st)
            float(np.asarray(st).sum())
            best = min(best, time.perf_counter() - t0)
        return best

    marginal = max((timed(4) - timed(1)) / 3, 1e-9)
    return marginal, nchan * nsamp / marginal / 1e6


def main():
    import jax
    from leansdr_tpu.util.jax_cache import setup_cache
    setup_cache(REPO)
    base = None
    for nc in (64, 128, 256, 512):
        wall, msps = bench_demod(nc)
        if base is None:
            base = wall
        print(json.dumps({
            "metric": "demod_kernel_lane_scaling",
            "nchan": nc,
            "wall_ms_per_chunk": round(wall * 1e3, 2),
            "msamples_per_s": round(msps, 1),
            "wall_vs_64ch": round(wall / base, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
