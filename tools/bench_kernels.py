#!/usr/bin/env python
"""Speed-of-light fractions for the RRC-FIR and FFT kernels (BASELINE.md:
'speed-of-light fraction reported for the RRC-FIR and FFT kernels').

Both kernels at these SDR shapes are HBM-bandwidth-bound on TPU, so the
primary SoL metric is achieved bytes/s vs HBM peak; achieved FLOP/s vs
MXU peak is reported for context. Measured with the marginal-time method
(see bench.py; the axon tunnel adds a large fixed per-call overhead).

v5e (v5 lite) reference numbers: ~197 TFLOP/s bf16 MXU peak, ~0.82 TB/s
HBM bandwidth.

Usage: python tools/bench_kernels.py  -> one JSON line per kernel.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_PEAK = 0.82e12          # bytes/s
MXU_PEAK_F32 = 49e12        # FLOP/s (f32 on the bf16 MXU, conservative)


def marginal_time(fn, arg, reps=4):
    import jax
    best1 = best4 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(arg)
        float(np.asarray(r).ravel()[0])
        best1 = min(best1, time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        r = arg
        for _ in range(reps):
            r = fn(r) if r.shape == arg.shape else fn(arg)
        float(np.asarray(r).ravel()[0])
        best4 = min(best4, time.perf_counter() - t0)
    return max((best4 - best1) / (reps - 1), 1e-9)


def bench_fir():
    import jax
    import jax.numpy as jnp
    from leansdr_tpu.dsp import filtergen

    # 64-channel RRC matched filter, the north-star preprocessing shape.
    C, n = 64, 1 << 20
    taps = filtergen.root_raised_cosine(64, 0.25, 0.35)
    nt = len(taps)
    k = jnp.asarray(taps.reshape(1, 1, nt))

    tapsj = [jnp.float32(float(v)) for v in taps]

    @jax.jit
    def fir(x):
        # Shifted-add FIR over [C*2, n+nt] (real/imag planes on the batch
        # axis): XLA fuses the nt adds into one streaming pass — the
        # shape of a bandwidth-bound FIR on TPU.
        acc = jnp.zeros((C * 2, n), jnp.float32)
        for k in range(nt):
            acc = acc + tapsj[k] * jax.lax.dynamic_slice_in_dim(
                x, nt - 1 - k, n, axis=1)
        return acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C * 2, n + nt)).astype(np.float32))
    dt = marginal_time(fir, x)
    flops = 2 * C * 2 * n * nt
    bytes_moved = 2 * C * 2 * n * 4
    return {
        "kernel": "rrc_fir",
        "samples_per_s": round(C * n / dt / 1e6, 1),
        "gflops": round(flops / dt / 1e9, 1),
        "gbps": round(bytes_moved / dt / 1e9, 1),
        "sol_hbm_fraction": round(bytes_moved / dt / HBM_PEAK, 3),
        "sol_mxu_fraction": round(flops / dt / MXU_PEAK_F32, 4),
    }


def bench_fft():
    import jax
    import jax.numpy as jnp

    # The channelizer/notch shape: batched 4096-point FFTs.
    B, N = 4096, 4096

    @jax.jit
    def fft(x):
        return jnp.fft.fft(x, axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(B, N))
                     + 1j * rng.normal(size=(B, N))).astype(np.complex64))
    dt = marginal_time(fft, x)
    flops = 5 * B * N * np.log2(N)
    bytes_moved = 2 * B * N * 8
    return {
        "kernel": "fft4096",
        "transforms_per_s": round(B / dt, 0),
        "gflops": round(flops / dt / 1e9, 1),
        "gbps": round(bytes_moved / dt / 1e9, 1),
        "sol_hbm_fraction": round(bytes_moved / dt / HBM_PEAK, 3),
        "sol_mxu_fraction": round(flops / dt / MXU_PEAK_F32, 4),
    }


def main():
    for r in (bench_fir(), bench_fft()):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
