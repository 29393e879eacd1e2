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


def marginal_time(fn, arg, reps_lo=4, reps_hi=16):
    """Per-invocation kernel time, measured with a DEVICE-SIDE loop.

    The round-2 version issued independent host dispatches and took the
    marginal between 1 and R of them; over the axon tunnel the per-rep
    work (<1 ms for these shapes) drowned in ms-scale dispatch jitter,
    the marginal went <=0, and the 1e-9 floor fabricated impossible
    numbers (BENCH_r02's fft4096_per_s = 1.024e12).  Now the rep loop is
    a `lax.fori_loop` INSIDE one jitted program:

      * iterations are serialized by the loop carry (the digest feeds a
        tiny in-place dynamic-update-slice of the carried input buffer,
        so XLA's loop-invariant code motion cannot hoist the kernel out,
        and the update aliases the carry -- no extra full-array pass);
      * one timed call covers reps_hi kernel executions, so the marginal
        (t_hi - t_lo)/(reps_hi - reps_lo) cancels ALL fixed dispatch
        overhead and sits far above timer noise.
    """
    import functools

    import jax
    import jax.numpy as jnp

    zidx = (0,) * arg.ndim

    @functools.partial(jax.jit, static_argnums=1)
    def loop(a, reps):
        def body(_, carry):
            a, s = carry
            # In-place on the loop carry; value is ~s*1e-30 (negligible,
            # but data-dependent so nothing can be hoisted or elided).
            a = a.at[zidx].add(s * jnp.asarray(1e-30, a.dtype))
            y = fn(a)
            return a, s + jnp.sum(y.reshape(-1)[:8]).astype(a.dtype)
        _, s = jax.lax.fori_loop(
            0, reps, body, (a, jnp.zeros((), arg.dtype)))
        return s

    def run(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(arg, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    run(reps_lo)   # compile both trip-count variants before timing
    run(reps_hi)
    dt = (run(reps_hi) - run(reps_lo)) / (reps_hi - reps_lo)
    assert dt > 0, f"non-positive marginal {dt}; measurement invalid"
    return dt


def bench_fir():
    import jax
    import jax.numpy as jnp
    from leansdr_tpu.dsp import filtergen

    # 64-channel RRC matched filter, the north-star preprocessing shape.
    C, n = 64, 1 << 18
    taps = filtergen.root_raised_cosine(64, 0.25, 0.35)
    nt = len(taps)

    from leansdr_tpu.dsp.fir_mxu import fir_mxu
    tt = tuple(float(v) for v in taps)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C * 2, n)).astype(np.float32))
    # Headline: the MXU banded-matmul kernel at f32-grade precision
    # (dsp/fir_mxu.py) — the fast path for real-tap batched FIRs.
    dt = marginal_time(
        jax.jit(lambda a: fir_mxu(a, tt, precision="highest")), x)
    # Throughput mode (bf16 multiplies) and the streaming Pallas
    # kernel (dsp/fir_pallas.py, VPU-bound at this tap count), for the
    # record.
    dt_bf16 = marginal_time(
        jax.jit(lambda a: fir_mxu(a, tt, precision="default")), x)
    from leansdr_tpu.dsp.fir_pallas import fir_pallas
    dt_vpu = marginal_time(jax.jit(lambda a: fir_pallas(a, tt)), x)
    flops = 2 * C * 2 * n * nt
    bytes_moved = 2 * C * 2 * n * 4
    sol = bytes_moved / dt / HBM_PEAK
    assert sol <= 1.5, f"impossible SoL {sol}: measurement collapsed"
    assert bytes_moved / dt_bf16 / HBM_PEAK <= 1.5
    assert bytes_moved / dt_vpu / HBM_PEAK <= 1.5
    return {
        "kernel": "rrc_fir",
        "samples_per_s": round(C * n / dt / 1e6, 1),
        "gflops": round(flops / dt / 1e9, 1),
        "gbps": round(bytes_moved / dt / 1e9, 1),
        "sol_hbm_fraction": round(bytes_moved / dt / HBM_PEAK, 3),
        "sol_mxu_fraction": round(flops / dt / MXU_PEAK_F32, 4),
        "sol_hbm_fraction_bf16": round(
            bytes_moved / dt_bf16 / HBM_PEAK, 3),
        "sol_hbm_fraction_pallas_vpu": round(
            bytes_moved / dt_vpu / HBM_PEAK, 3),
    }


def bench_fft():
    import jax
    import jax.numpy as jnp

    # The channelizer/notch shape: batched 4096-point FFTs.
    B, N = 1024, 4096

    from leansdr_tpu.dsp.fft import fft_planes

    @jax.jit
    def fft(x):
        yr, yi = fft_planes(x[..., 0], x[..., 1], N)
        return jnp.stack([yr, yi], axis=-1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
    dt = marginal_time(fft, x)
    flops = 5 * B * N * np.log2(N)
    bytes_moved = 2 * B * N * 8
    sol = bytes_moved / dt / HBM_PEAK
    assert sol <= 1.5, f"impossible SoL {sol}: measurement collapsed"
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
