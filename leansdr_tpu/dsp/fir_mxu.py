"""Causal FIR as a banded matmul on the MXU.

The streaming Pallas formulation (fir_pallas.py) reads each sample once
and accumulates all taps in vector registers, but every tap costs a
lane-rotate plus an FMA on the VPU, so at SDR tap counts (~65 for the
RRC matched filter, filtergen.h:68-92 / leandvb.cc:364) it is
VPU-THROUGHPUT-bound, not HBM-bound: measured 3.6 Gsamples/s on v5e
(0.07 of HBM peak) for 65 taps — ~0.9 TFLOP/s effective against a
~4 TFLOP/s f32 VPU, with the gap going to the per-tap lane shifts.

The FLOPs belong on the MXU (systolic array).  Convolution by a short
real tap vector is a BANDED Toeplitz matmul: split time into blocks of
B=128 outputs; block b's outputs need inputs from blocks b-1 and b only
(ntaps <= B+1), so

    y[r, b, j] = sum_m x[r, b-1, m] * A_hi[m, j] + x[r, b, m] * A_lo[m, j]
    A_lo[m, j] = taps[j - m]       (0 <= j - m  < ntaps, else 0)
    A_hi[m, j] = taps[j + B - m]   (0 <= j+B-m < ntaps, else 0)

i.e. two [B, B] constant matrices and two [R*nb, B] @ [B, B] matmuls
that XLA tiles straight onto the MXU.  Measured on v5e at the
north-star shape (128 rows x 2^18 samples, 65 taps):

    precision=HIGHEST (f32-via-bf16 passes): 13.5 Gsamples/s,
        0.26 of HBM peak, max rel err ~2e-7 vs float64 convolve
        (f32-grade — the shipped default);
    precision=DEFAULT (bf16 multiplies):     28.7 Gsamples/s,
        0.56 of HBM peak, rel err ~3e-3 (throughput mode for
        non-decision paths).

3.7x / 7.9x the streaming Pallas kernel.  The FLOP overhead of the
band (2*2*B MACs per output vs 2*ntaps useful) is what the MXU's
~12x FLOP advantage over the VPU buys down.

Reference parity: same math as fir_filter's real-tap path
(dsp.h:219-285) up to f32 summation order; decision-path acceptance is
TS-level (SURVEY.md section 7.2), and the exact-parity golden path is
unchanged (dsp/blocks.py on host).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

B = 128


def make_bands(taps) -> tuple[np.ndarray, np.ndarray]:
    """Banded Toeplitz factors (A_lo, A_hi), each [B, B] float32."""
    t = np.asarray(taps, np.float32)
    nt = len(t)
    if nt > B + 1:
        raise ValueError(f"{nt} taps > {B + 1}: needs a third band")
    m, j = np.meshgrid(np.arange(B), np.arange(B), indexing="ij")
    k_lo = j - m
    k_hi = j + B - m
    A_lo = np.where((k_lo >= 0) & (k_lo < nt),
                    t[np.clip(k_lo, 0, nt - 1)], 0)
    A_hi = np.where((k_hi >= 0) & (k_hi < nt),
                    t[np.clip(k_hi, 0, nt - 1)], 0)
    return A_lo.astype(np.float32), A_hi.astype(np.float32)


@partial(jax.jit, static_argnames=("taps", "precision"))
def fir_mxu(x: jnp.ndarray, taps: tuple,
            precision: str = "highest") -> jnp.ndarray:
    """Causal FIR over the last axis: y[r,t] = sum_k taps[k] x[r,t-k].

    x [R, n] float32 with n % 128 == 0; taps: static tuple of floats
    (ntaps <= 129); zeros before the stream head.  precision:
    "highest" (f32-grade, default) or "default" (bf16 multiplies).
    """
    R, n = x.shape
    if n % B:
        raise ValueError(f"n={n} not a multiple of {B}")
    A_lo, A_hi = make_bands(taps)
    xb = x.reshape(R, n // B, B)
    xp = jnp.pad(xb[:, :-1], ((0, 0), (1, 0), (0, 0)))
    y = (jnp.einsum("rbm,mj->rbj", xb, jnp.asarray(A_lo),
                    precision=precision)
         + jnp.einsum("rbm,mj->rbj", xp, jnp.asarray(A_hi),
                      precision=precision))
    return y.reshape(R, n)


@partial(jax.jit, static_argnames=("taps", "precision"))
def fir_mxu_valid(x: jnp.ndarray, taps: tuple,
                  precision: str = "highest") -> jnp.ndarray:
    """VALID-mode correlation on the MXU: y[r,t] = sum_k taps[k] x[r,t+k],
    t in [0, n - ntaps + 1).

    The chunked-streaming contract: filter history is IN-BAND — callers
    pass ntaps-1 samples of readahead overlap in x (as the matched
    filter in pipelines/multi_rx.py does), so the kernel itself stays
    stateless and no boundary carry is needed.  Arbitrary n (padded to
    the 128-block grid internally).
    """
    n = x.shape[1]
    nt = len(taps)
    pad = -n % B
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    y = fir_mxu(x, tuple(taps)[::-1], precision=precision)
    return y[:, nt - 1:n]
