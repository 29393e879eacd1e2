"""Fused four-step FFT as one Pallas pass (cfft_engine, dsp.h:56-116).

The XLA four-step (dsp/fft.py) materializes each stage in HBM: two
batched complex matmuls (4 dots each), a twiddle pass and layout
copies — measured ~0.3 of HBM-peak speed of light at the 4096-point
channelizer shape.  One 4096-point frame is only 32 KB, so the whole
transform fits VMEM: this kernel loads a tile of frames ONCE, runs
both DFT stages + twiddle entirely on-chip, and writes the result
ONCE — the HBM traffic is the input+output floor.

Layout trick: every stage is a `dot_general` CONTRACTING DIM 0 of both
operands (the MXU's native transpose-A mode), so the kernel contains
NO vector transposes at all:

  stage 1   D[b, 2k1]  = sum_2a X3[2a, b]  W1[2a, 2k1]
  twiddle   B = D * t[b, k1]   (elementwise, re/im lanes)
  stage 2   Y[2q, k1]  = sum_2b B3[2b, k1] W2p[2b, 2q]   (output
            packed as its own transpose: rows q, lanes k1)
  output    y[q*64 + k1] = row-major flatten of Y's halves.

Complex arithmetic rides the 2x2 real block packing along each
contraction axis: [re; im] rows against [[Wr, Wi], [-Wi, Wr]].
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
N1 = 64          # x[a*64 + b]; DFT_64 over a, twiddle, DFT_64 over b
FRAMES = 8       # frames per grid step (VMEM tile)

_DN0 = (((0,), (0,)), ((), ()))      # contract dim 0 of both operands


@lru_cache(maxsize=None)
def _packed_dft(n: int):
    """[[Wr, Wi], [-Wi, Wr]] for the n-point DFT, [2n, 2n] float32."""
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    wr, wi = w.real.astype(np.float32), w.imag.astype(np.float32)
    return np.block([[wr, wi], [-wi, wr]])


@lru_cache(maxsize=None)
def _twiddle_parts():
    t = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1))
               / N)                                   # [k1, b]
    # Used as t[b, k1] (stage-1 output layout).
    return (t.real.T.astype(np.float32).copy(),
            t.imag.T.astype(np.float32).copy())


def _fft4096_kernel(w1_ref, w2_ref, twr_ref, twi_ref,
                    xr_ref, xi_ref, yr_ref, yi_ref):
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    twr = twr_ref[...]
    twi = twi_ref[...]
    hp = jax.lax.Precision.HIGHEST
    for f in range(FRAMES):
        xr = xr_ref[f]                                # [a, b]
        xi = xi_ref[f]
        x3 = jnp.concatenate([xr, xi], axis=0)        # [2a, b]
        d = jax.lax.dot_general(x3, w1, _DN0, precision=hp,
                                preferred_element_type=jnp.float32)
        dr = d[:, :N1]                                # [b, k1]
        di = d[:, N1:]
        br = dr * twr - di * twi
        bi = dr * twi + di * twr
        b3 = jnp.concatenate([br, bi], axis=0)        # [2b, k1]
        y = jax.lax.dot_general(w2, b3, _DN0, precision=hp,
                                preferred_element_type=jnp.float32)
        yr_ref[f] = y[:N1]                            # [q, k1]
        yi_ref[f] = y[N1:]


@partial(jax.jit, static_argnames=("interpret",))
def fft4096_pallas(xr: jnp.ndarray, xi: jnp.ndarray, interpret=False):
    """Batched 4096-point forward DFT: [B, 4096] f32 planes (B a
    multiple of FRAMES) -> (yr, yi)."""
    B = xr.shape[0]
    if B % FRAMES:
        raise ValueError(f"B={B} not a multiple of {FRAMES}")
    # Both stages contract dim 0 (out[i,j] = sum_c L[c,i] R[c,j]), so
    # the SAME packed block matrix serves both: stage 1 as the right
    # operand (columns 2k1), stage 2 as the left operand (columns 2q).
    w1 = jnp.asarray(_packed_dft(N1))
    w2 = w1
    twr, twi = _twiddle_parts()
    x3r = xr.reshape(B, N1, N1)          # free row-major bitcast
    x3i = xi.reshape(B, N1, N1)
    blk = pl.BlockSpec((FRAMES, N1, N1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((2 * N1, 2 * N1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((N1, N1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        _fft4096_kernel,
        grid=(B // FRAMES,),
        in_specs=[cst, cst, tw, tw, blk, blk],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B, N1, N1), jnp.float32),
                   jax.ShapeDtypeStruct((B, N1, N1), jnp.float32)],
        interpret=interpret,
    )(w1, w2, jnp.asarray(twr), jnp.asarray(twi), x3r, x3i)
    return yr.reshape(B, N), yi.reshape(B, N)
