"""Streaming FIR as a Pallas kernel (the RRC-FIR speed-of-light path).

XLA's shifted-add formulation of a long FIR materializes one pass per
tap; this kernel keeps the block plus its (ntaps-1)-sample halo in VMEM
and accumulates all taps in registers — one HBM read and one write per
sample, i.e. bandwidth-bound at speed of light.

Layout: rows (channels x re/im planes) on sublanes, time on lanes.
x [R, n] float32 with R a multiple of 8; output y[r, t] =
sum_k taps[k] * x[r, t - k] (causal; zeros before the stream head).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBLK = 2048
RBLK = 8


def _fir_kernel(taps, nt, x_ref, xh_ref, out_ref):
    """One grid step: block [RBLK, TBLK] with halo from the previous
    time block. x_ref: current block; xh_ref: previous block."""
    i = pl.program_id(1)
    halo = xh_ref[:, TBLK - (nt - 1):]
    halo = jnp.where(i == 0, jnp.zeros_like(halo), halo)
    ext = jnp.concatenate([halo, x_ref[...]], axis=1)   # [R, nt-1+TBLK]
    acc = jnp.zeros_like(out_ref)
    for k in range(nt):
        acc = acc + jnp.float32(taps[k]) * ext[:, nt - 1 - k: nt - 1 - k + TBLK]
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("taps", "interpret"))
def fir_pallas(x: jnp.ndarray, taps: tuple,
               interpret: bool = False) -> jnp.ndarray:
    """Causal FIR over the last axis. x [R, n], n divisible by TBLK."""
    R, n = x.shape
    nt = len(taps)
    assert n % TBLK == 0 and nt <= TBLK and R % RBLK == 0
    grid = (R // RBLK, n // TBLK)
    blk = pl.BlockSpec((RBLK, TBLK), lambda r, i: (r, i),
                       memory_space=pltpu.VMEM)
    # Previous time block: index max(i-1, 0); masked to zero for i == 0.
    hblk = pl.BlockSpec((RBLK, TBLK),
                        lambda r, i: (r, jnp.maximum(i - 1, 0)),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fir_kernel, taps, nt),
        grid=grid,
        in_specs=[blk, hblk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((R, n), jnp.float32),
        interpret=interpret,
    )(x, x)


def _cfir_kernel(nt, tr_ref, ti_ref, x_ref, xh_ref, out_ref):
    """Complex-tap causal FIR on (re, im) row pairs. Taps ride in SMEM
    as runtime values, so carrier re-modulation (fir_filter's
    shifted_coeffs, dsp.h:254-260) does NOT recompile the kernel."""
    i = pl.program_id(0)
    halo = xh_ref[:, TBLK - (nt - 1):]
    halo = jnp.where(i == 0, jnp.zeros_like(halo), halo)
    ext = jnp.concatenate([halo, x_ref[...]], axis=1)   # [2, nt-1+TBLK]
    acc_r = jnp.zeros((1, TBLK), jnp.float32)
    acc_i = jnp.zeros((1, TBLK), jnp.float32)
    for k in range(nt):
        seg = ext[:, nt - 1 - k: nt - 1 - k + TBLK]
        sr, si = seg[0:1], seg[1:2]
        wr, wi = tr_ref[k], ti_ref[k]
        acc_r = acc_r + wr * sr - wi * si
        acc_i = acc_i + wr * si + wi * sr
    out_ref[...] = jnp.concatenate([acc_r, acc_i], axis=0)


@partial(jax.jit, static_argnames=("nt", "interpret"))
def cfir_pallas(x: jnp.ndarray, taps_r: jnp.ndarray, taps_i: jnp.ndarray,
                nt: int, interpret: bool = False) -> jnp.ndarray:
    """Causal complex FIR: x [2, n] (re, im rows; n % TBLK == 0),
    taps_r/taps_i [nt] float32. y[t] = sum_k taps[k] * x[t - k]."""
    _, n = x.shape
    assert n % TBLK == 0 and nt <= TBLK
    blk = pl.BlockSpec((2, TBLK), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec((2, TBLK), lambda i: (0, jnp.maximum(i - 1, 0)),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_cfir_kernel, nt),
        grid=(n // TBLK,),
        in_specs=[tspec, tspec, blk, hblk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        interpret=interpret,
    )(taps_r, taps_i, x, x)


class FirFilterDevice:
    """Streaming fir_filter (dsp.h:219-285) on the Mosaic cfir kernel:
    carrier-re-modulated complex taps, decimation, history — drop-in for
    dsp/blocks.FirFilter on the --resample path. The FIR runs at the
    full input rate in VMEM (bandwidth-bound); decimation is a strided
    gather of the result."""

    def __init__(self, coeffs: np.ndarray, decim: int = 1,
                 freq_tol: float = 0.1, interpret: bool = False):
        self.coeffs = np.asarray(coeffs, np.float32)
        self.n = len(self.coeffs)
        assert self.n <= TBLK
        self.decim = decim
        self.freq_tol = freq_tol
        self.interpret = interpret
        self.current_freq = 0.0
        self._set_freq(0.0)
        self.hist = np.zeros(self.n, np.complex64)
        self._primed = False

    def _set_freq(self, f: float):
        i = np.arange(self.n)
        a = 2 * np.pi * f * (i - self.n // 2)
        self.taps_r = jnp.asarray((self.coeffs * np.cos(a)
                                   ).astype(np.float32))
        self.taps_i = jnp.asarray((self.coeffs * np.sin(a)
                                   ).astype(np.float32))
        self.current_freq = f

    def process(self, x: np.ndarray, freq_tap: float = None) -> np.ndarray:
        """[n] complex64 in -> decimated complex64 out (bit-compatible
        with blocks.FirFilter up to f32 summation order)."""
        if freq_tap is not None and \
           abs(self.current_freq - freq_tap) > self.freq_tol:
            self._set_freq(freq_tap)
        buf = np.concatenate([self.hist, np.asarray(x, np.complex64)])
        if not self._primed:
            buf = buf[self.n:]
            self._primed = True
        count = (len(buf) - self.n) // self.decim
        if count <= 0:
            self.hist = buf[-min(len(buf), self.n + self.decim - 1):]
            return np.empty(0, np.complex64)
        m = len(buf)
        mp = -(-m // TBLK) * TBLK
        planes = np.zeros((2, mp), np.float32)
        planes[0, :m] = buf.real
        planes[1, :m] = buf.imag
        y = cfir_pallas(jnp.asarray(planes), self.taps_r, self.taps_i,
                        self.n, interpret=self.interpret)
        idx = self.n + np.arange(count) * self.decim
        yv = np.asarray(y[:, : idx[-1] + 1])
        out = (yv[0, idx] + 1j * yv[1, idx]).astype(np.complex64)
        self.hist = buf[count * self.decim:]
        return out
