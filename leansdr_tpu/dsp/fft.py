"""FFT on the MXU (the cfft_engine equivalent, reference dsp.h:56-116).

The axon TPU backend has no XLA FFT custom-call, and even where it
exists, SDR-sized transforms (64..4096 points) batched over many frames
map better onto the MXU as matrix products: a direct DFT matmul for
small N, and the four-step (Cooley-Tukey N = N1*N2) decomposition —
DFT(N1) matmul, twiddle multiply, DFT(N2) matmul — for larger N. All
arithmetic is on (re, im) float32 planes.

fft() dispatches: direct matmul for N <= 256, four-step otherwise
(N must factor into supported sizes).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _dft_mats(n: int):
    # Cache NumPy, convert at use: caching jnp arrays created inside a
    # trace leaks tracers across jit calls.
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return (w.real.astype(np.float32), w.imag.astype(np.float32))


def _dft_matmul(xr, xi, n):
    wr_np, wi_np = _dft_mats(n)
    wr, wi = jnp.asarray(wr_np), jnp.asarray(wi_np)
    yr = jnp.dot(xr, wr, preferred_element_type=jnp.float32) \
        - jnp.dot(xi, wi, preferred_element_type=jnp.float32)
    yi = jnp.dot(xr, wi, preferred_element_type=jnp.float32) \
        + jnp.dot(xi, wr, preferred_element_type=jnp.float32)
    return yr, yi


@lru_cache(maxsize=None)
def _twiddles(n1: int, n2: int):
    t = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2))
               / (n1 * n2))
    return (t.real.astype(np.float32), t.imag.astype(np.float32))


def _split(n: int):
    n1 = 1 << (int(np.log2(n)) // 2)
    return n1, n // n1


def _fft_core(xr, xi, n: int):
    if n <= 256:
        return _dft_matmul(xr, xi, n)
    n1, n2 = _split(n)
    shape = xr.shape[:-1]
    # x[a*n2 + b] -> view [n1, n2]; column DFT over a, twiddle, row DFT
    # over b, output index (b*n1 + a).
    xr2 = xr.reshape(*shape, n1, n2)
    xi2 = xi.reshape(*shape, n1, n2)
    # DFT over the n1 axis: move it last.
    xr2 = jnp.swapaxes(xr2, -1, -2)        # [..., n2, n1]
    xi2 = jnp.swapaxes(xi2, -1, -2)
    ar, ai = _fft_core(xr2, xi2, n1)       # DFT_{n1} over last axis
    tw_r, tw_i = _twiddles(n1, n2)         # [n1, n2] numpy
    tr = jnp.asarray(tw_r.T)               # [n2, n1]
    ti = jnp.asarray(tw_i.T)
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    # DFT over the n2 axis: move it last.
    br = jnp.swapaxes(br, -1, -2)          # [..., n1, n2]
    bi = jnp.swapaxes(bi, -1, -2)
    cr, ci = _fft_core(br, bi, n2)         # [..., n1, n2] indexed [a, q]
    # Output index k = q*n1 + a -> transpose to [q, a] and flatten.
    cr = jnp.swapaxes(cr, -1, -2).reshape(*shape, n)
    ci = jnp.swapaxes(ci, -1, -2).reshape(*shape, n)
    return cr, ci


@partial(jax.jit, static_argnames=("n",))
def fft_planes(xr: jnp.ndarray, xi: jnp.ndarray, n: int):
    """Batched forward DFT of the last axis (length n, power of two).

    xr/xi: [..., n] float32 planes. Returns (yr, yi)."""
    return _fft_core(xr, xi, n)


def fft(x: jnp.ndarray) -> jnp.ndarray:
    """complex64 [..., n] forward FFT via the MXU path."""
    n = x.shape[-1]
    yr, yi = fft_planes(jnp.real(x), jnp.imag(x), n)
    return (yr + 1j * yi).astype(jnp.complex64)
