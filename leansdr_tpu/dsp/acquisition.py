"""FFT-assisted coarse carrier acquisition (additive extra).

The reference has NO FFT coarse search — acquisition is PLL pull-in
within clamped limits plus config scanning (SURVEY.md section 6 note);
this module is the BASELINE.json-suggested accelerator, off by default.

For an M-PSK signal, raising samples to the Mth power collapses the
modulation and leaves a spectral line at M times the carrier offset; the
FFT peak over an accumulated power spectrum estimates the offset far
beyond the PLL's pull-in range. The estimate seeds the receiver's
`Ftune` so the PLL starts inside its capture range.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("m", "nfft"))
def _power_spectrum_mth(x, m: int, nfft: int):
    from .fft import fft_planes
    n = (x.shape[0] // nfft) * nfft
    zr, zi = x[:n, 0], x[:n, 1]
    for _ in range(int(np.log2(m))):
        zr, zi = zr * zr - zi * zi, 2 * zr * zi
    fr, fi = fft_planes(zr.reshape(-1, nfft), zi.reshape(-1, nfft), nfft)
    return jnp.sum(fr * fr + fi * fi, axis=0)


def coarse_carrier_estimate(iq: np.ndarray, msymbols: int = 4,
                            nfft: int = 4096) -> float:
    """Estimate the carrier offset of an M-PSK signal in cycles/sample.

    msymbols must be a power of two (2 = BPSK, 4 = QPSK/APSK outer).
    Resolution is 1/(msymbols*nfft) cycles/sample.
    """
    if msymbols & (msymbols - 1):
        raise ValueError("msymbols must be a power of two")
    spec = np.asarray(_power_spectrum_mth(
        jnp.asarray(np.asarray(iq, np.float32)), msymbols, nfft))
    peak = int(np.argmax(spec))
    f_m = peak / nfft
    if f_m >= 0.5:
        f_m -= 1.0
    return f_m / msymbols
