"""MXU FFT and Pallas streaming FIR kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from leansdr_tpu.dsp.fft import fft, fft_planes
from leansdr_tpu.dsp.fir_pallas import fir_pallas


@pytest.mark.parametrize("n", [64, 256, 1024, 4096])
def test_mxu_fft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(8, n))
         + 1j * rng.normal(size=(8, n))).astype(np.complex64)
    y = np.asarray(fft(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_fir_pallas_matches_convolve():
    rng = np.random.default_rng(1)
    R, n = 16, 8192
    x = rng.normal(size=(R, n)).astype(np.float32)
    taps = tuple(np.hanning(33).astype(np.float32).tolist())
    y = np.asarray(fir_pallas(jnp.asarray(x), taps, interpret=True))
    ref = np.stack([np.convolve(r, np.array(taps))[:n] for r in x])
    np.testing.assert_allclose(y, ref, atol=1e-4)
