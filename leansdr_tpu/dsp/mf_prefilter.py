"""Matched-filter prefilter for the fast RRC path.

The reference's `fir_sampler` (sdr.h:635-689) runs a polyphase RRC
matched filter *inside* the per-sample timing loop: at each emitted
symbol it picks the polyphase branch trunc((1-mu)*subsampling) and dots
`ncoeffs/subsampling` taps, with the taps pre-rotated by the current
carrier estimate (freqw) so one derotation of the accumulated sum
suffices (sdr.h:667-682).  That shape exists to avoid per-sample
interpolation cost on a CPU; it quantizes symbol timing to
1/subsampling of a sample.

TPU-first equivalent: apply the matched filter ONCE at input rate as a
batched convolution *before* the demodulator, then run the standard
linear-sampler kernel (receiver_pallas.py) on the filtered stream.
Linear interpolation of the filtered signal replaces the reference's
1/32-sample polyphase quantization (strictly finer timing resolution),
and the timing-loop dynamics are unchanged: the sampled position still
moves as t + mu, only delayed by the constant filter group delay, which
the timing loop absorbs.

Carrier rotation of the taps is preserved: each channel's taps are
rotated by its current freqw estimate (re-derived once per processed
chunk, vs the reference's throttled update every ncoeffs*16 samples —
freqw moves slowly at either cadence).  The rotated 2x2 real kernels
feed one XLA grouped convolution (channels = feature groups), which XLA
tiles onto the MXU.

The bit-exact reference-parity path remains the exact_lut=True XLA scan
(receiver.py sampler="rrc", golden tests).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def make_mf_taps(Fs_eff: float, Fm: float, rolloff: float,
                 rej: float) -> tuple:
    """Input-rate root-raised-cosine taps (filtergen.h:151-173 sampled at
    the input rate instead of the polyphase oversampled rate)."""
    from . import filtergen
    transition = (Fm / 2) * rolloff
    order = int(rej * Fs_eff / (22 * transition))
    taps = filtergen.root_raised_cosine(order, Fm / Fs_eff, rolloff)
    return tuple(float(t) for t in taps)


@partial(jax.jit, static_argnames=("taps",))
def mf_prefilter(taps: tuple, freqw: jnp.ndarray, x: jnp.ndarray):
    """[C, n + ntaps - 1, 2] float32 -> [C, n, 2] matched-filtered.

    taps: static input-rate RRC taps.  freqw: [C] current carrier step
    (u16 units/sample); taps are rotated by exp(-i*w*(j - ntaps//2)) so
    the filter passband tracks each channel's carrier (sdr.h:676-681).
    """
    c = jnp.asarray(np.asarray(taps, np.float32))
    ntaps = c.shape[0]
    C = x.shape[0]
    n = x.shape[1] - (ntaps - 1)
    j = jnp.arange(ntaps, dtype=jnp.float32) - (ntaps // 2)
    ang = -(freqw[:, None] / 65536.0) * (2 * np.pi) * j[None, :]
    cr = c[None, :] * jnp.cos(ang)                      # [C, ntaps]
    ci = c[None, :] * jnp.sin(ang)
    # Grouped conv: C groups, 2 real channels each; out = rot_taps (*) x
    # as the 2x2 real form of complex correlation sum_j c[j] * x[t+j].
    lhs = x.transpose(0, 2, 1).reshape(1, 2 * C, -1)    # [1, 2C, n+ntaps-1]
    rhs = jnp.zeros((2 * C, 2, ntaps), jnp.float32)
    rhs = rhs.at[0::2, 0].set(cr).at[0::2, 1].set(-ci)
    rhs = rhs.at[1::2, 0].set(ci).at[1::2, 1].set(cr)
    z = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=C)                          # [1, 2C, n]
    return z.reshape(2 * C, n).reshape(C, 2, n).transpose(0, 2, 1)
