"""Multi-channel FM receiver (leanmlmrx equivalent) tests."""

import numpy as np

from leansdr_tpu.pipelines.mlm_rx import (MlmReceiver, MlmConfig, Channel,
                                          resolve_rates)


def test_rate_resolution_defaults():
    cfg = MlmConfig()          # Fau=44100, maxdev=75e3
    fq, fau, decim = resolve_rates(cfg)
    assert decim == int(np.ceil(2 * 75e3 / 44100))
    assert fq == 44100 * decim


def test_fm_tone_demodulation():
    Fs, Fc = 25.6e6, 98e6
    cfg = MlmConfig(Fs=Fs, Fc=Fc, channels=[Channel(F=98.4e6)])
    rx = MlmReceiver(cfg)
    n = 1 << 21
    t = np.arange(n)
    tone = 1000.0
    phase = (2 * np.pi * (98.4e6 - Fc) * t / Fs
             + (75e3 / tone) * np.sin(2 * np.pi * tone * t / Fs))
    x = (1000 * np.exp(1j * phase)).astype(np.complex64)
    au = rx.process(x).astype(np.float64)
    assert len(au) > 3000
    w = au[500:500 + 2048] * np.hanning(2048)
    sp = np.abs(np.fft.rfft(w))
    f = np.fft.rfftfreq(2048, 1 / rx.Fau)
    peak = f[np.argmax(sp[5:]) + 5]
    assert abs(peak - tone) < 50, peak


def test_squelch_mutes_dead_channel():
    Fs, Fc = 25.6e6, 98e6
    cfg = MlmConfig(Fs=Fs, Fc=Fc, channels=[Channel(F=98.4e6)],
                    squelch=0.5)
    rx = MlmReceiver(cfg)
    rng = np.random.default_rng(0)
    # Pure noise: the discriminator output is full-scale random ->
    # rms stays high -> squelched.
    x = (rng.normal(size=1 << 18) + 1j * rng.normal(size=1 << 18)
         ).astype(np.complex64) * 100
    au = rx.process(x).astype(np.float64)
    assert np.abs(au).mean() < 5
