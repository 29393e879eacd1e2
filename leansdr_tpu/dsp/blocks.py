"""Feed-forward DSP blocks of the receive path.

Vectorized re-designs of the reference's per-sample runnables: these are
all block-rate or linear-recurrence ops, so they map to plain array math
(and one `associative_scan` for the notch estimator) rather than loops.

Components (reference cites):
  fir_filter       dsp.h:219-285   frequency-tracking FIR with decimation
  decimate         generic.h:247-267
  rotator          sdr.h:1228-1261
  auto_notch       sdr.h:46-154
  ss_estimator     sdr.h:161-189
  ss_amp_estimator sdr.h:191-233
  cnr_fft          sdr.h:1273-1345
  spectrum         sdr.h:1347-1404
"""

import numpy as np
import jax
import jax.numpy as jnp


class FirFilter:
    """fir_filter<cf32,float> (dsp.h:219-285): real taps re-modulated to
    follow the carrier (shifted_coeffs = coeffs * exp(j*2pi*f*(i-n/2))),
    decimating FIR. Streaming: keeps ncoeffs samples of history."""

    def __init__(self, coeffs: np.ndarray, decim: int = 1,
                 freq_tol: float = 0.1):
        self.coeffs = np.asarray(coeffs, np.float32)
        self.n = len(self.coeffs)
        self.decim = decim
        self.freq_tol = freq_tol
        self.current_freq = 0.0
        self._set_freq(0.0)
        self.hist = np.zeros(self.n, np.complex64)
        self._primed = False

    def _set_freq(self, f: float):
        i = np.arange(self.n)
        a = 2 * np.pi * f * (i - self.n // 2)
        self.shifted = (self.coeffs * (np.cos(a) + 1j * np.sin(a))
                        ).astype(np.complex64)
        self.current_freq = f

    def process(self, x: np.ndarray, freq_tap: float = None) -> np.ndarray:
        """[n] complex64 in -> decimated complex64 out."""
        if freq_tap is not None and \
           abs(self.current_freq - freq_tap) > self.freq_tol:
            self._set_freq(freq_tap)
        buf = np.concatenate([self.hist, np.asarray(x, np.complex64)])
        if not self._primed:
            # The reference starts output at index ncoeffs of the stream
            # (fir_filter keeps ncoeffs readahead, dsp.h:246-248).
            buf = buf[self.n:]
            self._primed = True
        count = (len(buf) - self.n) // self.decim
        if count <= 0:
            self.hist = buf[-min(len(buf), self.n + self.decim - 1):]
            return np.empty(0, np.complex64)
        conv = np.convolve(buf, self.shifted)
        out = conv[self.n + np.arange(count) * self.decim]
        consumed = count * self.decim
        self.hist = buf[consumed:]
        return out.astype(np.complex64)


def decimate(x: np.ndarray, d: int) -> np.ndarray:
    """Keep 1 sample in d (decimator, generic.h:247-267)."""
    return x[::d]


class Rotator:
    """Fixed frequency shift with the 65536-entry LUT quantization
    (rotator, sdr.h:1228-1261): freq quantized to n/65536 cycles/sample,
    16-bit phase index."""

    def __init__(self, freq: float):
        from .math_utils import trig16_table
        self.ifreq = int(freq * 65536)
        self.index = 0
        self._trig = trig16_table()          # shared [65536, 2] table

    def process(self, x: np.ndarray) -> np.ndarray:
        n = len(x)
        e = self._trig[((self.index + np.arange(n)) * self.ifreq) & 0xFFFF]
        c, s = e[:, 0], e[:, 1]
        self.index = (self.index + n) & 0xFFFF
        return ((x.real * c - x.imag * s)
                + 1j * (x.real * s + x.imag * c)).astype(np.complex64)


def _first_order_scan(bb: jnp.ndarray, y0: jnp.ndarray, k: float):
    """y_n = (1-k)*y_{n-1} + k*bb_n over axis 0, via associative_scan."""
    a = jnp.full(bb.shape, 1 - k, bb.dtype)
    b = k * bb

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    a_out, b_out = jax.lax.associative_scan(combine, (a, b), axis=0)
    return a_out * y0 + b_out


class AutoNotch:
    """auto_notch (sdr.h:46-154): every `decimation` samples a 4096-point
    FFT finds the nslots strongest bins (zeroing +-1 neighbors between
    picks); per-sample first-order estimators track and subtract each
    tone; doubles as a crude AGC toward agc_rms_setpoint."""

    NFFT = 4096

    def __init__(self, nslots: int, agc_rms_setpoint: float = 0.0,
                 decimation: int = 1024 * 4096, k: float = 0.002):
        self.nslots = nslots
        self.agc_rms_setpoint = agc_rms_setpoint
        self.decimation = decimation
        self.k = k
        self.slot_i = np.full(nslots, -1)
        self.estim = np.zeros(nslots, np.complex64)
        self.phase = 0
        self.gain = 1.0
        self.backlog = np.empty(0, np.complex64)

    def _detect(self, block: np.ndarray):
        m2 = float(np.sum(block.real ** 2 + block.imag ** 2))
        if self.agc_rms_setpoint and m2:
            rms = np.sqrt(m2 / self.NFFT)
            self.gain = self.gain * 0.9 + (self.agc_rms_setpoint / rms) * 0.1
        amp = np.abs(np.fft.fft(block))
        for s in range(self.nslots):
            iamax = int(np.argmax(amp))
            if iamax != self.slot_i[s]:
                self.slot_i[s] = iamax
                self.estim[s] = 0
            amp[iamax] = 0
            if iamax - 1 >= 0:
                amp[iamax - 1] = 0
            if iamax + 1 < self.NFFT:
                amp[iamax + 1] = 0

    def _process_block(self, block: np.ndarray) -> np.ndarray:
        out = block.copy()
        i = np.arange(self.NFFT)
        for s in range(self.nslots):
            if self.slot_i[s] < 0:
                continue
            ej = np.exp(2j * np.pi * self.slot_i[s] * i / self.NFFT
                        ).astype(np.complex64)
            bb = block * np.conj(ej)
            y = np.asarray(_first_order_scan(
                jnp.asarray(bb), jnp.complex64(self.estim[s]), self.k))
            out = out - y * ej
            self.estim[s] = y[-1]
        return (out * np.float32(self.gain)).astype(np.complex64)

    def process(self, x: np.ndarray) -> np.ndarray:
        self.backlog = np.concatenate(
            [self.backlog, np.asarray(x, np.complex64)])
        outs = []
        while len(self.backlog) >= self.NFFT:
            block = self.backlog[:self.NFFT]
            self.phase += self.NFFT
            if self.phase >= self.decimation:
                self.phase -= self.decimation
                self._detect(block)
            outs.append(self._process_block(block))
            self.backlog = self.backlog[self.NFFT:]
        return (np.concatenate(outs) if outs
                else np.empty(0, np.complex64))


class SSEstimator:
    """ss_estimator (sdr.h:161-189): RMS over 1024-sample windows."""

    def __init__(self, window_size=1024, decimation=1024):
        self.window = window_size
        self.decimation = decimation
        self.phase = 0
        self.backlog = np.empty(0, np.complex64)

    def process(self, x: np.ndarray):
        self.backlog = np.concatenate([self.backlog, x])
        out = []
        while len(self.backlog) >= self.window:
            w = self.backlog[:self.window]
            self.phase += self.window
            if self.phase >= self.decimation:
                self.phase -= self.decimation
                out.append(np.sqrt(np.mean(w.real ** 2 + w.imag ** 2)))
            self.backlog = self.backlog[self.window:]
        return np.array(out, np.float32)


class CnrFft:
    """cnr_fft (sdr.h:1273-1345): band-model CNR from an EMA'd 4096-point
    power spectrum around the tracked carrier frequency."""

    def __init__(self, bandwidth: float, nfft: int = 4096,
                 decimation: int = 1 << 20, kavg: float = 0.1):
        if bandwidth > 0.25:
            raise ValueError("CNR estimator requires Fsampling > 4x Fsignal")
        self.bw = bandwidth
        self.nfft = nfft
        self.decimation = decimation
        self.kavg = kavg
        self.avgpower = None
        self.phase = 0
        self.backlog = np.empty(0, np.complex64)

    def _cnr(self, freq_tap: float) -> float | None:
        n = self.nfft
        icf = int(np.floor(freq_tap * n + 0.5))
        bwslots = int((self.bw / 4) * n)
        if not bwslots:
            return None

        def avgslots(i0, i1):
            i = np.arange(i0, i1 + 1)
            return float(np.mean(self.avgpower[i & (n - 1)]))

        c2plusn2 = avgslots(icf - bwslots, icf + bwslots)
        n2 = (avgslots(icf - bwslots * 4, icf - bwslots * 3)
              + avgslots(icf + bwslots * 3, icf + bwslots * 4)) / 2
        c2 = c2plusn2 - n2
        return 10 * np.log10(c2 / n2) if (c2 > 0 and n2 > 0) else -50.0

    def process(self, x: np.ndarray, freq_tap: float = 0.0):
        self.backlog = np.concatenate([self.backlog, x])
        out = []
        while len(self.backlog) >= self.nfft:
            block = self.backlog[:self.nfft]
            self.phase += self.nfft
            if self.phase >= self.decimation:
                self.phase -= self.decimation
                power = np.abs(np.fft.fft(block)) ** 2
                if self.avgpower is None:
                    self.avgpower = power.copy()
                self.avgpower = (self.avgpower * (1 - self.kavg)
                                 + power * self.kavg)
                cnr = self._cnr(freq_tap)
                if cnr is not None:
                    out.append(cnr)
            self.backlog = self.backlog[self.nfft:]
        return np.array(out, np.float32)


class Spectrum:
    """spectrum (sdr.h:1347-1404): 1024-bin EMA'd dB spectrum, fftshifted
    into the reference's [positive-half | negative-half] order."""

    NFFT = 1024

    def __init__(self, decimation: int = 1 << 20, kavg: float = 0.1):
        self.decimation = decimation
        self.kavg = kavg
        self.avgpower = None
        self.phase = 0
        self.backlog = np.empty(0, np.complex64)

    def process(self, x: np.ndarray):
        self.backlog = np.concatenate([self.backlog, x])
        out = []
        while len(self.backlog) >= self.NFFT:
            block = self.backlog[:self.NFFT]
            self.phase += self.NFFT
            if self.phase >= self.decimation:
                self.phase -= self.decimation
                power = np.abs(np.fft.fft(block)) ** 2
                if self.avgpower is None:
                    self.avgpower = power.copy()
                self.avgpower = (self.avgpower * (1 - self.kavg)
                                 + power * self.kavg)
                line = np.empty(self.NFFT, np.float32)
                half = self.NFFT // 2
                line[:half] = 10 * np.log10(self.avgpower[half:])
                line[half:] = 10 * np.log10(self.avgpower[:half])
                out.append(line)
            self.backlog = self.backlog[self.NFFT:]
        return (np.stack(out) if out
                else np.empty((0, self.NFFT), np.float32))


def adder(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """adder<T> (dsp.h:118-138)."""
    return a + b


def scaler(k, x: np.ndarray) -> np.ndarray:
    """scaler<Tscale,Tin,Tout> (dsp.h:140-160)."""
    return np.float32(k) * x


def naive_lowpass(x: np.ndarray, w: int) -> np.ndarray:
    """naive_lowpass (dsp.h:192-217): boxcar average of width w; output
    k is the mean of x[k .. k+w-1] (w-sample lookahead)."""
    c = np.cumsum(np.concatenate([[0], x]))
    n = len(x) - w
    if n <= 0:
        return x[:0]
    k = np.float32(1.0 / w)
    return ((c[w:w + n] - c[:n]) * k).astype(x.dtype)


class SSAmpEstimator:
    """ss_amp_estimator (sdr.h:191-233): RMS plus min/max amplitude per
    window."""

    def __init__(self, window_size=1024, decimation=1024):
        self.window = window_size
        self.decimation = decimation
        self.phase = 0
        self.backlog = np.empty(0, np.complex64)

    def process(self, x: np.ndarray):
        self.backlog = np.concatenate([self.backlog, x])
        out = []
        while len(self.backlog) >= self.window:
            w = self.backlog[:self.window]
            self.phase += self.window
            if self.phase >= self.decimation:
                self.phase -= self.decimation
                mag2 = w.real ** 2 + w.imag ** 2
                mag = np.sqrt(mag2)
                out.append((float(np.sqrt(mag2.mean())),
                            float(mag.min()), float(mag.max())))
            self.backlog = self.backlog[self.window:]
        return out
