"""Batched multi-candidate acquisition scan.

The TPU-native leansdrscan (SURVEY.md section 2.10 P5): instead of
fork/exec'ing one demodulator config at a time with a timeout, ALL
candidate (symbol rate, code rate) hypotheses demodulate the same IQ
stream as one device batch — symbol-rate candidates ride the channel
axis via per-channel omega; each candidate has its own byte-domain chain
and the winner is elected by MPEG lock.
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..dsp import receiver
from ..dsp.cstln import Predef, make_dvbs2_constellation
from .dvbs_rx import RxConfig, _DeconvolSync, TS_SIZE
from .multi_rx import _ByteChain


@dataclass
class Candidate:
    Fm: float
    rate: str


class CandidateScanReceiver:
    """Demodulate all candidates concurrently; elect by lock."""

    def __init__(self, Fs: float, candidates, float_scale: float = 1.0,
                 constellation: Predef = Predef.QPSK):
        self.Fs = Fs
        self.candidates = list(candidates)
        self.float_scale = float_scale
        C = len(self.candidates)
        cstln = make_dvbs2_constellation(constellation,
                                         self.candidates[0].rate)
        self.cstln = cstln
        omegas = np.array([Fs / c.Fm for c in self.candidates], np.float32)
        self.params = receiver.ReceiverParams(
            omega=float(omegas.mean()),
            sampler="linear",
            nsymbols=cstln.nsymbols,
            exact_lut=False,
            omega_per_channel=True,
        )
        self.state = receiver.init_state(self.params, C)
        self.state.update(receiver.per_channel_omega_state(
            self.params, omegas))
        self.tables = receiver.make_tables(cstln)
        self.chains = [
            _ByteChain("4/6" if c.rate == "2/3" else c.rate, fastlock=True)
            for c in self.candidates]
        self.outputs = [np.empty((0, TS_SIZE), np.uint8) for _ in range(C)]
        self.sample_backlog = np.empty((0, 2), np.float32)

    def process(self, iq: np.ndarray):
        """Feed [n,2] IQ shared by all candidates; returns winner index
        (or None) — decoded TS accumulates in self.outputs[i]."""
        iq = np.asarray(iq, np.float32) * np.float32(self.float_scale)
        self.sample_backlog = np.concatenate([self.sample_backlog, iq])
        ra = self.params.readahead
        K = (len(self.sample_backlog) - ra) // receiver.CHUNK
        if K <= 0:
            return self.winner()
        n = K * receiver.CHUNK
        x = self.sample_backlog[: n + ra]
        self.sample_backlog = self.sample_backlog[n:]
        C = len(self.candidates)
        xb = jnp.asarray(np.broadcast_to(x[None], (C, *x.shape)))
        self.state, out = receiver.run_chunks(self.params, self.tables,
                                              self.state, xb)
        sym = np.asarray(out["symbol"])
        valid = np.asarray(out["valid"])
        for c in range(C):
            ts = self.chains[c].feed(sym[c][valid[c]])
            if len(ts):
                self.outputs[c] = np.concatenate([self.outputs[c], ts])
        return self.winner()

    def winner(self):
        """First candidate with MPEG lock and decoded output."""
        for c, chain in enumerate(self.chains):
            if chain.mpeg.synchronized and len(self.outputs[c]):
                return c
        return None
