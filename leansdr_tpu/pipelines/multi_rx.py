"""Multi-channel DVB-S receiver: many independent carriers demodulated in
one device batch (the 64 x 2 Msps north-star shape, BASELINE.json).

The demodulator runs once for all channels — channels ride the vector
lanes of the scan/Pallas kernel — while the byte-domain FSM chains
(deconvolution, framing, RS, derandomizer) run per channel on the host at
packet rate. On a mesh, channels shard across devices
(parallel/mesh.py); this class is the single-host building block.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..dsp import receiver
from .dvbs_rx import RxConfig, _DeconvolSync, TS_SIZE, RS_SIZE
from ..dsp.cstln import make_dvbs2_constellation
from ..fec import interleave, prbs, rs
from ..proto.framing import MpegSync


class _ByteChain:
    """Per-channel byte-domain chain: deconv -> mpeg -> deinterleave ->
    RS -> derandomize (same stages as DvbsReceiver._byte_stages).

    When `deconv` is None the deconvolution happens centrally in the
    batched path and feed() receives bytes directly."""

    def __init__(self, rate: str, fastlock: bool, batched_deconv=False):
        self.deconv = None if batched_deconv else _DeconvolSync(
            rate, fastlock)
        self.mpeg = MpegSync(
            fastlock=fastlock,
            on_next_sync=self.deconv.next_sync if self.deconv else None)
        self.byte_backlog = np.empty(0, np.uint8)
        self.mpegbyte_backlog = np.empty(0, np.uint8)
        self.derand_pos = 0
        self.vbitcount = 0
        self.verrcount = 0

    def feed(self, syms: np.ndarray) -> np.ndarray:
        bytes_out = self.deconv.process(syms) if self.deconv else syms
        if len(bytes_out):
            self.byte_backlog = np.concatenate(
                [self.byte_backlog, bytes_out])
        pkts, consumed = self.mpeg.process(self.byte_backlog)
        self.byte_backlog = self.byte_backlog[consumed:]
        if len(pkts):
            self.mpegbyte_backlog = np.concatenate(
                [self.mpegbyte_backlog, pkts.reshape(-1)])
        rspkts, self.mpegbyte_backlog = interleave.deinterleave(
            self.mpegbyte_backlog)
        if not len(rspkts):
            return np.empty((0, TS_SIZE), np.uint8)
        msgs, failed, bits = rs.decode(rspkts)
        self.vbitcount += rspkts.shape[0] * RS_SIZE * 8
        self.verrcount += int(bits.sum())
        msgs = msgs.copy()
        msgs[failed, 0] ^= prbs.MPEG_SYNC_CORRUPTED
        out, good, self.derand_pos = prbs.derandomize_np(
            msgs, self.derand_pos)
        return out[good]


class MultiDvbsReceiver:
    """N-channel receiver with one batched device demodulator."""

    def __init__(self, cfg: RxConfig, nchan: int, use_pallas=None):
        self.cfg = cfg
        self.nchan = nchan
        cstln = make_dvbs2_constellation(cfg.constellation, cfg.rate)
        self.cstln = cstln
        self.params = receiver.ReceiverParams(
            omega=cfg.Fs / cfg.Fm,
            sampler=cfg.sampler,
            nsymbols=cstln.nsymbols,
            freq0=cfg.Ftune / cfg.Fs,
            exact_lut=cfg.exact_lut,
        )
        self.tables = receiver.make_tables(cstln)
        self.state = receiver.init_state(self.params, nchan)
        if use_pallas is None:
            use_pallas = (jax.default_backend() != "cpu"
                          and cfg.sampler == "linear"
                          and not self.params.exact_lut)
        self.use_pallas = use_pallas
        if use_pallas:
            from ..dsp import receiver_pallas as rp
            self._rp = rp
            self._sym_consts = rp.sym_constants(cstln)
            self._planes = rp.pack_state(self.state)
        rate = "4/6" if cfg.rate == "2/3" else cfg.rate
        # Channel-batched deconvolver (fastlock election batched over
        # channels x sync hypotheses), all punctured rates.
        self.batched_deconv = None
        if cfg.fastlock and not cfg.viterbi:
            from ..fec.deconv import BatchedDeconvolSync
            self.batched_deconv = BatchedDeconvolSync(rate, nchan)
        self.chains = [
            _ByteChain(rate, cfg.fastlock,
                       batched_deconv=self.batched_deconv is not None)
            for _ in range(nchan)]
        self.sample_backlog = np.empty((nchan, 0, 2), np.float32)

    def process(self, iq):
        """[C, n, 2] float32 IQ -> list of [k_c, 188] TS packet arrays.

        `iq` may be a device array whose length is readahead + a multiple
        of CHUNK (and float_scale already applied): it is then consumed
        directly with no host round-trip — the fast path for
        device-resident streams.
        """
        ra = self.params.readahead
        if isinstance(iq, jnp.ndarray) and not isinstance(iq, np.ndarray)                 and len(self.sample_backlog[0]) == 0                 and (iq.shape[1] - ra) % receiver.CHUNK == 0:
            x = iq
            n = iq.shape[1] - ra
        else:
            iq = np.asarray(iq, np.float32) * np.float32(
                self.cfg.float_scale)
            self.sample_backlog = np.concatenate(
                [self.sample_backlog, iq], axis=1)
            K = (self.sample_backlog.shape[1] - ra) // receiver.CHUNK
            if K <= 0:
                return [np.empty((0, TS_SIZE), np.uint8)] * self.nchan
            n = K * receiver.CHUNK
            x = jnp.asarray(self.sample_backlog[:, :n + ra])
            self.sample_backlog = self.sample_backlog[:, n:]

        if self.use_pallas:
            self._planes, packed = self._rp.demod_pallas(
                self.params, self._sym_consts, self._planes, x)
            word, _ = self._rp.pack_outputs(packed, self.nchan)
            sym, valid = self._rp.unpack_sym3(word, n)
        else:
            self.state, out = receiver.run_chunks(
                self.params, self.tables, self.state, x)
            sym = np.asarray(out["symbol"])
            valid = np.asarray(out["valid"])
        syms = [sym[c][valid[c]] for c in range(self.nchan)]
        if self.batched_deconv is not None:
            syms = self.batched_deconv.process(syms)
        return [self.chains[c].feed(syms[c])
                for c in range(self.nchan)]

    @property
    def locks(self):
        return [c.mpeg.synchronized for c in self.chains]
