"""DVB-S receiver pipeline (the leandvb equivalent, reference
leandvb.cc:157-724).

IQ ingest -> (scale) -> batched cstln_receiver scan on device ->
algebraic deconvolution -> MPEG sync/framing -> deinterleave -> RS(204,188)
-> derandomize -> TS packets.

The demodulator runs on the TPU as a `lax.scan` batched over channels
(dsp/receiver.py); the byte-domain stages run as vectorized host ops with
per-channel FSM state (lock state machines operate at packet rate, far off
the hot path). Chunk boundaries carry explicit backlogs, mirroring the
reference's pipebuf fill levels.
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..dsp import receiver
from ..dsp.cstln import Predef, make_dvbs2_constellation
from ..fec import deconv, interleave, prbs, rs
from ..proto.framing import MpegSync

TS_SIZE = 188
RS_SIZE = 204


def resolve_exact_lut(exact_lut: bool | None) -> bool:
    """None = auto: bit-exact LUT path on CPU (golden comparisons), the
    computed fast path on accelerators (unlocks the Mosaic kernel)."""
    if exact_lut is not None:
        return bool(exact_lut)
    import jax
    return jax.default_backend() == "cpu"


@dataclass
class RxConfig:
    Fs: float = 2.4e6
    Fm: float = 2e6
    constellation: Predef = Predef.QPSK
    rate: str = "1/2"
    sampler: str = "linear"
    float_scale: float = 1.0
    fastlock: bool = False
    viterbi: bool = False
    hard_metric: bool = False
    allow_drift: bool = False
    Ftune: float = 0.0
    Finfo: float = 5.0
    rrc_rej: float = 30.0
    rrc_steps: int = 0
    rolloff: float = 0.35
    # None = auto: True (bit-exact trig16/256x256-LUT decision path) on the
    # CPU backend, False (computed VPU path, enables the Mosaic kernel) on
    # accelerators. CLI: --exact-lut / --no-exact-lut.
    exact_lut: bool | None = None
    # Preprocessing chain (leandvb.cc:277-399):
    awgn: float = 0.0            # in-graph noise stddev (--awgn)
    anf: int = 0                 # number of auto-notch slots (--anf)
    Fderot: float = 0.0          # fixed derotation in Hz (--derotate)
    cnr: bool = False            # CNR estimation (--cnr)
    want_spectrum: bool = False  # --fd-spectrum
    resample: bool = False       # lowpass + decimate to ~4 sps (--resample)
    resample_rej: float = 10.0
    decim: int = 0               # explicit decimation (--decim)
    hs: bool = False             # integer fast-QPSK path (--hs)
    want_const: bool = False     # collect sampled IQ points (--fd-const)
    hdlc: bool = False           # HDLC framing instead of MPEG (--hdlc)
    packetized: bool = False     # 16-bit length prefix (--packetized)
    # None = auto: use the Mosaic demod kernel when running on TPU with a
    # linear sampler and the computed decision path.
    use_pallas: bool | None = None
    # Observability (leandvb.cc:700-713, 418-422):
    debug: bool = False          # -d: per-packet glyph stream on stderr
    fd_pp: int = -1              # --fd-pp: preprocessed IQ as cf32 to fd
    # Time-segmented demod (multi_rx._demod_segmented): each chunk is
    # demodulated as `segments` lane-parallel time segments (fills idle
    # kernel lanes; approximate splices, TS-level parity). CLI:
    # --segments S.
    segments: int = 1
    seg_warmup: int = 2048
    seg_holdoff: int = 8


class _DeconvolSync:
    """Driver for the algebraic deconvolver (deconvol_sync, dvb.h:122-476).

    Keeps a symbol backlog; decodes via the static-window formulation in
    fec/deconv.py. Non-fastlock: single locked sync, rotated by
    next_sync(); fastlock: all 4 hypotheses decoded each block, fewest
    deconvolution errors wins, symbol slip when BER > 1/3.
    """

    def __init__(self, rate: str, fastlock: bool, debug: bool = False):
        self.spec = deconv.deconv_spec(rate)
        self.rate = rate
        self.fastlock = fastlock
        self.debug = debug
        self.locked = 0
        self.skip = 0
        self.backlog = np.empty(0, np.uint8)   # hard symbols

    def next_sync(self):
        # dvb.h:185-193
        self.locked += 1
        if self.locked == 4:
            self.locked = 0
            self.skip = 1

    # Election granularity: the reference's symbol pipebuf holds 4096
    # symbols (BUF_SYMBOLS, leandvb.cc:190), so fastlock re-elects about
    # every ~4k symbols; we mirror that cadence per sub-block.
    BLOCK_SYMBOLS = 4096

    def process(self, symbols: np.ndarray) -> np.ndarray:
        out = [self._process_block(symbols[i:i + self.BLOCK_SYMBOLS])
               for i in range(0, len(symbols), self.BLOCK_SYMBOLS)]
        out = [o for o in out if len(o)]
        return np.concatenate(out) if out else np.empty(0, np.uint8)

    def _process_block(self, symbols: np.ndarray) -> np.ndarray:
        self.backlog = np.concatenate([self.backlog, symbols])
        if self.skip:
            self.backlog = self.backlog[self.skip:]
            self.skip = 0
        spec = self.spec
        nbits = 2 * len(self.backlog)
        if nbits < deconv.TRACEBACK:
            return np.empty(0, np.uint8)
        P = (nbits - deconv.TRACEBACK) // spec.punctweight + 1
        nppb = int(np.lcm(8, spec.punctperiod)) // spec.punctperiod
        P = (P // nppb) * nppb
        nbytes = P * spec.punctperiod // 8
        # Match the reference's "require enough symbols to discriminate"
        # threshold (dvb.h:424-426).
        if nbytes < 32:
            return np.empty(0, np.uint8)

        if self.fastlock:
            errs = [deconv.deconvolve_errors(self.backlog, self.rate, s)
                    for s in range(4)]
            best = int(np.argmin(errs))
            if best != self.locked:
                if self.debug:
                    # "{a->b}": sync-alignment election (dvb.h:442-447)
                    import sys
                    sys.stderr.write(f"{{{self.locked}->{best}}}\n")
                self.locked = best
            if errs[best] > nbytes * 8 // 3:
                self.skip = 1

        out = deconv.deconvolve_block(self.backlog, self.rate, self.locked)
        out = out[:nbytes]
        # Advance: drop the symbols fully consumed, keeping the window
        # overlap (windows end at TRACEBACK + p*punctweight bits).
        consumed_bits = P * spec.punctweight
        self.backlog = self.backlog[consumed_bits // 2:]
        return out


class _DeconvolSyncHS:
    """The --hs algebraic deconvolver (dvb_deconvol_sync, dvb.h:612-703):
    QPSK 1/2 polynomials 0x3ba / 0x38f70 hardcoded, 4 sync LUTs, chunks of
    64 bytes (512 symbols), election every resync_period chunks by
    estimated error bits."""

    CHUNK_BYTES = 64

    def __init__(self, fastlock: bool):
        self.maps = deconv.hs_sync_maps()
        self.locked = 0
        self.resync_phase = 0
        self.resync_period = 1 if fastlock else 32
        self.backlog = np.empty(0, np.uint8)

    def process(self, symbols: np.ndarray) -> np.ndarray:
        self.backlog = np.concatenate([self.backlog, symbols])
        out = []
        # 512 symbols per chunk + 32-symbol window warmup overlap
        need = self.CHUNK_BYTES * 8 + deconv.TRACEBACK // 2
        while len(self.backlog) >= need:
            if self.resync_phase == 0:
                errs = [deconv.deconvolve_errors(
                            self.backlog[:need], "1/2", 0, symmap=self.maps[s])
                        for s in range(4)]
                best = int(np.argmin(errs))
                if best != self.locked:
                    self.locked = best
            b = deconv.deconvolve_block(
                self.backlog[:need], "1/2", 0,
                symmap=self.maps[self.locked])[:self.CHUNK_BYTES]
            out.append(b)
            self.backlog = self.backlog[self.CHUNK_BYTES * 8:]
            self.resync_phase += 1
            if self.resync_phase >= self.resync_period:
                self.resync_phase = 0
        return np.concatenate(out) if out else np.empty(0, np.uint8)


class DvbsReceiver:
    """Single-channel streaming receiver with device-batched demodulation."""

    def __init__(self, cfg: RxConfig):
        self.cfg = cfg
        rate = cfg.rate
        cstln = make_dvbs2_constellation(cfg.constellation, rate)
        if cfg.hard_metric:
            import copy
            cstln = copy.deepcopy(cstln)
            cstln.harden()
        self.cstln = cstln

        # ---- preprocessing chain (leandvb.cc:277-399) ----
        # On an accelerator the single-channel CLI uses the SAME batched
        # device implementations as the fleet (dsp/blocks_device.py,
        # nchan=1 adapters); the host dsp/blocks.py variants are the CPU
        # path and the parity reference (tests/test_blocks_device.py).
        from ..dsp import blocks, filtergen
        import jax
        if jax.default_backend() != "cpu":
            from ..dsp import blocks_device as bd
            mk_notch = bd.AutoNotch1
            mk_cnr = bd.CnrFft1
            mk_spec = bd.Spectrum1
        else:
            mk_notch, mk_cnr, mk_spec = (blocks.AutoNotch, blocks.CnrFft,
                                         blocks.Spectrum)
        self.noise_draws = 0
        self.notch = (mk_notch(cfg.anf, 0.0) if cfg.anf else None)
        self.derot = (blocks.Rotator(-cfg.Fderot / cfg.Fs)
                      if cfg.Fderot else None)
        self.cnr_est = (mk_cnr(cfg.Fm / cfg.Fs) if cfg.cnr else None)
        if self.cnr_est:
            self.cnr_est.decimation = max(int(cfg.Fs), 1)   # ~1 Hz
        self.spectrum = (mk_spec() if cfg.want_spectrum else None)
        if self.spectrum:
            self.spectrum.decimation = max(int(cfg.Fs), 1)

        decim = 1
        self.resampler = None
        Fs_eff = cfg.Fs
        if cfg.resample:
            # Lowpass + decimate to just above 4 samples/symbol
            # (leandvb.cc:353-384).
            decim = cfg.decim or max(1, int(cfg.Fs / (cfg.Fm * 4)))
            transition = (cfg.Fm / 2) * cfg.rolloff
            order = int(cfg.resample_rej * cfg.Fs / (22 * transition))
            order = ((order + 1) // 2) * 2
            fcut = (cfg.Fm / 2) * (1 + cfg.rolloff / 2) / cfg.Fs
            coeffs = filtergen.lowpass(order, fcut)
            ftol = cfg.Fm / (cfg.Fs * decim) * 0.1
            import jax
            if jax.default_backend() != "cpu":
                # Resample at the ingest rate on device: the Mosaic
                # complex-FIR kernel (dsp/fir_pallas.py) with SMEM taps,
                # so carrier re-modulation never recompiles.
                from ..dsp.fir_pallas import FirFilterDevice
                self.resampler = FirFilterDevice(coeffs, decim,
                                                 freq_tol=ftol)
            else:
                self.resampler = blocks.FirFilter(coeffs, decim,
                                                  freq_tol=ftol)
            Fs_eff = cfg.Fs / decim
        elif cfg.decim and cfg.decim > 1:
            decim = cfg.decim
            Fs_eff = cfg.Fs / decim
        self.decim = decim
        self.Fs_eff = Fs_eff

        omega = Fs_eff / cfg.Fm
        sampler = cfg.sampler
        rrc_coeffs = ()
        rrc_steps = 1
        exact = resolve_exact_lut(cfg.exact_lut) or cfg.hard_metric
        self.mf_taps = None
        if sampler == "rrc":
            if exact:
                # Reference-exact polyphase fir_sampler (sdr.h:635-689)
                # inside the XLA scan.
                from ..dsp import filtergen
                rrc_steps = cfg.rrc_steps or max(1, int(64 * cfg.Fm
                                                        / Fs_eff))
                Frrc = Fs_eff * rrc_steps
                transition = (cfg.Fm / 2) * cfg.rolloff
                order = int(cfg.rrc_rej * Frrc / (22 * transition))
                rrc_coeffs = tuple(
                    filtergen.root_raised_cosine(order, cfg.Fm / Frrc,
                                                 cfg.rolloff).tolist())
            else:
                # Fast path: matched filter as a batched device conv,
                # then the linear-sampler kernel (dsp/mf_prefilter.py).
                from ..dsp import mf_prefilter
                self.mf_taps = mf_prefilter.make_mf_taps(
                    Fs_eff, cfg.Fm, cfg.rolloff, cfg.rrc_rej)
                sampler = "linear"
        self.params = receiver.ReceiverParams(
            omega=omega,
            sampler=sampler,
            pll_adjustment=(1.0 / 6 if cfg.viterbi else 1.0),
            allow_drift=cfg.allow_drift,
            meas_decimation=int(Fs_eff / cfg.Finfo) if cfg.Finfo else 1 << 20,
            nsymbols=cstln.nsymbols,
            freq0=cfg.Ftune / Fs_eff,
            rrc_coeffs=rrc_coeffs,
            rrc_steps=rrc_steps,
            exact_lut=exact,
        )
        self.tables = receiver.make_tables(cstln)
        self.state = receiver.init_state(self.params, 1)

        use_pallas = cfg.use_pallas
        if use_pallas is None:
            import jax
            use_pallas = (jax.default_backend() not in ("cpu",)
                          and self.params.sampler == "linear"
                          and not self.params.exact_lut)
        self.use_pallas = bool(use_pallas) and self.params.sampler == "linear"
        if self.use_pallas:
            import jax
            from ..dsp import receiver_pallas as rp
            self._rp = rp
            self._sym_consts = rp.sym_constants(cstln)
            self._planes = rp.pack_state(self.state)
            self._interpret = jax.default_backend() == "cpu"

        if cfg.hs:
            from ..dsp import receiver_hs
            self.hs_params = receiver_hs.HsParams(
                omega=omega, freq0=cfg.Ftune / Fs_eff,
                meas_decimation=(int(Fs_eff / cfg.Finfo)
                                 if cfg.Finfo else 1 << 20))
            self.hs_tables = receiver_hs.hs_tables()
            self.hs_state = receiver_hs.init_state(self.hs_params, 1)
            self.deconv = _DeconvolSyncHS(cfg.fastlock)
            self.mpeg = MpegSync(fastlock=True,
                                 resync_period=1 if cfg.fastlock else 32)
            self._init_common()
            return
        if cfg.viterbi:
            from ..fec.viterbi import ViterbiSyncDevice
            # FEC23 -> FEC46 for QPSK/64APSKe (leandvb.cc:533-537)
            vrate = ("4/6" if (rate == "2/3" and cstln.nsymbols in (4, 64))
                     else rate)
            self.deconv = ViterbiSyncDevice(cstln, vrate,
                                            fastlock=cfg.fastlock)
            on_next = None
        else:
            self.deconv = _DeconvolSync(
                "4/6" if rate == "2/3" else rate, cfg.fastlock,
                debug=cfg.debug)
            on_next = self.deconv.next_sync
        self.mpeg = MpegSync(fastlock=cfg.fastlock, on_next_sync=on_next)
        if cfg.hdlc:
            from ..proto.hdlc import HdlcSync
            self.hdlc_sync = HdlcSync(2, 278, fastlock=cfg.fastlock,
                                      header16=cfg.packetized)
            self.hdlc_sync.debug = cfg.debug
            self.etr_state = (0, 0)
        self._init_common()

    def _init_common(self):
        self.sample_backlog = np.empty((0, 2), np.float32)
        self.byte_backlog = np.empty(0, np.uint8)       # deconv -> mpeg_sync
        self.mpegbyte_backlog = np.empty(0, np.uint8)   # mpeg -> deinterleave
        self.derand_pos = 0
        self.first_derand = True
        # metrics
        from ..core.generic import RateEstimator
        # VBER window ~ twice/second, at least 50000 bits (leandvb.cc:585)
        self.vber_est = RateEstimator(max(int(self.cfg.Fm / 2), 50000))
        self.vbitcount = 0
        self.verrcount = 0
        self.meas = {"freq": [], "ss": [], "mer": [], "vber": [],
                     "cnr": []}
        self.spectrum_lines = []
        self.sampled_points = []     # (re, im) for --fd-const SYMBOLS

    # -- streaming API -----------------------------------------------------

    def process(self, iq: np.ndarray) -> np.ndarray:
        """Feed [n,2] float32 IQ; returns TS packets [k,188] decoded so far."""
        if self.cfg.hs:
            return self._process_hs(iq)
        iq = np.asarray(iq, dtype=np.float32) * np.float32(self.cfg.float_scale)
        iq = self._preprocess(iq)
        if self.cfg.fd_pp >= 0:
            # --fd-pp: the preprocessed cf32 stream (p_preprocessed,
            # leandvb.cc:418-422) — what feeds the demodulator, after
            # scale/notch/derotation/resample/decimation.
            import os
            os.write(self.cfg.fd_pp, np.ascontiguousarray(
                iq, np.float32).tobytes())
        self.sample_backlog = np.concatenate([self.sample_backlog, iq])

        ra = self.params.readahead
        if self.mf_taps is not None:
            ra += len(self.mf_taps) - 1
        navail = len(self.sample_backlog) - ra
        K = navail // receiver.CHUNK
        seg_live = (self.cfg.segments > 1 and not self.cfg.hs
                    and getattr(self, "_chunks_done", 0)
                    >= self.cfg.seg_holdoff)
        if seg_live:
            K -= K % self.cfg.segments   # nseg must stay CHUNK-aligned
        if K <= 0:
            return np.empty((0, TS_SIZE), np.uint8)
        n = K * receiver.CHUNK
        x = self.sample_backlog[: n + ra]
        self.sample_backlog = self.sample_backlog[n:]

        xd = jnp.asarray(x[None, :, :])                 # [1, n+ra, 2]
        S = self.cfg.segments
        from .multi_rx import _SEG_T
        if seg_live and n // S >= self.cfg.seg_warmup + _SEG_T:
            # Time-segmented demod: one channel's chunk as S lane-parallel
            # segments (multi_rx._demod_segmented — same engine as the
            # fleet receiver's segments= mode).
            from .multi_rx import _demod_segmented, init_seg_state
            dem_state = self._planes if self.use_pallas else self.state
            nseg = n // S
            if (getattr(self, "_seg_state", None) is None
                    or getattr(self, "_seg_nseg", 0) != nseg):
                self._seg_state = init_seg_state(
                    self.use_pallas, dem_state, 1, S, nseg)
                self._seg_nseg = nseg
            (dem_state, self._seg_state, seg_sym, seg_valid,
             seg_cost) = _demod_segmented(
                self.params,
                getattr(self, "_sym_consts", None),
                self.mf_taps, 1, S, self.cfg.seg_warmup,
                self.cfg.viterbi, self.use_pallas,
                self._interpret if self.use_pallas else False,
                None if self.use_pallas else self.tables, dem_state,
                self._seg_state, xd)
            if self.use_pallas:
                self._planes = dem_state
                self._meas_backlog = getattr(self, "_meas_backlog", 0) + n
                k = self._meas_backlog // self.params.meas_decimation
                if k:
                    self._meas_backlog %= self.params.meas_decimation
                    p = np.asarray(self._planes).reshape(
                        self._rp.NSTATE, -1)[:, 0]
                    mer = (10 * np.log10(p[5] / p[6])
                           if p[6] > 0 else 0.0)
                    for _ in range(int(k)):
                        self.meas["freq"].append(float(p[2] / 65536.0))
                        self.meas["ss"].append(float(np.sqrt(p[4])))
                        self.meas["mer"].append(float(mer))
            else:
                self.state = dem_state
                p = {k2: np.asarray(v[0]) for k2, v in dem_state.items()}
                self._meas_backlog = getattr(self, "_meas_backlog", 0) + n
                k = self._meas_backlog // self.params.meas_decimation
                if k:
                    self._meas_backlog %= self.params.meas_decimation
                    mer = (10 * np.log10(p["est_sp"] / p["est_ep"])
                           if p["est_ep"] > 0 else 0.0)
                    for _ in range(int(k)):
                        self.meas["freq"].append(
                            float(p["freqw"] / 65536.0))
                        self.meas["ss"].append(
                            float(np.sqrt(p["est_insp"])))
                        self.meas["mer"].append(float(mer))
            valid = np.asarray(seg_valid[:, 0])
            syms = np.asarray(seg_sym[:, 0])[valid]
            costs = (np.asarray(seg_cost[:, 0])[valid]
                     if seg_cost is not None else None)
            self._chunks_done = getattr(self, "_chunks_done", 0) + 1
            if self.cfg.viterbi:
                bytes_out = self.deconv.process(syms, costs)
            else:
                bytes_out = self.deconv.process(syms)
            return self._byte_stages(bytes_out)
        self._chunks_done = getattr(self, "_chunks_done", 0) + 1
        # A sequential interlude moves the stream past the persisted
        # per-segment positions; rebuild them at the next segmented chunk.
        self._seg_state = None
        if self.mf_taps is not None:
            from ..dsp.mf_prefilter import mf_prefilter
            freqw = (self._planes[2].reshape(-1)[:1] if self.use_pallas
                     else self.state["freqw"])
            xd = mf_prefilter(self.mf_taps, freqw, xd)
        if self.use_pallas:
            self._planes, packed = self._rp.demod_pallas(
                self.params, self._sym_consts, self._planes, xd,
                interpret=self._interpret)
            word, cword = self._rp.pack_outputs(packed, 1,
                                                want_cost=self.cfg.viterbi)
            sym, valid_m = self._rp.unpack_sym3(word, n)
            valid = valid_m[0]
            syms = sym[0][valid]
            costs = (self._rp.unpack_cost(cword)[0][:len(valid)][valid]
                     if cword is not None else None)
            # Measurement snapshots from the state planes at the scan
            # path's meas_decimation cadence (the kernel's packed output
            # carries no freq/ss/mer; without this the --fd-info stream
            # and the resampler's freq_tap would starve on TPU).
            self._meas_backlog = getattr(self, "_meas_backlog", 0) + n
            k = self._meas_backlog // self.params.meas_decimation
            if k:
                self._meas_backlog %= self.params.meas_decimation
                p = np.asarray(self._planes).reshape(
                    self._rp.NSTATE, -1)[:, 0]
                mer = (10 * np.log10(p[5] / p[6])
                       if p[6] > 0 else 0.0)
                for _ in range(int(k)):
                    self.meas["freq"].append(float(p[2] / 65536.0))
                    self.meas["ss"].append(float(np.sqrt(p[4])))
                    self.meas["mer"].append(float(mer))
        else:
            self.state, out = receiver.run_chunks(self.params, self.tables,
                                                  self.state, xd)
            valid = np.asarray(out["valid"][0])
            syms = np.asarray(out["symbol"][0])[valid]
            costs = np.asarray(out["cost"][0])[valid]
            self._collect_meas(out)

        if self.cfg.viterbi:
            bytes_out = self.deconv.process(syms, costs)
        else:
            bytes_out = self.deconv.process(syms)
        return self._byte_stages(bytes_out)

    def _process_hs(self, iq: np.ndarray) -> np.ndarray:
        """--hs path (run_highspeed, leandvb.cc:727-969): u8 IQ only."""
        from ..dsp import receiver_hs
        # Undo the u8 -> float conversion of the ingest stage.
        u8 = (np.asarray(iq, np.float32) + 128.0).astype(np.int32)
        self.sample_backlog = np.concatenate(
            [self.sample_backlog, u8.astype(np.float32)])
        navail = len(self.sample_backlog) - 1
        K = navail // receiver_hs.CHUNK
        if K <= 0:
            return np.empty((0, TS_SIZE), np.uint8)
        n = K * receiver_hs.CHUNK
        x = self.sample_backlog[: n + 1].astype(np.int32)
        self.sample_backlog = self.sample_backlog[n:]
        self.hs_state, out = receiver_hs.run_chunks_hs(
            self.hs_params, self.hs_tables, self.hs_state,
            jnp.asarray(x[None]))
        valid = np.asarray(out["valid"][0])
        syms = np.asarray(out["symbol"][0])[valid]
        for k in np.nonzero(np.asarray(out["nmeas"][0]))[0]:
            self.meas["freq"].append(float(out["freq"][0, k]))
        if self.cfg.want_const:
            # cstln_out (fast_qpsk_receiver, sdr.h:1120-1122): one
            # interpolated point per chunk, u8-centered -> centered.
            ok = np.asarray(out["sampled_ok"][0])
            sp = np.asarray(out["sampled"][0])[ok] - 128
            self.sampled_points.extend((float(p[0]), float(p[1]))
                                       for p in sp[-64:])
        bytes_out = self.deconv.process(syms)
        return self._byte_stages(bytes_out)

    def _preprocess(self, iq: np.ndarray) -> np.ndarray:
        """Noise / notch / derotation / CNR / spectrum / resample / decim
        (mirrors the p_preprocessed chain, leandvb.cc:277-399)."""
        cfg = self.cfg
        if cfg.awgn:
            from . import chansim
            # Continue the drand48 stream across chunks (jump to the
            # state after the draws consumed so far, dsp.h:172-183).
            noise, used = chansim.wgn_c(
                len(iq), cfg.awgn,
                seed=chansim.drand48_jump(self.noise_draws))
            self.noise_draws += used
            iq = iq + noise
        z = iq[:, 0] + 1j * iq[:, 1] if (
            self.notch or self.derot or self.cnr_est or self.spectrum
            or self.resampler or self.decim > 1) else None
        if z is None:
            return iq
        if self.notch:
            z = self.notch.process(z)
        if self.derot:
            z = self.derot.process(z)
        freq_tap = (self.meas["freq"][-1] if self.meas["freq"] else 0.0)
        if self.cnr_est:
            for v in self.cnr_est.process(z, freq_tap / self.decim):
                self.meas["cnr"].append(float(v))
        if self.spectrum:
            for line in self.spectrum.process(z):
                self.spectrum_lines.append(line)
        if self.resampler is not None:
            z = self.resampler.process(z, freq_tap / self.decim)
        elif self.decim > 1:
            from ..dsp.blocks import decimate
            z = decimate(z, self.decim)
        return np.stack([z.real, z.imag], axis=-1).astype(np.float32)

    def _byte_stages(self, bytes_out: np.ndarray) -> np.ndarray:
        if self.cfg.hdlc:
            # --hdlc path (leandvb.cc:546-556): ETR192 descramble ->
            # HDLC deframe; output is a frame byte stream, not TS packets.
            from ..proto.hdlc import etr192_descramble
            if not len(bytes_out):
                return np.empty((0, TS_SIZE), np.uint8)
            sr, ctr = self.etr_state
            descr, sr, ctr = etr192_descramble(bytes_out, sr, ctr)
            self.etr_state = (sr, ctr)
            frames = self.hdlc_sync.process(descr)
            self.hdlc_frames = getattr(self, "hdlc_frames",
                                       np.empty(0, np.uint8))
            self.hdlc_frames = np.concatenate([self.hdlc_frames, frames])
            return np.empty((0, TS_SIZE), np.uint8)
        if len(bytes_out):
            self.byte_backlog = np.concatenate([self.byte_backlog, bytes_out])
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
        if self.cfg.debug:
            # Per-packet RS classification glyphs (dvb.h:1029-1038):
            # '_' clean, '.' corrected, '!' still corrupted.
            import sys
            sys.stderr.write("".join(
                "!" if f else ("." if b else "_")
                for f, b in zip(failed, bits)))
            sys.stderr.flush()
        self.vbitcount += rspkts.shape[0] * RS_SIZE * 8
        self.verrcount += int(bits.sum())
        self.vber_est.update(int(bits.sum()), rspkts.shape[0] * RS_SIZE * 8)
        # Corrupted packets keep flowing with a marked sync byte so the
        # derandomizer keeps phase (dvb.h:1043-1046).
        msgs = msgs.copy()
        msgs[failed, 0] ^= prbs.MPEG_SYNC_CORRUPTED

        out, good, self.derand_pos = self._derandomize(msgs)
        return out[good]

    def _derandomize(self, packets: np.ndarray):
        out, good, pos = prbs.derandomize_np(packets, self.derand_pos)
        return out, good, pos

    def _collect_meas(self, out):
        nmeas = np.asarray(out["nmeas"][0])
        for k in np.nonzero(nmeas)[0]:
            for _ in range(int(nmeas[k])):
                self.meas["freq"].append(float(out["freq"][0, k]))
                self.meas["ss"].append(float(out["ss"][0, k]))
                self.meas["mer"].append(float(out["mer"][0, k]))
        if self.cfg.want_const:
            # One interpolated symbol per chunk (p_sampled / cstln_out,
            # sdr.h:860-861); CLI emits batches of 128.
            pts = np.asarray(out["sampled"][0])
            self.sampled_points.extend(map(tuple, pts))

    @property
    def lock(self) -> bool:
        return self.mpeg.synchronized

    @property
    def locktime(self) -> int:
        return self.mpeg.locktime

    # -- checkpoint / resume (SURVEY.md section 5.4: the aggregate state
    # pytree IS the checkpoint — something the reference structurally
    # cannot do; restart there means re-acquiring lock) ----------------

    def save_state(self) -> bytes:
        """Serialize every mutable piece of the receiver: device loop
        state, all host FSMs and stream backlogs."""
        import pickle
        import numpy as np
        dev = ({k: np.asarray(v) for k, v in self.state.items()}
               if not self.use_pallas else np.asarray(self._planes))
        aux = {}
        if self.cfg.hs:
            aux["hs_state"] = {k: np.asarray(v)
                               for k, v in self.hs_state.items()}
        if self.cfg.hdlc:
            aux["etr_state"] = self.etr_state
            aux["hdlc_sync"] = self.hdlc_sync.__dict__
        for name in ("notch", "derot", "cnr_est", "spectrum",
                     "resampler"):
            blk = getattr(self, name, None)
            if blk is not None:
                aux[name] = blk.__dict__
        return pickle.dumps({
            "dev": dev,
            "use_pallas": self.use_pallas,
            "sample_backlog": self.sample_backlog,
            "byte_backlog": self.byte_backlog,
            "mpegbyte_backlog": self.mpegbyte_backlog,
            "derand_pos": self.derand_pos,
            "first_derand": self.first_derand,
            "noise_draws": self.noise_draws,
            "deconv": self.deconv.__dict__ if hasattr(
                self.deconv, "__dict__") else None,
            "mpeg": {k: v for k, v in self.mpeg.__dict__.items()
                     if k != "on_next_sync"},
            "vbitcount": self.vbitcount,
            "verrcount": self.verrcount,
            "meas": self.meas,
            "aux": aux,
        })

    def load_state(self, blob: bytes) -> None:
        import pickle
        d = pickle.loads(blob)
        if d["use_pallas"] != self.use_pallas:
            raise ValueError("checkpoint demod path mismatch")
        if self.use_pallas:
            self._planes = jnp.asarray(d["dev"])
        else:
            self.state = {k: jnp.asarray(v) for k, v in d["dev"].items()}
        self.sample_backlog = d["sample_backlog"]
        self.byte_backlog = d["byte_backlog"]
        self.mpegbyte_backlog = d["mpegbyte_backlog"]
        self.derand_pos = d["derand_pos"]
        if d["deconv"] is not None:
            self.deconv.__dict__.update(d["deconv"])
        self.mpeg.__dict__.update(d["mpeg"])
        self.vbitcount = d["vbitcount"]
        self.verrcount = d["verrcount"]
        self.first_derand = d.get("first_derand", self.first_derand)
        self.noise_draws = d.get("noise_draws", self.noise_draws)
        aux = d.get("aux", {})
        if "hs_state" in aux:
            self.hs_state = {k: jnp.asarray(v)
                             for k, v in aux["hs_state"].items()}
        if "etr_state" in aux:
            self.etr_state = aux["etr_state"]
            self.hdlc_sync.__dict__.update(aux["hdlc_sync"])
        for name in ("notch", "derot", "cnr_est", "spectrum",
                     "resampler"):
            if name in aux and getattr(self, name, None) is not None:
                getattr(self, name).__dict__.update(aux[name])
        self.meas = d["meas"]

    def stats(self) -> dict:
        """Per-stage progress counters (the sch.dump() equivalent,
        framework.h:115-121): totals and backlog fill levels."""
        return {
            "sample_backlog": int(len(self.sample_backlog)),
            "symbol_backlog": int(len(getattr(self.deconv, "backlog",
                                              []))),
            "byte_backlog": int(len(self.byte_backlog)),
            "mpegbyte_backlog": int(len(self.mpegbyte_backlog)),
            "vbitcount": self.vbitcount,
            "verrcount": self.verrcount,
            "lock": self.lock,
            "locktime": self.locktime,
        }

    @property
    def vber(self) -> float:
        """Windowed VBER like the reference's rate_estimator; falls back
        to the cumulative ratio before the first full window."""
        if self.vber_est.latest is not None:
            return self.vber_est.latest
        return self.verrcount / self.vbitcount if self.vbitcount else 0.0
