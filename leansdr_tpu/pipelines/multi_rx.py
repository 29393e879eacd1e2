"""Multi-channel DVB-S receiver: many independent carriers demodulated and
deconvolved in one device batch (the 64 x 2 Msps north-star shape,
BASELINE.json).

Chain layout per chunk (one host sync per chunk):

  device: demod (Pallas kernel / XLA scan, channels on lanes)
          -> symbol compaction ring (cumsum+scatter)
          -> all-hypothesis deconvolution (MXU GF(2) convolution,
             sync x alignment election per ~4k-symbol sub-block)
          -> bit-packed byte streams [C, nbytes]
  host:   MPEG framing FSM (vectorized block decode, proto/framing.py)
          -> deinterleave (strided gather per channel)
          -> ONE batched RS(204,188) decode across all channels' packets
          -> vectorized derandomizer

Only decoded bytes cross the host link (~16x less than raw demod output);
fill watermarks/underflow flags ride in the same fetch. On a mesh,
channels shard across devices (parallel/mesh.py); this class is the
single-host building block.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..dsp import receiver
from .dvbs_rx import RxConfig, TS_SIZE, RS_SIZE, resolve_exact_lut
from ..dsp.cstln import make_dvbs2_constellation
from ..fec import interleave, prbs, rs
from ..fec.deconv_device import DeviceDeconvolver
from ..proto.framing import MpegSync
from functools import partial


def receiver_pallas_nstate() -> int:
    from ..dsp import receiver_pallas as rp
    return rp.NSTATE


@partial(jax.jit, static_argnames=("nd",))
def _pack_fetch(nd: int, fill: jnp.ndarray, *flat):
    """Concatenate `nd` decode results + the fill watermark into ONE u8
    array so the host link pays a single round trip per chunk.

    flat: nd triples (bytes [C,NB] u8, errs [C,E] i32, under [C] bool).
    Layout per channel row: nd x [NB bytes | E*4 errs | 1 under] | 4 fill.
    """
    parts = []
    for i in range(nd):
        by, errs, under = flat[3 * i:3 * i + 3]
        parts += [
            by,
            jax.lax.bitcast_convert_type(errs, jnp.uint8
                                         ).reshape(errs.shape[0], -1),
            under.astype(jnp.uint8)[:, None],
        ]
    parts.append(jax.lax.bitcast_convert_type(
        fill[:, None], jnp.uint8).reshape(fill.shape[0], -1))
    return jnp.concatenate(parts, axis=1)


def _wrap_u16(p):
    """Wrap a u16-unit angle (65536 = 2*pi) into [0, 65536)."""
    return p - jnp.floor(p / 65536.0) * 65536.0


_SEG_T = 64     # boundary handover window (rows)


def _demod_segmented(params, sym_consts, mf_taps, nchan, S, W, want_cost,
                     use_pallas, interpret, tables, dem_state, x):
    """Warmup-approximate time-segmented demod (docs/PERF.md "Segmented
    demod"): each channel's chunk is split into S time segments
    demodulated in PARALLEL kernel lanes, filling the lane slots a small
    fleet leaves idle (the per-step cost at fleet shapes is
    issue/latency-bound, so S segments cost ~the wall time of one).

    Exactness model: the per-sample PLL/timing recurrence (sdr.h:800-847)
    is strictly sequential, so segment s>0 cannot start from the TRUE
    state.  It starts from a PREDICTION — the chunk-carried state with
    the phase advanced by freqw * offset (the only state component with
    a large deterministic drift) — plus W samples of re-convergence
    warmup whose outputs are discarded.  Segment 0 needs neither: it
    starts AT the chunk head, where the carried state is exact, so chunk
    boundaries are sequential-exact and only the S-1 internal splices
    are approximate.  In TRACK the loops re-converge well inside W=2048
    samples (phase prediction error = freqw estimation error x offset
    << pi/4, so the PLL relocks in the SAME quadrant and splices carry
    no rotation).

    Splice handover: converged trajectories still carry +-1-sample
    emission jitter (mu hovers at the emit threshold), so a blind
    row-cut at the boundary occasionally duplicates or drops one symbol
    — a sync-burst per event downstream.  Instead, each boundary is cut
    inside a T-row overlap window (outgoing segment's owned tail vs
    incoming segment's warmup tail, both already computed) at the first
    row where BOTH trajectories emit the SAME symbol at the SAME row:
    the outgoing segment contributes everything through that emission,
    the incoming one everything after it — no duplicate, no gap.  If no
    aligned emission exists in the window (pre-lock, or persistently
    anti-aligned jitter) it falls back to the blind boundary cut.

    Opt-in (MultiDvbsReceiver(segments=S)); acquisition transients are
    absorbed by the deconvolver's per-sub-block sync election.
    Returns (dem_state, sym [n,C], valid, cost).
    """
    from ..dsp import receiver
    from ..dsp.mf_prefilter import mf_prefilter
    C = nchan
    T = _SEG_T
    ntaps1 = (len(mf_taps) - 1) if mf_taps is not None else 0
    ra = params.readahead + ntaps1
    n = x.shape[1] - ra
    nseg = n // S
    if nseg < W or nseg < T:
        raise ValueError(f"chunk/segments = {nseg} < warmup {W}")
    L = W + nseg + ra
    # Segment windows, all inside x: segment 0 starts at the chunk head
    # (exact carried state, owned rows [0, nseg)); segment s>0 starts
    # W samples early (predicted state, owned rows [W, W+nseg)).
    offs = [0] + [s * nseg - W for s in range(1, S)]
    segs = jnp.stack([x[:, o:o + L] for o in offs])
    xs = segs.reshape(S * C, L, 2)               # lane l = s*C + c
    # Predicted phase: sample offset from the carried state's position
    # (chunk head) to each segment's window start, x freqw, wrapped mod
    # 65536 in two exact steps (offsets are multiples of 128).
    offv = jnp.repeat(jnp.asarray(np.array(offs, np.float32)), C)
    if use_pallas:
        from ..dsp import receiver_pallas as rp
        planes = dem_state.reshape(rp.NSTATE, -1)[:, :C]
        rep = jnp.tile(planes, (1, S))           # [NSTATE, S*C] s-major
        adv = _wrap_u16(_wrap_u16(rep[2] * 128.0) * (offv / 128.0))
        rep = rep.at[1].set(_wrap_u16(rep[1] + adv))
        if mf_taps is not None:
            xs = mf_prefilter(mf_taps, rep[2], xs)
        nsub = max(1, -(-(S * C) // rp.LANE))
        planes_in = jnp.pad(rep, ((0, 0), (0, nsub * rp.LANE - S * C))
                            ).reshape(rp.NSTATE, nsub, rp.LANE)
        st_out, packed = rp.demod_pallas(params, sym_consts, planes_in,
                                         xs, interpret=interpret)
        sym, valid, cost = _extract_sym_valid(packed, S * C, want_cost)
        pl_out = st_out.reshape(rp.NSTATE, -1)[:, (S - 1) * C:S * C]
        nsub_c = max(1, -(-C // rp.LANE))
        dem_state = jnp.pad(pl_out, ((0, 0), (0, nsub_c * rp.LANE - C))
                            ).reshape(rp.NSTATE, nsub_c, rp.LANE)
    else:
        rep_state = {k: jnp.tile(v, (S,) + (1,) * (v.ndim - 1))
                     for k, v in dem_state.items()}
        adv = _wrap_u16(_wrap_u16(rep_state["freqw"] * 128.0)
                        * (offv / 128.0))
        rep_state["phase"] = _wrap_u16(rep_state["phase"] + adv)
        if mf_taps is not None:
            xs = mf_prefilter(mf_taps, rep_state["freqw"], xs)
        st_out, out = receiver.run_chunks(params, tables, rep_state, xs)
        sym = out["symbol"].T                     # [W+nseg, S*C]
        valid = out["valid"].T
        cost = out["cost"].T if want_cost else None
        dem_state = {k: v[(S - 1) * C:] for k, v in st_out.items()}

    # Local arrays are [W+nseg, S*C].  Per-segment views:
    def seg_of(a, s):
        return a[:, s * C:(s + 1) * C]

    def owned_rows(s):
        lo = 0 if s == 0 else W
        return lo, lo + nseg

    # -- Rotation correction ------------------------------------------------
    # A segment's PLL locks to the quadrant its predicted phase lands in;
    # under noise the freqw estimate error x a multi-thousand-sample
    # offset regularly exceeds pi/4, so an incoming trajectory can be
    # locked a QPSK quadrant away from the outgoing one.  Emission
    # timing, costs and the loop dynamics are all rotation-invariant for
    # the symmetric QPSK grid (muerr is built from p.c dot products), so
    # the rotation shows up ONLY as a fixed relabeling of the hard
    # decisions — estimated per boundary from decision agreement in the
    # overlap window (right rotation agrees ~all emissions, wrong ones
    # ~1/4) and undone by a label permutation, with the carried state's
    # phase derotated to match.  perms[r] maps the incoming trajectory's
    # labels into the outgoing frame for a lock offset of r*90 degrees
    # (layout 0:(+,+) 1:(+,-) 2:(-,+) 3:(-,-); +90 deg of lock phase
    # rotates the derotated samples by -90: (I,Q)->(Q,-I)).
    qpsk = params.nsymbols == 4
    dphase = jnp.asarray([0.0, 16384.0, 32768.0, -16384.0], jnp.float32)

    def rot_label(sb, r):
        """perms[r][sb] as branchless bit algebra (labels are b1b0 =
        i_neg,q_neg; a 4x4 table gather at these shapes costs ~100 ms
        on TPU, the arithmetic is free).  r may be static or a [C] row."""
        s_ = sb.astype(jnp.int32)
        forms = (s_,
                 2 + (s_ >> 1) - 2 * (s_ & 1),      # [2,0,3,1]  +90
                 3 - s_,                            # [3,2,1,0]  180
                 1 - (s_ >> 1) + 2 * (s_ & 1))      # [1,3,0,2]  -90
        if isinstance(r, int):
            return forms[r].astype(jnp.uint8)
        rh = r[None, :]
        out = forms[0]
        for k in (1, 2, 3):
            out = jnp.where(rh == k, forms[k], out)
        return out.astype(jnp.uint8)

    # Handover cuts: window rows w map to global rows s*nseg - T + w.
    # The anchor is an emission of the SAME symbol by both trajectories
    # at rows offset by at most one (the two timing loops can settle in
    # opposite emission parities — at omega=2 the +-half-sample offsets
    # are symmetric attractors — so same-row matches alone can be empty
    # for a whole window).  Cases, with cut = row after BOTH copies of
    # the anchor symbol:
    #   case0  a and b emit at w        -> cut w+1
    #   case1  a at w, b at w+1         -> cut w+2, needs a silent at w+1
    #   case2  a at w+1, b at w         -> cut w+2, needs b silent at w+1
    # (the silence guards keep the next symbol from being duplicated or
    # dropped when emissions come only one row apart).  Rows < cut come
    # from the outgoing trajectory, >= cut from the incoming one; if no
    # anchor exists (pre-lock garbage) fall back to the blind cut at the
    # boundary.
    sym_corr = [seg_of(sym, 0)]          # corrected [W+nseg, C] slices
    masks = []
    rot_total = jnp.zeros((C,), jnp.float32)
    for s in range(1, S):
        lo_a = (0 if s == 1 else W) + nseg - T
        va = seg_of(valid, s - 1)[lo_a:lo_a + T]
        sa = sym_corr[s - 1][lo_a:lo_a + T]
        vb = seg_of(valid, s)[W - T:W]
        sb_raw = seg_of(sym, s)
        if qpsk:
            cnt = []
            for r in range(4):
                sbr = rot_label(sb_raw[W - T:W], r)
                m = (va[:-1] & vb[:-1] & (sa[:-1] == sbr[:-1])) \
                    | (va[:-1] & vb[1:] & (sa[:-1] == sbr[1:])) \
                    | (va[1:] & vb[:-1] & (sa[1:] == sbr[:-1]))
                cnt.append(m.sum(axis=0))
            cnt = jnp.stack(cnt)                       # [4, C]
            rhat = jnp.argmax(cnt, axis=0)             # [C]
            # Require real evidence; keep labels raw pre-lock.
            rhat = jnp.where(cnt.max(axis=0) >= T // 8, rhat, 0)
            sseg = rot_label(sb_raw, rhat)             # relabeled segment
            # rhat maps segment s's raw labels into the BASE frame (the
            # outgoing side is already corrected), so the last boundary's
            # rotation IS the carried trajectory's offset vs the stream.
            rot_total = dphase[rhat]
        else:
            sseg = sb_raw
        sym_corr.append(sseg)
        sb = sseg[W - T:W]
        c0 = va[:-1] & vb[:-1] & (sa[:-1] == sb[:-1])        # [T-1, C]
        c1 = va[:-1] & vb[1:] & (sa[:-1] == sb[1:]) & ~va[1:]
        c2 = va[1:] & vb[:-1] & (sa[1:] == sb[:-1]) & ~vb[1:]
        anyc = c0 | c1 | c2
        first = jnp.argmax(anyc, axis=0)                     # [C]
        same_row = jnp.take_along_axis(c0, first[None], 0)[0]
        cut = jnp.where(same_row, first + 1, first + 2)
        cut = jnp.where(anyc.any(axis=0), cut, T)
        masks.append(jnp.arange(T)[:, None] >= cut[None, :])

    # Derotate the carried state's lock phase into the stream frame so
    # the next chunk's segment 0 continues unrotated.
    if qpsk:
        if use_pallas:
            from ..dsp import receiver_pallas as rp
            flat = dem_state.reshape(rp.NSTATE, -1)
            ph = _wrap_u16(flat[1, :C] - rot_total)
            dem_state = flat.at[1, :C].set(ph).reshape(dem_state.shape)
        else:
            dem_state = dict(
                dem_state,
                phase=_wrap_u16(dem_state["phase"] - rot_total))

    def splice(a, segs=None):
        parts = []
        for s in range(S):
            lo, hi = owned_rows(s)
            parts.append((segs[s] if segs else seg_of(a, s))[lo:hi])
        out = jnp.concatenate(parts, axis=0)
        for s in range(1, S):
            lo_a = (0 if s == 1 else W) + nseg - T
            pa = (segs[s - 1] if segs else seg_of(a, s - 1)
                  )[lo_a:lo_a + T]
            pb = (segs[s] if segs else seg_of(a, s))[W - T:W]
            patch = jnp.where(masks[s - 1], pb, pa)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, patch, s * nseg - T, axis=0)
        return out

    sym = splice(sym, sym_corr)
    valid = splice(valid)
    cost = splice(cost) if want_cost else None
    return dem_state, sym, valid, cost


@partial(jax.jit, static_argnames=(
    "params", "sym_consts", "mf_taps", "nchan", "kind", "plan",
    "plan_dec", "maps", "schedule", "use_pallas", "interpret",
    "segments", "seg_warmup"))
def _fused_chunk(params, sym_consts, mf_taps, nchan, kind, plan, plan_dec,
                 maps, schedule, use_pallas, interpret,
                 tables, dem_state, dstate, x,
                 segments=1, seg_warmup=2048):
    """ONE device program for a whole chunk: [matched filter] -> demod
    (Pallas kernel or XLA scan) -> sym/valid/cost extraction -> ring
    append(s) -> `schedule` decodes -> the packed fetch buffer.

    dispatch() used to issue each stage as its own jit call (~6 per
    chunk); every call pays dispatch latency (30-60 ms over the axon
    tunnel) and blocks XLA from scheduling across stage boundaries. The
    decode schedule is host-deterministic (fixed chunk sizes -> fixed
    fill bookkeeping), so it folds in as a static argument and the whole
    chunk becomes a single dispatch.
    """
    from ..dsp import receiver
    from ..dsp.mf_prefilter import mf_prefilter
    from ..fec.deconv_device import deconv_append, deconv_decode
    from ..fec.viterbi_device import viterbi_decode
    want_cost = kind.startswith("viterbi")
    if segments > 1:
        dem_state, sym, valid, cost = _demod_segmented(
            params, sym_consts, mf_taps, nchan, segments, seg_warmup,
            want_cost, use_pallas, interpret, tables, dem_state, x)
    else:
        if mf_taps is not None:
            freqw = (dem_state[2].reshape(-1)[:nchan] if use_pallas
                     else dem_state["freqw"])
            x = mf_prefilter(mf_taps, freqw, x)
        if use_pallas:
            from ..dsp import receiver_pallas as rp
            dem_state, packed = rp.demod_pallas(
                params, sym_consts, dem_state, x, interpret=interpret)
            sym, valid, cost = _extract_sym_valid(packed, nchan, want_cost)
        else:
            dem_state, out = receiver.run_chunks(params, tables,
                                                 dem_state, x)
            sym = out["symbol"].T
            valid = out["valid"].T
            cost = out["cost"].T if want_cost else None
    n = sym.shape[0]
    step = plan.nsamp
    flat = []
    for i, o in enumerate(range(0, n, step)):
        m = min(step, n - o)
        dstate = deconv_append(plan, dstate, sym[o:o + m], valid[o:o + m],
                               None if cost is None else cost[o:o + m])
        for _ in range(schedule[i]):
            if kind == "viterbi":
                dstate, by, errs, under = viterbi_decode(
                    plan_dec, dstate, maps, interpret=interpret)
            elif kind == "viterbi_banked":
                from ..fec.viterbi_device import viterbi_decode_banked
                dstate, by, errs, under = viterbi_decode_banked(
                    plan_dec, dstate, maps, interpret=interpret)
            elif kind == "viterbi_xla":
                from ..fec.viterbi_device import viterbi_decode_xla
                dstate, by, errs, under = viterbi_decode_xla(
                    plan_dec, dstate, maps)
            else:
                dstate, by, errs, under = deconv_decode(plan_dec, dstate)
            flat += [by, errs, under]
    packed_out = _pack_fetch(len(flat) // 3, dstate["fill"], *flat)
    return dem_state, dstate, packed_out


@partial(jax.jit, static_argnames=("nchan", "want_cost"))
def _extract_sym_valid(packed: jnp.ndarray, nchan: int,
                       want_cost: bool = False):
    """Pallas kernel output [nsamp, nsub, LANE] i32 -> ([nsamp, C] u8 sym,
    [nsamp, C] bool valid, [nsamp, C] i16 cost or None), fused on device."""
    nsamp = packed.shape[0]
    flat = packed.reshape(nsamp, -1)[:, :nchan]
    sym = ((flat >> 16) & 0xFF).astype(jnp.uint8)
    valid = ((flat >> 24) & 1).astype(bool)
    cost = (-(flat & 0xFFFF)).astype(jnp.int16) if want_cost else None
    return sym, valid, cost


class _ByteChain:
    """Per-channel host byte-domain chain: deconv -> mpeg -> deinterleave
    -> RS -> derandomize (same stages as DvbsReceiver._byte_stages).
    Used by the candidate-scan receiver (pipelines/scan_rx.py), where each
    candidate keeps an independent host FSM chain.

    When `deconv` is None the deconvolution happens centrally in a
    batched path and feed() receives bytes directly."""

    def __init__(self, rate: str, fastlock: bool, batched_deconv=False):
        from .dvbs_rx import _DeconvolSync
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


class _ByteBackend:
    """Host byte-domain stages for one channel fleet, vectorized where the
    data allows and batched across channels at the RS stage."""

    def __init__(self, nchan: int, fastlock: bool, on_next_sync=None):
        self.nchan = nchan
        # Warm the RS LUTs/GF(2) matrices and the correction path so the
        # first streaming chunk doesn't pay their one-time build cost.
        rs.gf2_syndrome_matrix()
        warm = rs.encode(np.zeros((96, 188), np.uint8))
        warm[:, 3] ^= 0x5A
        rs.decode(warm)
        self.mpeg = [
            MpegSync(fastlock=fastlock,
                     on_next_sync=(None if on_next_sync is None
                                   else (lambda c=c: on_next_sync(c))))
            for c in range(nchan)]
        self.byte_backlog = [np.empty(0, np.uint8) for _ in range(nchan)]
        self.mpegbyte_backlog = [np.empty(0, np.uint8)
                                 for _ in range(nchan)]
        self.derand_pos = [0] * nchan
        self.vbitcount = np.zeros(nchan, np.int64)
        self.verrcount = np.zeros(nchan, np.int64)

    def feed(self, bytes_by_chan) -> list:
        """bytes_by_chan: per-channel new byte arrays (possibly empty).
        Returns per-channel TS packet arrays [k, 188]."""
        C = self.nchan
        rspkts = []
        counts = []
        for c in range(C):
            b = bytes_by_chan[c]
            if len(b):
                self.byte_backlog[c] = np.concatenate(
                    [self.byte_backlog[c], b])
            pkts, consumed = self.mpeg[c].process(self.byte_backlog[c])
            self.byte_backlog[c] = self.byte_backlog[c][consumed:]
            if len(pkts):
                self.mpegbyte_backlog[c] = np.concatenate(
                    [self.mpegbyte_backlog[c], pkts.reshape(-1)])
            rp, self.mpegbyte_backlog[c] = interleave.deinterleave(
                self.mpegbyte_backlog[c])
            rspkts.append(rp)
            counts.append(rp.shape[0])
        total = sum(counts)
        outs = [np.empty((0, TS_SIZE), np.uint8)] * C
        if not total:
            return outs
        # One batched RS decode for the whole fleet's packets.
        allp = np.concatenate([r for r in rspkts if len(r)], axis=0)
        msgs, failed, bits = rs.decode(allp)
        msgs = msgs.copy()
        msgs[failed, 0] ^= prbs.MPEG_SYNC_CORRUPTED
        o = 0
        for c in range(C):
            k = counts[c]
            if not k:
                continue
            self.vbitcount[c] += k * RS_SIZE * 8
            self.verrcount[c] += int(bits[o:o + k].sum())
            out, good, self.derand_pos[c] = prbs.derandomize_np(
                msgs[o:o + k], self.derand_pos[c])
            outs[c] = out[good]
            o += k
        return outs

    @property
    def locks(self):
        return [m.synchronized for m in self.mpeg]

    # -- checkpoint/resume (same contract as NativeByteBackend) ----------

    _MPEG_FIELDS = ("polarity", "bitphase", "synchronized",
                    "next_sync_count", "resync_phase", "phase8",
                    "lock_timeleft", "locktime", "locktime_count")

    def save_blob(self) -> bytes:
        import pickle
        return pickle.dumps({
            "mpeg": [{k: getattr(m, k) for k in self._MPEG_FIELDS}
                     for m in self.mpeg],
            "byte_backlog": self.byte_backlog,
            "mpegbyte_backlog": self.mpegbyte_backlog,
            "derand_pos": self.derand_pos,
            "vbitcount": self.vbitcount,
            "verrcount": self.verrcount,
        })

    def restore_blob(self, blob: bytes):
        import pickle
        d = pickle.loads(blob)
        for m, st in zip(self.mpeg, d["mpeg"]):
            for k, v in st.items():
                setattr(m, k, v)
        self.byte_backlog = d["byte_backlog"]
        self.mpegbyte_backlog = d["mpegbyte_backlog"]
        self.derand_pos = d["derand_pos"]
        self.vbitcount = d["vbitcount"]
        self.verrcount = d["verrcount"]


def make_byte_backend(nchan: int, fastlock: bool, on_next_sync=None,
                      native=None):
    """Backend factory: the C++ runtime (leansdr_tpu/native) when it
    builds/loads, else the Python fleet backend. `native=False` forces
    Python (also via LEANSDR_NO_NATIVE=1); `native=True` requires C++."""
    if native is None or native:
        try:
            from ..native import NativeByteBackend
            return NativeByteBackend(nchan, fastlock, on_next_sync)
        except Exception as e:
            if native:
                raise
            # "No compiler / opted out" is expected; anything else is a
            # native-layer regression that must not hide behind the slow
            # Python fallback.
            if not (isinstance(e, RuntimeError)
                    and "unavailable" in str(e)):
                import sys
                print(f"leansdr_tpu: native byte backend failed "
                      f"({e!r}); using Python fallback", file=sys.stderr)
    return _ByteBackend(nchan, fastlock, on_next_sync)


class MultiDvbsReceiver:
    """N-channel receiver: one batched device demod + device deconv +
    vectorized host byte backend."""

    def __init__(self, cfg: RxConfig, nchan: int, use_pallas=None,
                 chunk_samples: int | None = None, native=None,
                 segments: int = 1, seg_warmup: int = 2048,
                 seg_holdoff: int = 8):
        self.cfg = cfg
        self.nchan = nchan
        # Opt-in time-segmented demod (see _demod_segmented): split each
        # chunk into `segments` lane-parallel segments with `seg_warmup`
        # samples of discarded re-convergence warmup per segment.  The
        # first `seg_holdoff` chunks run sequentially: the segmented
        # carried state only adapts over (warmup + chunk/segments)
        # samples per chunk, so engaging segmentation from cold stretches
        # acquisition ~segments-fold; holding off until the loops have
        # locked costs nothing in steady state (both programs stay
        # compiled).
        if segments < 1:
            raise ValueError("segments must be >= 1")
        if seg_warmup % receiver.CHUNK:
            raise ValueError(
                f"seg_warmup must be a multiple of {receiver.CHUNK}")
        if segments > 1 and segments * nchan > 1024:
            raise ValueError(
                f"segments*nchan = {segments * nchan} exceeds the 1024 "
                "demod kernel lane capacity")
        self.segments = segments
        self.seg_warmup = seg_warmup
        self.seg_holdoff = seg_holdoff
        self._chunk_count = 0
        cstln = make_dvbs2_constellation(cfg.constellation, cfg.rate)
        self.cstln = cstln
        exact = resolve_exact_lut(cfg.exact_lut)
        sampler = cfg.sampler
        rrc_coeffs = ()
        rrc_steps = 1
        self.mf_taps = None
        if sampler == "rrc":
            if exact:
                from ..dsp import filtergen
                rrc_steps = cfg.rrc_steps or max(1, int(64 * cfg.Fm
                                                        / cfg.Fs))
                Frrc = cfg.Fs * rrc_steps
                transition = (cfg.Fm / 2) * cfg.rolloff
                order = int(cfg.rrc_rej * Frrc / (22 * transition))
                rrc_coeffs = tuple(
                    filtergen.root_raised_cosine(order, cfg.Fm / Frrc,
                                                 cfg.rolloff).tolist())
            else:
                # Fast path: batched matched-filter conv, then the
                # linear-sampler kernel (dsp/mf_prefilter.py).
                from ..dsp import mf_prefilter
                self.mf_taps = mf_prefilter.make_mf_taps(
                    cfg.Fs, cfg.Fm, cfg.rolloff, cfg.rrc_rej)
                sampler = "linear"
        self.params = receiver.ReceiverParams(
            omega=cfg.Fs / cfg.Fm,
            sampler=sampler,
            nsymbols=cstln.nsymbols,
            freq0=cfg.Ftune / cfg.Fs,
            exact_lut=exact,
            rrc_coeffs=rrc_coeffs,
            rrc_steps=rrc_steps,
            pll_adjustment=(1.0 / 6 if cfg.viterbi else 1.0),
        )
        self.tables = receiver.make_tables(cstln)
        self.state = receiver.init_state(self.params, nchan)
        if use_pallas is None:
            use_pallas = (jax.default_backend() != "cpu"
                          and self.params.sampler == "linear"
                          and not self.params.exact_lut)
        self.use_pallas = use_pallas and self.params.sampler == "linear"
        if use_pallas:
            from ..dsp import receiver_pallas as rp
            self._rp = rp
            self._sym_consts = rp.sym_constants(cstln)
            self._planes = rp.pack_state(self.state)
            self._interpret = jax.default_backend() == "cpu"
        self.rate = "4/6" if cfg.rate == "2/3" else cfg.rate
        self.omega = cfg.Fs / cfg.Fm

        self.viterbi = bool(cfg.viterbi)
        nominal = chunk_samples or (1 << 16)
        if self.viterbi:
            from ..fec.viterbi_device import MultiViterbiSync
            self.deconv = MultiViterbiSync(
                cstln, self.rate, nchan, nominal, self.omega,
                fastlock=cfg.fastlock)
            self.backend = make_byte_backend(nchan, cfg.fastlock,
                                             native=native)
        else:
            self.deconv = DeviceDeconvolver(
                self.rate, nchan, nominal, self.omega,
                fastlock=cfg.fastlock)
            on_next = None if cfg.fastlock else self.deconv.next_sync
            self.backend = make_byte_backend(nchan, cfg.fastlock,
                                             on_next_sync=on_next,
                                             native=native)
        self.sample_backlog = np.empty((nchan, 0, 2), np.float32)
        self._pool = None
        self._fetch_pool = None
        self._backend_pool = None
        self._jobs = None

        # Fleet preprocessing (leandvb.cc:277-399) — batched device FFTs
        # over all channels (dsp/blocks_device.py), host FSMs at block
        # rate only.
        from ..dsp import blocks_device as bd
        self.notch = (bd.BatchedAutoNotch(nchan, cfg.anf)
                      if cfg.anf else None)
        self.cnr_est = (bd.BatchedCnrFft(nchan, cfg.Fm / cfg.Fs)
                        if cfg.cnr else None)
        if self.cnr_est:
            self.cnr_est.decimation = max(int(cfg.Fs), 1)
        self.spectrum = (bd.BatchedSpectrum(nchan)
                         if cfg.want_spectrum else None)
        if self.spectrum:
            self.spectrum.decimation = max(int(cfg.Fs), 1)
        self.cnr = []                  # [C] vectors, ~1 Hz
        self.spectrum_lines = []       # [C, 1024] dB lines

    # -- streaming API ----------------------------------------------------

    def process(self, iq):
        """[C, n, 2] float32 IQ -> list of [k_c, 188] TS packet arrays.

        `iq` may be a device array whose length is readahead + a multiple
        of CHUNK (with float_scale already applied): it is then consumed
        directly with no host round-trip — the fast path for
        device-resident streams. Use dispatch()/collect() for a
        software-pipelined variant that overlaps fetch with compute.
        """
        pend = self.dispatch(iq)
        if pend is None:
            return [np.empty((0, TS_SIZE), np.uint8)] * self.nchan
        return self.collect(pend)

    def dispatch(self, iq):
        """Enqueue device work for one chunk; returns a pending handle
        (device arrays) or None if not enough samples buffered."""
        ra = self.params.readahead
        if self.mf_taps is not None:
            ra += len(self.mf_taps) - 1
        preproc = (self.notch is not None or self.cnr_est is not None
                   or self.spectrum is not None)
        if isinstance(iq, jnp.ndarray) and not isinstance(iq, np.ndarray) \
                and not preproc \
                and self.sample_backlog.shape[1] == 0 \
                and (iq.shape[1] - ra) % (receiver.CHUNK
                                          * self.segments) == 0:
            # Device-resident fast path (only when no host preprocessing
            # stage is configured — it must not silently skip them).
            x = iq
            n = iq.shape[1] - ra
        else:
            iq = np.asarray(iq, np.float32) * np.float32(
                self.cfg.float_scale)
            # Chain order mirrors the single-channel pipeline
            # (leandvb.cc:277-399): notch BEFORE the CNR/spectrum
            # estimators, so a notched birdie does not inflate CNR.
            if self.notch is not None:
                iq = self.notch.process(iq)
            if self.cnr_est or self.spectrum:
                freqw = (self._planes[2].reshape(-1)[:self.nchan]
                         if self.use_pallas else self.state["freqw"])
                taps = np.asarray(freqw) / 65536.0
                if self.cnr_est:
                    self.cnr.extend(self.cnr_est.process(iq, taps))
                if self.spectrum:
                    self.spectrum_lines.extend(self.spectrum.process(iq))
            self.sample_backlog = np.concatenate(
                [self.sample_backlog, iq], axis=1)
            K = (self.sample_backlog.shape[1] - ra) // receiver.CHUNK
            K -= K % self.segments       # nseg must stay CHUNK-aligned
            if K <= 0:
                return None
            n = K * receiver.CHUNK
            x = jnp.asarray(self.sample_backlog[:, :n + ra])
            self.sample_backlog = self.sample_backlog[:, n:]

        # ONE fused device program per chunk (mf -> demod -> ring appends
        # -> decodes -> packed fetch buffer). The decode schedule comes
        # from the same host fill bookkeeping decode() uses; appends
        # larger than the ring's sizing split along time with decodes
        # drained between slices.
        self.deconv.apply_pending_transition()
        plan_dec = self.deconv.plan_dec
        step = self.deconv.plan.nsamp
        schedule = []
        for o in range(0, n, step):
            m = min(step, n - o)
            self.deconv.note_production(max(0, int(m / self.omega) - 8))
            schedule.append(self.deconv.schedule_decode())
        dem_state = self._planes if self.use_pallas else self.state
        S = (self.segments
             if self._chunk_count >= self.seg_holdoff else 1)
        dem_state, dstate, packed_out = _fused_chunk(
            self.params,
            self._sym_consts if self.use_pallas else None,
            self.mf_taps, self.nchan, self.deconv.kind,
            self.deconv.plan, plan_dec, self.deconv.maps,
            tuple(schedule), self.use_pallas,
            (self._interpret if self.use_pallas
             else getattr(self.deconv, "interpret", False)),
            None if self.use_pallas else self.tables,
            dem_state, self.deconv.state, x,
            segments=S, seg_warmup=self.seg_warmup)
        self._chunk_count += 1
        if self.use_pallas:
            self._planes = dem_state
        else:
            self.state = dem_state
        self.deconv.state = dstate
        ecols = plan_dec.E + (1 if self.deconv.kind.startswith("viterbi")
                              else 0)
        shapes = [(plan_dec.nbytes, ecols)] * sum(schedule)
        return packed_out, shapes

    def prefetch(self, pending):
        """Start the device->host transfer of a dispatch()'s packed
        result on a background thread, so the link transfer overlaps the
        host byte backend of the PREVIOUS chunk. Returns a pending handle
        accepted by collect()."""
        if pending is None:
            return None
        packed_out, shapes = pending
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(1)
        return self._pool.submit(np.asarray, packed_out), shapes

    def collect(self, pending) -> list:
        """Fetch one dispatch()'s results (ONE host round trip) and run
        the host byte backend."""
        packed_out, shapes = pending
        if hasattr(packed_out, "result"):
            buf = packed_out.result()                # prefetched
        else:
            buf = np.asarray(packed_out)             # [C, total]
        per_chan = [[] for _ in range(self.nchan)]
        observe = getattr(self.deconv, "observe", None)
        o = 0
        for nb, ne in shapes:
            by = buf[:, o:o + nb]
            o += nb
            errs = np.ascontiguousarray(buf[:, o:o + ne * 4]).view("<i4")
            o += ne * 4
            under = buf[:, o]
            o += 1
            if observe is not None:
                observe(errs, under.astype(bool))
            for c in range(self.nchan):
                if not under[c]:
                    per_chan[c].append(by[c])
        fill = buf[:, o:o + 4].copy().view(np.int32)[:, 0]
        self.deconv.sync_fill(fill)
        bytes_by_chan = [
            np.concatenate(p) if p else np.empty(0, np.uint8)
            for p in per_chan]
        return self.backend.feed(bytes_by_chan)

    # -- software-pipelined streaming --------------------------------------
    #
    # Three overlapped stages, one chunk deep each (P7: the reference's
    # process pipeline, leanmlmrx.cc:54-78, as host threads around one
    # device stream):
    #   main thread:    dispatch (async device enqueue)
    #   fetch thread:   device->host link transfer of the packed bytes
    #   backend thread: MPEG framing / deinterleave / RS / derandomize
    # Safe because dispatch's can_decode() uses the conservative
    # note_production watermark; collect()'s sync_fill only raises it.

    max_inflight = 3     # pipeline depth: bounds queued device buffers

    def submit(self, iq) -> list:
        """Enqueue one chunk; return the TS outputs of any chunks whose
        backend completed (a list of per-channel packet-array lists).
        Blocks only when more than `max_inflight` chunks are in flight
        (backpressure keeps device/link queues shallow)."""
        if self._jobs is None:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            self._fetch_pool = ThreadPoolExecutor(1)
            self._backend_pool = ThreadPoolExecutor(1)
            self._jobs = deque()
        pend = self.dispatch(iq)
        if pend is not None:
            packed_out, shapes = pend
            fut = self._fetch_pool.submit(np.asarray, packed_out)
            self._jobs.append(
                self._backend_pool.submit(self.collect, (fut, shapes)))
        done = []
        while self._jobs and (self._jobs[0].done()
                              or len(self._jobs) > self.max_inflight):
            done.append(self._jobs.popleft().result())
        return done

    def flush(self) -> list:
        """Wait for all in-flight chunks; return their TS outputs."""
        if not self._jobs:
            return []
        done = [j.result() for j in self._jobs]
        self._jobs.clear()
        return done

    # -- checkpoint/resume --------------------------------------------------

    _DECONV_HOST_FIELDS = ("_est_fill", "track", "_want_track", "_stable",
                           "_last_cur", "_entry_d", "track_after")

    def save_state(self) -> bytes:
        """Serialize every mutable piece of the fleet receiver: demod
        state, the symbol ring + trellis/deconv state, the byte-domain
        backend (incl. the native C++ FSMs) and stream backlogs."""
        import pickle
        dev = (np.asarray(self._planes) if self.use_pallas
               else {k: np.asarray(v) for k, v in self.state.items()})
        dstate = {k: np.asarray(v) for k, v in self.deconv.state.items()}
        dhost = {k: getattr(self.deconv, k)
                 for k in self._DECONV_HOST_FIELDS
                 if hasattr(self.deconv, k)}
        return pickle.dumps({
            "use_pallas": self.use_pallas,
            "dev": dev,
            "deconv_state": dstate,
            "deconv_host": dhost,
            "backend": self.backend.save_blob(),
            "backend_native": type(self.backend).__name__,
            "sample_backlog": self.sample_backlog,
            "chunk_count": self._chunk_count,
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
        self.deconv.state = {k: jnp.asarray(v)
                             for k, v in d["deconv_state"].items()}
        for k, v in d["deconv_host"].items():
            setattr(self.deconv, k, v)
        if d["backend_native"] != type(self.backend).__name__:
            raise ValueError(
                f"checkpoint byte-backend mismatch: saved with "
                f"{d['backend_native']}, restoring into "
                f"{type(self.backend).__name__} (set LEANSDR_NO_NATIVE "
                f"or native= to match)")
        self.backend.restore_blob(d["backend"])
        self.sample_backlog = d["sample_backlog"]
        self._chunk_count = d.get("chunk_count", 0)

    def metrics(self):
        """Per-channel measurement snapshot (one small host fetch —
        call at info rate, ~1 Hz): dict of [C] arrays freq (fraction of
        Fs), ss, mer_db (sdr.h:852-889 estimator state)."""
        if self.use_pallas:
            p = np.asarray(self._planes).reshape(receiver_pallas_nstate(),
                                                 -1)[:, :self.nchan]
            freqw, est_insp, est_sp, est_ep = p[2], p[4], p[5], p[6]
        else:
            freqw = np.asarray(self.state["freqw"])
            est_insp = np.asarray(self.state["est_insp"])
            est_sp = np.asarray(self.state["est_sp"])
            est_ep = np.asarray(self.state["est_ep"])
        mer = np.where(est_ep > 0,
                       10 * np.log10(np.maximum(est_sp, 1e-30)
                                     / np.maximum(est_ep, 1e-30)), 0.0)
        return {"freq": freqw / 65536.0, "ss": np.sqrt(est_insp),
                "mer_db": mer}

    @property
    def locks(self):
        return self.backend.locks

    @property
    def vbitcount(self):
        return self.backend.vbitcount

    @property
    def verrcount(self):
        return self.backend.verrcount
