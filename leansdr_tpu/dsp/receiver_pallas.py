"""Pallas TPU kernel for the constellation receiver hot loop.

The XLA `lax.scan` path (receiver.py) is behavior-exact but pays per-step
dispatch overhead (~10us/sample-step on v5e regardless of channel count).
This kernel runs the whole per-sample recurrence inside one Mosaic
program: loop state lives in vector registers, channels fill one native
(8,128) f32 tile (up to 1024 per core), and each grid step processes one
reference chunk (128 samples, sdr.h:706) with the chunk-boundary updates
(AGC/MER/clamp/phase-wrap, sdr.h:852-898) applied between grid steps.

Decision math is the gather-free computed form proven equivalent to the
256x256 LUT in receiver._lookup_computed: integer squared distances over
the s8-quantized grid (bit-identical symbol + cost), trig/atan2 computed
on the VPU (~1 ulp vs the trig16 table).

Outputs are packed one int32 per sample per channel:
  bits 0..15  = -cost  (0..32767)
  bits 16..23 = symbol
  bit  24     = valid (symbol emitted at this sample)
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cstln import CSTLN_AMP, Cstln
from .receiver import ReceiverParams, CHUNK


def sym_constants(cstln: Cstln):
    """Static constellation constants for demod_pallas."""
    sym = cstln.symbols.astype(np.float32)
    phase = np.arctan2(sym[:, 1], sym[:, 0]).astype(np.float32)
    return (tuple(float(v) for v in sym[:, 0]),
            tuple(float(v) for v in sym[:, 1]),
            tuple(float(v) for v in phase))

SUB, LANE = 8, 128
CMAX = SUB * LANE

from .math_utils import atan2_poly as _atan2


def _mkparams(params: ReceiverParams):
    f32 = jnp.float32
    return dict(
        omega=f32(params.omega),
        freq_alpha=f32(0.04),
        freq_beta=f32(0.0012 / params.omega * params.pll_adjustment),
        gain_mu=f32(0.02 / (CSTLN_AMP * CSTLN_AMP) * 2),
        kest=f32(params.kest),
        min_freqw=f32(params.freq_limits[0]),
        max_freqw=f32(params.freq_limits[1]),
    )


def _demod_kernel(params: ReceiverParams, sym_re, sym_im, sym_phase, nsub,
                  x0re_ref, x0im_ref, xnre_ref, xnim_ref,
                  st_in_ref, st_out_ref, out_ref, st_scratch):
    """One grid step = one 128-sample chunk.

    st layout (plane index in [18, 8, 128] array):
      0 mu, 1 phase, 2 freqw, 3 agc_gain, 4 est_insp, 5 est_sp, 6 est_ep,
      7..12  hist_p re/im for k, k-1, k-2 (re0,im0,re1,im1,re2,im2)
      13..18 hist_c likewise (13..17 used, plane 17 end)
    """
    P = _mkparams(params)
    nsym = len(sym_re)
    i = pl.program_id(0)
    nT = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        st_scratch[...] = st_in_ref[...]

    mu = st_scratch[0]
    phase = st_scratch[1]
    freqw = st_scratch[2]
    agc_gain = st_scratch[3]
    chunk_freqw = freqw      # sampler->update_freq at chunk start
    # Rotation for pin1 derived from pin0's by one angle-addition with the
    # chunk-constant delta (saves one sincos per sample; the delta loses
    # the per-sample u16 quantization of the second angle — sub-ulp-of-
    # phase-step difference, equivalent behavior).
    idx_d = jnp.trunc(-chunk_freqw)
    idx_d = idx_d - jnp.floor(idx_d / 65536.0) * 65536.0
    a_d = idx_d * jnp.float32(2 * np.pi / 65536)
    dcos = jnp.cos(a_d)
    dsin = jnp.sin(a_d)

    hist = [st_scratch[7 + k] for k in range(12)]
    # hist order: p_re0, p_im0, p_re1, p_im1, p_re2, p_im2,
    #             c_re0, c_im0, c_re1, c_im1, c_re2, c_im2

    zeros = jnp.zeros((nsub, LANE), jnp.float32)

    # QPSK sign-quadrant grid (the DVB-S workhorse): the 4-symbol argmin
    # scan collapses to a closed form. All quantities are integers < 2^24
    # so every f32 op is exact and the closed form is BIT-IDENTICAL to
    # the scan (symbol order 0:(+,+) 1:(+,-) 2:(-,+) 3:(-,-); ties at
    # i8==0 / q8==0 go to the lower index, which the strict-< scan also
    # picks). Shortens the per-sample dependency chain by ~15 ops.
    qpsk_grid = (
        nsym == 4
        and len({abs(v) for v in sym_re} | {abs(v) for v in sym_im}) == 1
        and [(v > 0, w > 0) for v, w in zip(sym_re, sym_im)]
        == [(True, True), (True, False), (False, True), (False, False)])

    def body(t, carry):
        (mu, phase, freqw, p0r, p0i, p1r, p1i, p2r, p2i,
         c0r, c0i, c1r, c1i, c2r, c2i,
         lsg_re, lsg_im, ls_re, ls_im, lc_re, lc_im, any_f) = carry

        x0r = x0re_ref[t]
        x0i = x0im_ref[t]
        # pin1 = next sample; the chunk's last sample peeks at the first
        # sample of the NEXT chunk, delivered via the tiny xn block.
        tn = jnp.minimum(t + 1, CHUNK - 1)
        last = t == CHUNK - 1
        x1r = jnp.where(last, xnre_ref[0], x0re_ref[tn])
        x1i = jnp.where(last, xnim_ref[0], x0im_ref[tn])

        emit = mu < 1.0

        # linear sampler interp (sdr.h:617-623); -phase rotation.
        # expi(float a): truncate toward zero FIRST, then wrap mod 65536
        # (math.h:108-110 casts (uint16)(int16)(int32)a).
        idx0 = jnp.trunc(-phase)
        idx0 = idx0 - jnp.floor(idx0 / 65536.0) * 65536.0
        a0 = idx0 * jnp.float32(2 * np.pi / 65536)
        cr0 = jnp.cos(a0)
        sr0 = jnp.sin(a0)
        cr1 = cr0 * dcos - sr0 * dsin
        sr1 = sr0 * dcos + cr0 * dsin
        sg0_re = x0r * cr0 - x0i * sr0
        sg0_im = x0r * sr0 + x0i * cr0
        sg1_re = x1r * cr1 - x1i * sr1
        sg1_im = x1r * sr1 + x1i * cr1
        sg_re = sg0_re * (1 - mu) + sg1_re * mu
        sg_im = sg0_im * (1 - mu) + sg1_im * mu

        s_re = sg_re * agc_gain
        s_im = sg_im * agc_gain

        # constellation decision (computed LUT semantics). The
        # reference halves out-of-range IQ up to 12 rounds
        # (sdr.h:470-485); round j triggers iff any coordinate exceeds
        # [-128*2^j, 127*2^j], so the round count is
        #   k = min(12, max over coords/sides of ceil(log2(v / bound)))
        # computed EXACTLY from the f32 exponent bits: for positive
        # normals, v > b*2^j  <=>  bits(v) > bits(b) + (j << 23), so the
        # count of satisfied j is ceil((bits(v) - bits(b)) / 2^23).
        # 2^-k is then built directly as exponent bits. Bit-identical to
        # the sequential rounds (they are pure comparisons + exact
        # halvings) at a fraction of the dependency depth.
        I, Q = s_re, s_im
        B_HI = jnp.int32(0x42FE0000)       # bits(127.0f)
        B_LO = jnp.int32(0x43000000)       # bits(128.0f)
        zero_i = jnp.zeros((nsub, LANE), jnp.int32)

        def _kceil(v, bref, bound):
            b = jax.lax.bitcast_convert_type(v, jnp.int32)
            k = (b - bref + jnp.int32(0x7FFFFF)) >> 23
            return jnp.where(v > bound, k, zero_i)

        k_half = jnp.maximum(
            jnp.maximum(_kceil(I, B_HI, 127.0), _kceil(-I, B_LO, 128.0)),
            jnp.maximum(_kceil(Q, B_HI, 127.0), _kceil(-Q, B_LO, 128.0)))
        k_half = jnp.minimum(k_half, 12)
        scale = jax.lax.bitcast_convert_type(
            (jnp.int32(127) - k_half) << 23, jnp.float32)
        I = I * scale
        Q = Q * scale
        i8 = jnp.trunc(I)
        q8 = jnp.trunc(Q)
        if qpsk_grid:
            a = sym_re[0]
            ai = jnp.abs(i8)
            aq = jnp.abs(q8)
            d1 = (ai - a) ** 2 + (aq - a) ** 2
            d2 = d1 + (4 * a) * jnp.minimum(ai, aq)
            neg_i = i8 < 0
            neg_q = q8 < 0
            near = neg_i.astype(jnp.int32) * 2 + neg_q.astype(jnp.int32)
            cpt_re = jnp.where(neg_i, jnp.float32(-a), jnp.float32(a))
            cpt_im = jnp.where(neg_q, jnp.float32(-a), jnp.float32(a))
            ph_sym = jnp.where(
                neg_q,
                jnp.where(neg_i, sym_phase[3], sym_phase[1]),
                jnp.where(neg_i, sym_phase[2], sym_phase[0]))
        else:
            d1 = jnp.full((nsub, LANE), 3.4e38, jnp.float32)
            d2 = jnp.full((nsub, LANE), 3.4e38, jnp.float32)
            near = jnp.zeros((nsub, LANE), jnp.int32)
            cpt_re = zeros
            cpt_im = zeros
            ph_sym = zeros
            for s in range(nsym):
                ds = (i8 - sym_re[s]) ** 2 + (q8 - sym_im[s]) ** 2
                better = ds < d1
                d2 = jnp.where(better, d1, jnp.minimum(d2, ds))
                d1 = jnp.where(better, ds, d1)
                near = jnp.where(better, s, near)
                cpt_re = jnp.where(better, sym_re[s], cpt_re)
                cpt_im = jnp.where(better, sym_im[s], cpt_im)
                ph_sym = jnp.where(better, sym_phase[s], ph_sym)
        cost = jnp.minimum(d1, 32767.0) - jnp.minimum(d2, 32767.0)

        ph_err = _atan2(q8, i8) - ph_sym
        pe_i = jnp.trunc(ph_err * jnp.float32(65536 / (2 * np.pi))
                         ).astype(jnp.int32)
        pe16 = ((pe_i & 0xFFFF) ^ 0x8000) - 0x8000
        perr_f = pe16.astype(jnp.float32)

        # PLL (sdr.h:813-815)
        phase_u = phase + perr_f * P["freq_alpha"]
        freqw_u = freqw + perr_f * P["freq_beta"]

        # modified M&M (sdr.h:817-840):
        # muerr = dot(p[k]-p[k-2], c[k-1]) - dot(c[k]-c[k-2], p[k-1])
        muerr = ((s_re - p1r) * c0r + (s_im - p1i) * c0i) - \
                ((cpt_re - c1r) * p0r + (cpt_im - c1i) * p0i)
        mucorr = jnp.clip(muerr * P["gain_mu"], -0.1, 0.1)
        mu_u = mu + mucorr + P["omega"]

        mu = jnp.where(emit, mu_u, mu)
        phase = jnp.where(emit, phase_u, phase)
        freqw = jnp.where(emit, freqw_u, freqw)
        np0r = jnp.where(emit, s_re, p0r)
        np0i = jnp.where(emit, s_im, p0i)
        np1r = jnp.where(emit, p0r, p1r)
        np1i = jnp.where(emit, p0i, p1i)
        np2r = jnp.where(emit, p1r, p2r)
        np2i = jnp.where(emit, p1i, p2i)
        nc0r = jnp.where(emit, cpt_re, c0r)
        nc0i = jnp.where(emit, cpt_im, c0i)
        nc1r = jnp.where(emit, c0r, c1r)
        nc1i = jnp.where(emit, c0i, c1i)
        nc2r = jnp.where(emit, c1r, c2r)
        nc2i = jnp.where(emit, c1i, c2i)

        lsg_re = jnp.where(emit, sg_re, lsg_re)
        lsg_im = jnp.where(emit, sg_im, lsg_im)
        ls_re = jnp.where(emit, s_re, ls_re)
        ls_im = jnp.where(emit, s_im, ls_im)
        lc_re = jnp.where(emit, cpt_re, lc_re)
        lc_im = jnp.where(emit, cpt_im, lc_im)
        any_f = jnp.where(emit, 1.0, any_f)

        packed = ((-cost).astype(jnp.int32)
                  | (near << 16)
                  | (emit.astype(jnp.int32) << 24))
        out_ref[t] = packed

        mu = mu - 1.0
        phase = phase + freqw
        return (mu, phase, freqw, np0r, np0i, np1r, np1i, np2r, np2i,
                nc0r, nc0i, nc1r, nc1i, nc2r, nc2i,
                lsg_re, lsg_im, ls_re, ls_im, lc_re, lc_im, any_f)

    carry0 = (mu, phase, freqw,
              hist[0], hist[1], hist[2], hist[3], hist[4], hist[5],
              hist[6], hist[7], hist[8], hist[9], hist[10], hist[11],
              zeros, zeros, zeros, zeros, zeros, zeros, zeros)

    def body2(i, carry):      # 2x unroll: halves loop/branch overhead
        carry = body(2 * i, carry)
        return body(2 * i + 1, carry)

    carry = jax.lax.fori_loop(0, CHUNK // 2, body2, carry0)
    (mu, phase, freqw, p0r, p0i, p1r, p1i, p2r, p2i,
     c0r, c0i, c1r, c1i, c2r, c2i,
     lsg_re, lsg_im, ls_re, ls_im, lc_re, lc_im, any_f) = carry

    # ---- chunk-end updates (sdr.h:852-898) ----
    any_sym = any_f > 0
    phase = phase - jnp.trunc(phase / 65536.0) * 65536.0   # fmodf

    est_insp = st_scratch[4]
    est_sp = st_scratch[5]
    est_ep = st_scratch[6]
    insp = lsg_re * lsg_re + lsg_im * lsg_im
    kest = P["kest"]
    est_insp = jnp.where(any_sym, insp * kest + est_insp * (1 - kest),
                         est_insp)
    agc_gain = jnp.where(any_sym & (est_insp > 0),
                         CSTLN_AMP / jnp.sqrt(est_insp), agc_gain)
    ev_re = ls_re - lc_re
    ev_im = ls_im - lc_im
    if params.nsymbols == 2:
        sig_r = (lc_re + lc_im) * jnp.float32(0.707)
        evr = (ev_re + ev_im) * jnp.float32(0.707)
        sig_power = sig_r * sig_r
        ev_power = evr * evr
    else:
        sig_power = lc_re * lc_re + lc_im * lc_im
        ev_power = ev_re * ev_re + ev_im * ev_im
    est_sp = jnp.where(any_sym, sig_power * kest + est_sp * (1 - kest),
                       est_sp)
    est_ep = jnp.where(any_sym, ev_power * kest + est_ep * (1 - kest),
                       est_ep)
    if not params.allow_drift:
        bad = (freqw < P["min_freqw"]) | (freqw > P["max_freqw"])
        freqw = jnp.where(bad, (P["min_freqw"] + P["max_freqw"]) / 2, freqw)

    st_scratch[0] = mu
    st_scratch[1] = phase
    st_scratch[2] = freqw
    st_scratch[3] = agc_gain
    st_scratch[4] = est_insp
    st_scratch[5] = est_sp
    st_scratch[6] = est_ep
    for k in range(6):
        st_scratch[7 + k] = (p0r, p0i, p1r, p1i, p2r, p2i)[k]
    for k in range(6):
        st_scratch[13 + k] = (c0r, c0i, c1r, c1i, c2r, c2i)[k]

    @pl.when(i == nT - 1)
    def _():
        st_out_ref[...] = st_scratch[...]


NSTATE = 19


def pack_state(state, nsub: int | None = None) -> jnp.ndarray:
    """receiver.init_state dict [C,...] -> [NSTATE, nsub, 128] planes.

    Default nsub matches demod_pallas's channel-tile formula."""
    C = state["mu"].shape[0]
    if nsub is None:
        nsub = max(1, -(-C // LANE))
    cmax = nsub * LANE
    assert C <= cmax
    planes = np.zeros((NSTATE, cmax), np.float32)

    def put(k, v):
        planes[k, :C] = np.asarray(v, np.float32)

    put(0, state["mu"]); put(1, state["phase"]); put(2, state["freqw"])
    put(3, state["agc_gain"]); put(4, state["est_insp"])
    put(5, state["est_sp"]); put(6, state["est_ep"])
    hp = np.asarray(state["hist_p"], np.float32)   # [C,3,2]
    hc = np.asarray(state["hist_c"], np.float32)
    for k in range(3):
        planes[7 + 2 * k, :C] = hp[:, k, 0]
        planes[8 + 2 * k, :C] = hp[:, k, 1]
        planes[13 + 2 * k, :C] = hc[:, k, 0]
        planes[14 + 2 * k, :C] = hc[:, k, 1]
    return jnp.asarray(planes.reshape(NSTATE, nsub, LANE))


def unpack_state(planes, C, meas_count=None):
    """[NSTATE, nsub, 128] -> receiver state dict for C channels."""
    p = np.asarray(planes).reshape(NSTATE, -1)[:, :C]
    hist_p = np.stack([np.stack([p[7 + 2 * k], p[8 + 2 * k]], -1)
                       for k in range(3)], 1)
    hist_c = np.stack([np.stack([p[13 + 2 * k], p[14 + 2 * k]], -1)
                       for k in range(3)], 1)
    return {
        "mu": jnp.asarray(p[0]), "phase": jnp.asarray(p[1]),
        "freqw": jnp.asarray(p[2]), "agc_gain": jnp.asarray(p[3]),
        "est_insp": jnp.asarray(p[4]), "est_sp": jnp.asarray(p[5]),
        "est_ep": jnp.asarray(p[6]),
        "hist_p": jnp.asarray(hist_p), "hist_c": jnp.asarray(hist_c),
        "meas_count": (meas_count if meas_count is not None
                       else jnp.zeros(C, jnp.int32)),
    }


@partial(jax.jit, static_argnames=("params", "sym_consts", "interpret"))
def demod_pallas(params: ReceiverParams, sym_consts, st_planes, x,
                 interpret=False):
    """Run the kernel over [C, nsamp+1, 2] float32 IQ (C <= 1024).

    sym_consts: static (tuple(re), tuple(im), tuple(phase)) floats —
    constellation points baked into the kernel (see sym_constants).

    Returns (new_state_planes [NSTATE,8,128], packed [nsamp, 8, 128] i32).
    nsamp must be a multiple of CHUNK.
    """
    C, n1, _ = x.shape
    nsamp = n1 - 1
    nT = nsamp // CHUNK
    assert nT * CHUNK == nsamp
    # Channel tiles: one (nsub, 128) plane per value. Small fleets use
    # nsub=1 (Mosaic pads the sublane dim in-register); padding to 8
    # would multiply every [nsamp, nsub, 128] HBM array by 8 for nothing.
    nsub = max(1, -(-C // LANE))
    cmax = nsub * LANE

    sym_re, sym_im, sym_phase = sym_consts
    xt = jnp.moveaxis(x, 0, 1)                      # [nsamp+1, C, 2]
    pad = cmax - C
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))
    xt = xt.reshape(n1, nsub, LANE, 2)
    x0re = xt[:-1, :, :, 0]
    x0im = xt[:-1, :, :, 1]
    # One lookahead sample per chunk: sample index (i+1)*CHUNK.
    xn = xt[CHUNK::CHUNK]                            # [nT, nsub, LANE, 2]
    xnre = xn[:, :, :, 0]
    xnim = xn[:, :, :, 1]

    kernel = partial(_demod_kernel, params, sym_re, sym_im, sym_phase, nsub)

    blk = lambda: pl.BlockSpec((CHUNK, nsub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    nblk = lambda: pl.BlockSpec((1, nsub, LANE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((NSTATE, nsub, LANE), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    st_out, packed = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=[blk(), blk(), nblk(), nblk(), st_spec],
        out_specs=[st_spec, blk()],
        out_shape=[
            jax.ShapeDtypeStruct((NSTATE, nsub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nsamp, nsub, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NSTATE, nsub, LANE), jnp.float32)],
        interpret=interpret,
    )(x0re, x0im, xnre, xnim, st_planes)
    return st_out, packed


def unpack_outputs(packed, C):
    """[nsamp, 8, 128] i32 -> (cost i16 [C,nsamp], sym u8, valid bool)."""
    p = np.asarray(packed).reshape(packed.shape[0], -1)[:, :C].T
    cost = (-(p & 0xFFFF)).astype(np.int16)
    sym = ((p >> 16) & 0xFF).astype(np.uint8)
    valid = (p >> 24) & 1
    return cost, sym, valid.astype(bool)


# ---------------------------------------------------------------------------
# Device-side output compaction: the raw [nsamp, nsub, 128] int32 output is
# large (and host links — especially the axon tunnel — are slow); symbols
# only need 3 bits (valid<<2 | symbol) for QPSK-class constellations, so we
# bit-pack 10 samples per int32 on device and slice to the used lanes
# before fetching. Costs (for --viterbi) pack 2 per int32.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nchan", "want_cost"))
def pack_outputs(packed: jnp.ndarray, nchan: int, want_cost: bool = False):
    nsamp = packed.shape[0]
    flat = packed.reshape(nsamp, -1)[:, :nchan]          # [nsamp, C]
    # 8 samples x 4 bits (one nibble each: valid<<2 | symbol) per int32 —
    # byte-aligned for a branch-free host unpack.
    n8 = nsamp // 8
    v3 = ((flat >> 24 & 1) << 2) | ((flat >> 16) & 3)
    v3 = v3.reshape(n8, 8, nchan)
    word = jnp.zeros((n8, nchan), jnp.int32)
    for k in range(8):
        word = word | (v3[:, k] << (4 * k))
    if not want_cost:
        return word, None
    cost = flat & 0xFFFF                                 # -cost, 16 bits
    c2 = cost[: (nsamp // 2) * 2].reshape(nsamp // 2, 2, nchan)
    cword = c2[:, 0] | (c2[:, 1] << 16)
    return word, cword


def unpack_sym3(word: np.ndarray, nsamp: int):
    """[n8, C] i32 (nibble-packed) -> (sym u8 [C, nsamp], valid bool)."""
    w = np.ascontiguousarray(np.asarray(word).astype("<i4"))
    n8, C = w.shape
    b = w.view(np.uint8).reshape(n8, C, 4)   # byte k = samples 2k, 2k+1
    v = np.empty((n8, C, 4, 2), np.uint8)
    v[..., 0] = b & 0xF
    v[..., 1] = b >> 4
    v3 = v.reshape(n8, C, 8).transpose(1, 0, 2).reshape(C, n8 * 8)
    return (v3 & 3), (v3 >> 2).astype(bool)


def unpack_cost(cword: np.ndarray):
    w = np.asarray(cword)
    c = np.empty((w.shape[1], w.shape[0] * 2), np.int16)
    c[:, 0::2] = (-(w & 0xFFFF)).astype(np.int16).T
    c[:, 1::2] = (-((w >> 16) & 0xFFFF)).astype(np.int16).T
    return c
