"""Multi-channel soft-decision Viterbi on device: a Pallas ACS kernel
batched over channels x sync replicas.

Re-designs viterbi_sync (reference dvb.h:1173-1416) TPU-first for the
K=7, bits_in=1 trellis (rate 1/2, the north-star configuration):

* The ACS butterfly is CONSTANT-GEOMETRY: new states j and j+32 share
  the same predecessor pair (2j, 2j+1) and differ only in the shifted-in
  uncoded bit (j >> 5), so one ACS step is pure sublane-pair arithmetic
  on [64, N] metric planes — no gathers, no scatters. Fleet channels and
  the 4 (conj x rot) sync replicas ride the 128-wide lane axis.

* Register-exchange paths (bitpath, viterbi.h:287-293) are one u32 plane
  (rate 1/2 traceback depth is 32, dvb.h:1180) updated by select+shift.

* Tie-breaking matches viterbi_dec exactly (viterbi.h:202-244): branch
  candidates are scanned [provided-with-metric, then branches in coded-
  symbol-ascending order] with '<=', so the LAST minimum wins; the best
  STATE scan uses '<' ascending, so the FIRST minimum wins — realized
  branch-free via a (metric*64 | state) packed key.

* The reference's resync_period time-multiplexing of the nsyncs replicas
  (dvb.h:1386-1394) becomes hypothesis parallelism: all 4 sync replicas
  advance every block (SURVEY 2.10 P6), and a strictly-greater
  discriminant election runs per P_SUB-block sub-block instead of per
  128-block chunk — same election rule, coarser cadence (documented
  deviation; elections are stable after lock).
"""

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import NSTATES, PATH_SPEC, make_trellis, make_sync_maps
from .deconv_device import deconv_append, DELTA_MAX

NSYNCS = 4          # nconj x nrot for QPSK-class constellations
P_SUB = 1024        # blocks per election sub-block (= kernel grid tile)
LANES = 128


@lru_cache(maxsize=None)
def _butterfly_tables(rate: str):
    """Static per-new-state branch tables for the constant-geometry ACS.

    For new state s' (0..63) the two incoming branches come from preds
    2j, 2j+1 with j = s' mod 32; returns, per output-half h (s' = j or
    j+32), the coded symbol of each branch and the cs-ascending scan
    order needed for exact tie parity:
      cs_even[h][j]  coded symbol of branch pred=2j   -> s'
      cs_odd[h][j]   coded symbol of branch pred=2j+1 -> s'
      swap[h][j]     True if the odd branch has the SMALLER cs (so it
                     comes first in the reference's rescan order)
    """
    t = make_trellis(rate)
    assert t.bits_in == 1, "device kernel supports bits_in=1 rates"
    cs_even = np.zeros((2, 32), np.int32)
    cs_odd = np.zeros((2, 32), np.int32)
    for h in range(2):
        for j in range(32):
            sp = j + 32 * h
            for k in range(2):          # branch from pred 2j+k
                pred = 2 * j + k
                cs = int(np.where(t.pred[sp] == pred)[0][0])
                (cs_even if k == 0 else cs_odd)[h, j] = cs
    swap = cs_odd < cs_even
    return (tuple(map(tuple, cs_even)), tuple(map(tuple, cs_odd)),
            tuple(map(tuple, swap)))


@lru_cache(maxsize=None)
def _butterfly_table_array(rate: str) -> np.ndarray:
    """The butterfly tables packed as a [32, 128] i32 kernel input
    (Pallas forbids captured array constants): column 2h+0/2h+1 =
    cs_even/cs_odd for half h, 4+h = swap, 6+h = state index."""
    cs_even, cs_odd, swap = _butterfly_tables(rate)
    tbl = np.zeros((32, LANES), np.int32)
    for h in range(2):
        tbl[:, 2 * h + 0] = cs_even[h]
        tbl[:, 2 * h + 1] = cs_odd[h]
        tbl[:, 4 + h] = np.array(swap[h], np.int32)
        tbl[:, 6 + h] = np.arange(32, dtype=np.int32) + 32 * h
    return tbl


def _acs_kernel(rate: str, cheap_q: bool,
                tbl_ref, cs_ref, cost_ref, m_in_ref, p_in_ref,
                m_out_ref, p_out_ref, us_ref, q_ref, scratch):
    """One grid step = one (128-lane slab, P_SUB-block sub-block) tile;
    the lane-slab axis is OUTER so the scratch planes stay resident
    across one slab's whole time sweep (Mosaic's tpu.strided_load needs
    a 128-wide base memref, hence the per-slab decomposition).

    scratch[:64] = metric planes (i32), scratch[64:128] = path planes
    (u32 bits in i32). cs/cost refs: [P_SUB, 128] i32. us/q out:
    [P_SUB, 128] i32 (decoded bit at traceback depth; per-block
    best2-best discriminant).
    """
    nbits, depth = PATH_SPEC[rate]
    shift = (depth - 1) * nbits
    i = pl.program_id(1)
    BIG = jnp.int32(1 << 30)

    @pl.when(i == 0)
    def _():
        scratch[0:64] = m_in_ref[...]
        scratch[64:128] = p_in_ref[...]

    cse = [tbl_ref[:, 2 * h + 0][:, None] for h in range(2)]  # [32,1]
    cso = [tbl_ref[:, 2 * h + 1][:, None] for h in range(2)]
    swp = [tbl_ref[:, 4 + h][:, None] for h in range(2)]
    sidx = [tbl_ref[:, 6 + h][:, None] for h in range(2)]

    def body(t, carry, want_q=True):
        # Metric/path planes live in the VMEM scratch ref: Mosaic
        # supports sublane-STRIDED LOADS from refs (tpu.strided_load)
        # but not strided slices of values, so the even/odd pred
        # deinterleave reads the ref directly and the butterfly writes
        # back the two contiguous halves.
        cs_b = cs_ref[t]                            # [n_lanes]
        c_b = cost_ref[t]

        me = scratch[0:64:2]                        # pred 2j    [32, N]
        mo = scratch[1:64:2]                        # pred 2j+1
        pe = scratch[64:128:2]
        po = scratch[65:128:2]

        halves_m = []
        halves_p = []
        halves_k = []
        best_key = None
        for h in range(2):
            bon_e = jnp.where(cse[h] == cs_b[None, :], c_b[None, :], 0)
            bon_o = jnp.where(cso[h] == cs_b[None, :], c_b[None, :], 0)
            Me = me + bon_e
            Mo = mo + bon_o
            new_m = jnp.minimum(Me, Mo)
            # Reference scan order [provided, cs-ascending branches],
            # '<=' last-min wins. k_match = branch whose cs was provided
            # (if neither matches, both bonuses are 0 and one of the
            # plain comparisons below always fires).
            first_is_odd = swp[h]                   # [32,1] 0/1
            m_first = jnp.where(first_is_odd == 1, mo, me)
            m_second = jnp.where(first_is_odd == 1, me, mo)
            k_match_odd = (cso[h] == cs_b[None, :]).astype(jnp.int32)
            sel_odd = jnp.where(
                m_second == new_m,
                1 - first_is_odd,
                jnp.where(m_first == new_m, first_is_odd, k_match_odd))
            new_p = ((jnp.where(sel_odd == 1, po, pe) << 1) | h)
            halves_m.append(new_m)
            halves_p.append(new_p)
            # Packed reduction key (metric, state, traceback bit): one
            # min finds the best state's metric AND its decoded bit —
            # (m, sidx) is unique per state so the low bit never breaks
            # the ordering. Normalized metrics stay < ~2M << 2^23, so
            # the <<7 cannot overflow i32.
            key = ((new_m * 64 + sidx[h]) << 1) | ((new_p >> shift) & 1)
            halves_k.append(key)
            kmin = jnp.min(key, axis=0, keepdims=True)   # [1, N]
            best_key = kmin if best_key is None else \
                jnp.minimum(best_key, kmin)

        best_m = best_key >> 7                      # arithmetic: floor
        us = best_key & 1
        if want_q:
            # Second-best state (for the election discriminant): min
            # over all states excluding the best, via one exclusion
            # pass.
            second = None
            for h in range(2):
                k2 = jnp.min(jnp.where(halves_k[h] == best_key, BIG,
                                       halves_k[h]),
                             axis=0, keepdims=True)
                second = k2 if second is None else jnp.minimum(second, k2)
            q_ref[t] = ((second >> 7) - best_m)[0]
        else:
            # TRACK mode needs no election — only the re-acquire
            # watchdog's quality sum — so the exclusion pass runs on a
            # 1-in-4 subsample (the caller rescales the sum by 4).
            q_ref[t] = jnp.zeros((LANES,), jnp.int32)

        scratch[0:32] = halves_m[0] - best_m
        scratch[32:64] = halves_m[1] - best_m
        scratch[64:96] = halves_p[0]
        scratch[96:128] = halves_p[1]
        us_ref[t] = us[0]
        return carry

    if cheap_q:
        def body4(i, carry):  # q on block 4i only; 4x unrolled
            carry = body(4 * i, carry, want_q=True)
            carry = body(4 * i + 1, carry, want_q=False)
            carry = body(4 * i + 2, carry, want_q=False)
            return body(4 * i + 3, carry, want_q=False)

        jax.lax.fori_loop(0, P_SUB // 4, body4, 0)
    else:
        def body2(i, carry):  # 2x unroll: halves loop/branch overhead
            carry = body(2 * i, carry)
            return body(2 * i + 1, carry)

        jax.lax.fori_loop(0, P_SUB // 2, body2, 0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        m_out_ref[...] = scratch[0:64]
        p_out_ref[...] = scratch[64:128]


@partial(jax.jit, static_argnames=("rate", "interpret", "cheap_q"))
def viterbi_acs(rate: str, metric, path, cs, cost, interpret=False,
                cheap_q=False):
    """Run the ACS kernel over T = E*P_SUB blocks.

    metric [64, N] i32, path [64, N] i32 (u32 bits), cs/cost [T, N] i32
    with N a multiple of 128 (channels x syncs on lanes).
    Returns (metric, path, us [T, N] i32 bits, q [T, N] i32). With
    cheap_q, q is computed for block indices 4i only (zeros elsewhere)
    — a 1-in-4 subsample for the TRACK watchdog.
    """
    T, N = cs.shape
    assert T % P_SUB == 0 and N % LANES == 0
    nT = T // P_SUB
    nG = N // LANES
    kernel = partial(_acs_kernel, rate, cheap_q)
    blk = pl.BlockSpec((P_SUB, LANES), lambda g, i: (i, g),
                       memory_space=pltpu.VMEM)
    st = pl.BlockSpec((64, LANES), lambda g, i: (0, g),
                      memory_space=pltpu.VMEM)
    tb = pl.BlockSpec((32, LANES), lambda g, i: (0, 0),
                      memory_space=pltpu.VMEM)
    m2, p2, us, q = pl.pallas_call(
        kernel,
        grid=(nG, nT),
        in_specs=[tb, blk, blk, st, st],
        out_specs=[st, st, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((64, N), jnp.int32),
            jax.ShapeDtypeStruct((64, N), jnp.int32),
            jax.ShapeDtypeStruct((T, N), jnp.int32),
            jax.ShapeDtypeStruct((T, N), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((128, LANES), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(_butterfly_table_array(rate)), cs, cost, metric, path)
    return m2, p2, us, q


# ---------------------------------------------------------------------------
# Fleet wrapper
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ViterbiPlan:
    """Static geometry for one (rate, nchan, chunk) configuration."""
    rate: str
    nchan: int
    nsamp: int
    nshifts: int
    E: int                  # sub-blocks per decode()
    cap: int                # symbol ring capacity
    store_costs: bool = True
    # nsyncs=1 is TRACK mode: only each channel's elected sync replica
    # runs (the TPU analogue of the reference's resync_period gating,
    # dvb.h:1241 — replicas cost lane slabs here instead of CPU time).
    nsyncs: int = NSYNCS
    # Replica structure for the all-rate XLA path (nshifts > 1 codes):
    nconj: int = 2
    nrot: int = 2

    @property
    def nblocks(self) -> int:
        return self.E * P_SUB

    @property
    def consumed(self) -> int:
        return self.nblocks * self.nshifts

    @property
    def needed(self) -> int:
        return self.consumed + self.nshifts - 1

    @property
    def nbytes(self) -> int:
        bits_in = make_trellis(self.rate).bits_in
        return self.nblocks * bits_in // 8

    @property
    def n_lanes(self) -> int:
        return -(-(self.nchan * self.nsyncs) // LANES) * LANES


@partial(jax.jit, static_argnames=("plan", "maps", "interpret"))
def viterbi_decode(plan: ViterbiPlan, state, maps, interpret=False):
    """Decode plan.nblocks FEC blocks from the ring front.

    Returns (new_state, bytes [C, nbytes] u8, discr [C, E] i32 for the
    elected sync, underflow [C] bool).
    """
    C, E, ns = plan.nchan, plan.E, plan.nshifts
    T = plan.nblocks
    bits_in = make_trellis(plan.rate).bits_in
    underflow = state["fill"] < plan.needed

    win_sym = state["buf"][:plan.needed]            # [needed, C] u8
    win_cost = state["cost"][:plan.needed].astype(jnp.int32)

    # Per-sync block inputs (dvb.h:1353-1363): block b of sync s reads
    # symbols [b*ns + shift_s, +ns), maps them, concatenates bits and
    # sums costs. QPSK-class: ns == 1, shift == 0 for all 4 syncs.
    cost_b = win_cost[:T]
    sym = win_sym[:T].astype(jnp.int32)
    nsym = len(maps[0])
    track = plan.nsyncs == 1
    if track:
        # Only the elected sync per channel: map selected by tsync.
        maps_arr = jnp.asarray(np.asarray(maps, np.int32))   # [4, nsym]
        msel = maps_arr[state["tsync"]]                      # [C, nsym]
        cs = jnp.zeros(sym.shape, jnp.int32)
        for v in range(nsym):
            cs = jnp.where(sym == v, msel[None, :, v], cs)   # [T, C]
        cost4 = cost_b
        ncols = C
    else:
        cs_list = []
        for s in range(NSYNCS):
            m = jnp.zeros(sym.shape, jnp.int32)
            for v in range(nsym):
                m = jnp.where(sym == v, np.int32(maps[s][v]), m)
            cs_list.append(m)
        cs = jnp.stack(cs_list, axis=2)                 # [T, C, 4]
        cost4 = jnp.broadcast_to(cost_b[:, :, None], cs.shape)
        ncols = C * NSYNCS

    pad = plan.n_lanes - ncols
    csf = cs.reshape(T, ncols)
    costf = cost4.reshape(T, ncols)
    if pad:
        csf = jnp.pad(csf, ((0, 0), (0, pad)))
        costf = jnp.pad(costf, ((0, 0), (0, pad)))

    m2, p2, us, q = viterbi_acs(plan.rate, state["metric"],
                                state["path"], csf, costf,
                                interpret=interpret, cheap_q=track)
    us = us[:, :ncols].reshape(T, C, plan.nsyncs)
    q = q[:, :ncols].reshape(T, C, plan.nsyncs)

    # Election: per-sub-block discriminant sums, strictly-greater switch
    # applied AFTER each sub-block (dvb.h:1380-1412; discr_delay skip of
    # the first 64/bits_in blocks approximated at sub-block starts).
    dd = 64 // bits_in
    qs = q.reshape(E, P_SUB, C, plan.nsyncs)
    qsum = qs[:, dd:].sum(axis=1)                   # [E, C, nsyncs]

    if track:
        cur_out = state["current"]
        bits = us.reshape(T, C).T.astype(jnp.uint8)
        # cheap_q subsampled 1-in-4 blocks; rescale to full-sum units
        # so the watchdog threshold (entered from ACQUIRE) still holds.
        dsel = 4 * qsum[:, :, 0].T                  # [C, E]
    else:
        def elect(cur, qk):
            best = jnp.argmax(qk, axis=1).astype(jnp.int32)    # [C]
            bv = jnp.take_along_axis(qk, best[:, None], axis=1)[:, 0]
            cv = jnp.take_along_axis(qk, cur[:, None], axis=1)[:, 0]
            new = jnp.where(bv > cv, best, cur)
            return new, cur                          # emit pre-update

        cur_out, elected = jax.lax.scan(elect, state["current"], qsum)
        # elected [E, C]: sync whose bits are emitted per sub-block.
        use = us.reshape(E, P_SUB, C, NSYNCS)
        sel = jnp.take_along_axis(
            use, elected[:, None, :, None], axis=3)[:, :, :, 0]
        bits = sel.reshape(T, C).T.astype(jnp.uint8)   # [C, T]
        dsel = jnp.take_along_axis(
            qsum, elected[:, :, None], axis=2)[:, :, 0].T  # [C, E]
    w = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))
    by = jnp.sum(bits.reshape(C, T // 8, 8) * w, axis=2,
                 dtype=jnp.int32).astype(jnp.uint8)
    # The fleet's elected sync indices ride in the last discr column so
    # the host observes elections without an extra fetch.
    dsel = jnp.concatenate(
        [dsel, (state["tsync"] if track else cur_out)[:, None]], axis=1)

    Sc = plan.consumed
    buf = jnp.concatenate(
        [state["buf"][Sc:], jnp.zeros((Sc, C), jnp.uint8)], axis=0)
    cbuf = jnp.concatenate(
        [state["cost"][Sc:], jnp.zeros((Sc, C), jnp.int16)], axis=0)
    new = dict(state, buf=buf, cost=cbuf,
               fill=jnp.maximum(state["fill"] - Sc, 0),
               metric=m2, path=p2, current=cur_out)
    return new, by, dsel, underflow


def _punctured_block_inputs(plan: ViterbiPlan, maps, win_sym, win_cost):
    """Per-replica trellis-block inputs for the punctured rates
    (dvb.h:1353-1363): block b of sync s = shift*M + map reads symbols
    [b*ns + shift, +ns), maps them, concatenates label bits and sums
    costs. Returns (cs [T, C, nsyncs] i32, cost [T, C, nsyncs] i32)."""
    t = make_trellis(plan.rate)
    bps = t.bits_out // plan.nshifts
    C, ns = plan.nchan, plan.nshifts
    T = plan.nblocks
    M = plan.nconj * plan.nrot
    nsym = len(maps[0])
    maps_arr = np.asarray(maps, np.int32)                    # [M, nsym]
    cs_parts, cost_parts = [], []
    msyms = []
    for m in range(M):
        ms = jnp.zeros(win_sym.shape, jnp.int32)
        for v in range(nsym):
            ms = jnp.where(win_sym == v, np.int32(maps_arr[m, v]), ms)
        msyms.append(ms)
    for sh in range(ns):
        for m in range(M):
            cs_b = jnp.zeros((T, C), jnp.int32)
            cost_b = jnp.zeros((T, C), jnp.int32)
            for i in range(ns):
                o = sh + i
                lim = o + (T - 1) * ns + 1
                sl = jax.lax.slice(msyms[m], (o, 0), (lim, C), (ns, 1))
                cl = jax.lax.slice(win_cost, (o, 0), (lim, C), (ns, 1))
                cs_b = (cs_b << bps) | sl
                cost_b = cost_b + cl
            cs_parts.append(cs_b)
            cost_parts.append(cost_b)
    return (jnp.stack(cs_parts, axis=2), jnp.stack(cost_parts, axis=2))


def _punctured_block_inputs_tracked(plan: ViterbiPlan, maps, win_sym,
                                    win_cost, tsync):
    """TRACK-mode block inputs: only each channel's ELECTED sync replica
    (tsync = shift*M + map) is materialized — the all-replica
    [T, C, nsyncs] stacks of _punctured_block_inputs cost nsyncs x the
    memory traffic to keep 1/nsyncs of the data. Returns
    (cs [T, C] i32, cost [T, C] i32)."""
    t = make_trellis(plan.rate)
    bps = t.bits_out // plan.nshifts
    C, ns = plan.nchan, plan.nshifts
    T = plan.nblocks
    M = plan.nconj * plan.nrot
    nsym = len(maps[0])
    maps_arr = np.asarray(maps, np.int32)
    mc = (tsync % M)[None, :]                                # [1, C]
    sc = (tsync // M)[None, :]
    # Per-channel map application: select the elected map's remap of
    # each hard symbol (M wheres instead of M full remapped copies
    # sliced ns times each).
    msel = jnp.zeros(win_sym.shape, jnp.int32)
    for m in range(M):
        ms = jnp.zeros(win_sym.shape, jnp.int32)
        for v in range(nsym):
            ms = jnp.where(win_sym == v, np.int32(maps_arr[m, v]), ms)
        msel = jnp.where(mc == m, ms, msel)
    cs = jnp.zeros((T, C), jnp.int32)
    cost = jnp.zeros((T, C), jnp.int32)
    for sh in range(ns):
        cs_b = jnp.zeros((T, C), jnp.int32)
        cost_b = jnp.zeros((T, C), jnp.int32)
        for i in range(ns):
            o = sh + i
            lim = o + (T - 1) * ns + 1
            sl = jax.lax.slice(msel, (o, 0), (lim, C), (ns, 1))
            cl = jax.lax.slice(win_cost, (o, 0), (lim, C), (ns, 1))
            cs_b = (cs_b << bps) | sl
            cost_b = cost_b + cl
        sel = sc == sh
        cs = jnp.where(sel, cs_b, cs)
        cost = jnp.where(sel, cost_b, cost)
    return cs, cost


@partial(jax.jit, static_argnames=("plan", "maps", "interpret"))
def viterbi_decode_banked(plan: ViterbiPlan, state, maps,
                          interpret=False):
    """Punctured-rate fleet decode on the banked Pallas ACS
    (fec/viterbi_banked.py) — the TPU hot path for rates with
    nshifts > 1 (3/4, 7/8, 5/6, 4/6, 2/3 as 4/6).

    State planes are STORED-row-major [64, n_lanes] (lane = c*nsyncs+s,
    sublane = the banked storage permutation of the trellis state).
    plan.nsyncs == 1 selects TRACK mode: only each channel's elected
    sync replica advances (map + symbol shift chosen per channel from
    state["tsync"]), with the 1-in-4 subsampled discriminant.

    Returns (new_state, bytes [C, nbytes] u8, discr [C, E+1] i32,
    underflow [C] bool).
    """
    from .viterbi_banked import viterbi_acs_banked
    t = make_trellis(plan.rate)
    bits_in = t.bits_in
    C, E, ns = plan.nchan, plan.E, plan.nshifts
    T = plan.nblocks
    track = plan.nsyncs == 1
    underflow = state["fill"] < plan.needed
    win_sym = state["buf"][:plan.needed].astype(jnp.int32)   # [need, C]
    win_cost = state["cost"][:plan.needed].astype(jnp.int32)

    if track:
        cs, cost = _punctured_block_inputs_tracked(
            plan, maps, win_sym, win_cost, state["tsync"])
        ncols = C
    else:
        cs_a, cost_a = _punctured_block_inputs(plan, maps, win_sym,
                                               win_cost)
        cs = cs_a.reshape(T, C * plan.nsyncs)
        cost = cost_a.reshape(T, C * plan.nsyncs)
        ncols = C * plan.nsyncs

    # Pred-on-lanes for rate 7/8 when the fleet leaves lanes idle
    # (B=7 is the one all-pred trellis; its 64-row pred sweep dominates
    # otherwise). slot = next pow2 of the used columns; channels are
    # tiled across 128/slot lane-groups and the kernel splits the
    # predecessors across the groups.
    from .viterbi_banked import LANES as VB_LANES
    geo_b7 = bits_in == 7
    slot = 1 << max(0, (ncols - 1)).bit_length()
    # B=7 lane-surplus strategies (both need the single-slab shape):
    #  * slot <= 16: pred-on-lanes grouping (>= 8 groups amortize the
    #    butterfly; 4.3x at 16-ch fleets, docs/PERF.md);
    #  * slot == 64 (33..64 channels): ROW-SPLIT — states across the
    #    two lane-halves, half-height candidate planes (2 groups do
    #    not pay for the butterfly, measured on v5e).
    groups = (min(8, VB_LANES // slot)
              if geo_b7 and plan.n_lanes == VB_LANES and slot <= 16
              else 1)
    rowsplit = (geo_b7 and plan.n_lanes == VB_LANES
                and groups == 1 and slot <= 64)
    tiled = groups > 1 or rowsplit
    m_in, h_in, l_in = (state["metric"], state["path_hi"],
                        state["path_lo"])
    if tiled:
        reps = groups if groups > 1 else 2
        tslot = slot if groups > 1 else 64

        def tile(a, fill=0):
            a = jnp.pad(a, ((0, 0), (0, tslot - a.shape[1])),
                        constant_values=fill)
            a = jnp.tile(a, (1, reps))
            return jnp.pad(
                a, ((0, 0), (0, VB_LANES - a.shape[1])),
                constant_values=fill)
        cs = tile(cs[:, :ncols])
        cost = tile(cost[:, :ncols])
        m_in = tile(m_in[:, :ncols])
        h_in = tile(h_in[:, :ncols])
        l_in = tile(l_in[:, :ncols])
    else:
        pad = plan.n_lanes - ncols
        if pad:
            cs = jnp.pad(cs, ((0, 0), (0, pad)))
            cost = jnp.pad(cost, ((0, 0), (0, pad)))
    # cheap_q (the rate-1/2 kernel's 1-in-4 TRACK subsample) is NOT
    # faster for the banked kernel, so TRACK keeps the full per-block
    # discriminant — no cadence approximation for punctured rates.
    m2, h2, l2, us, q = viterbi_acs_banked(
        plan.rate, m_in, h_in, l_in,
        cs, cost, interpret=interpret, cheap_q=False, groups=groups,
        rowsplit=rowsplit)
    if tiled:
        # All groups/halves are identical; keep slot 0 in the planes.
        def detile(a):
            return jnp.pad(a[:, :slot],
                           ((0, 0), (0, plan.n_lanes - slot)))
        m2, h2, l2 = detile(m2), detile(h2), detile(l2)
    us = us[:, :ncols].reshape(T, C, plan.nsyncs)
    q = q[:, :ncols].reshape(T, C, plan.nsyncs)

    dd = 64 // bits_in
    qs = q.reshape(E, P_SUB, C, plan.nsyncs)
    qsum = qs[:, dd:].sum(axis=1)                            # [E, C, ns]

    if track:
        cur_out = state["current"]
        blocks = us.reshape(T, C).T                          # [C, T]
        dsel = qsum[:, :, 0].T                               # [C, E]
    else:
        def elect(cur, qk):
            best = jnp.argmax(qk, axis=1).astype(jnp.int32)
            bv = jnp.take_along_axis(qk, best[:, None], axis=1)[:, 0]
            cv = jnp.take_along_axis(qk, cur[:, None], axis=1)[:, 0]
            return jnp.where(bv > cv, best, cur), cur

        cur_out, elected = jax.lax.scan(elect, state["current"], qsum)
        use = us.reshape(E, P_SUB, C, plan.nsyncs)
        sel = jnp.take_along_axis(
            use, elected[:, None, :, None], axis=3)[:, :, :, 0]
        blocks = sel.reshape(T, C).transpose(1, 0)           # [C, T]
        dsel = jnp.take_along_axis(
            qsum, elected[:, :, None], axis=2)[:, :, 0].T    # [C, E]
    shifts = jnp.asarray(
        np.arange(bits_in - 1, -1, -1, dtype=np.int32))
    bits = ((blocks[:, :, None] >> shifts) & 1).reshape(
        C, T * bits_in).astype(jnp.uint8)
    w = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))
    by = jnp.sum(bits.reshape(C, T * bits_in // 8, 8) * w, axis=2,
                 dtype=jnp.int32).astype(jnp.uint8)
    dsel = jnp.concatenate(
        [dsel, (state["tsync"] if track else cur_out)[:, None]], axis=1)

    Sc = plan.consumed
    buf = jnp.concatenate(
        [state["buf"][Sc:], jnp.zeros((Sc, C), jnp.uint8)], axis=0)
    cbuf = jnp.concatenate(
        [state["cost"][Sc:], jnp.zeros((Sc, C), jnp.int16)], axis=0)
    new = dict(state, buf=buf, cost=cbuf,
               fill=jnp.maximum(state["fill"] - Sc, 0),
               metric=m2, path_hi=h2, path_lo=l2, current=cur_out)
    return new, by, dsel, underflow


@partial(jax.jit, static_argnames=("plan", "maps"))
def viterbi_decode_xla(plan: ViterbiPlan, state, maps):
    """All-rate fleet decode: the batched XLA-scan ACS over S = C *
    nsyncs replica lanes (reuses fec/viterbi._viterbi_chunk_device,
    which supports every DVB-S rate via the dense trellis gathers).

    Used when the Pallas bank's constant-geometry butterfly does not
    apply (punctured rates: nshifts > 1, viterbi_sync dvb.h:1179-1212).
    Slower than the rate-1/2 bank but device-resident and exact.

    Returns (new_state, bytes [C, nbytes] u8, discr [C, E+1] i32 with
    the elected sync in the last column, underflow [C] bool).
    """
    from .viterbi import _viterbi_chunk_device
    t = make_trellis(plan.rate)
    bits_in = t.bits_in
    bps = t.bits_out // plan.nshifts
    C, E, ns = plan.nchan, plan.E, plan.nshifts
    T = plan.nblocks
    M = plan.nconj * plan.nrot
    nsyncs = M * ns
    S = C * nsyncs
    underflow = state["fill"] < plan.needed

    win_sym = state["buf"][:plan.needed].astype(jnp.int32)   # [need, C]
    win_cost = state["cost"][:plan.needed].astype(jnp.int32)

    cs_all, cost_all = _punctured_block_inputs(
        plan, maps, win_sym, win_cost)
    cs_all = cs_all.reshape(T, S)                            # [T, S]
    cost_all = cost_all.reshape(T, S)

    cst, phi, plo, us, q = _viterbi_chunk_device(
        plan.rate, state["metric"], state["path_hi"], state["path_lo"],
        cs_all.T, cost_all.T)
    us = us.T.reshape(T, C, nsyncs)                          # [T, C, ns]
    q = q.T.reshape(T, C, nsyncs)

    # Election per P_SUB sub-block (same rule as viterbi_decode).
    dd = 64 // bits_in
    qs = q.reshape(E, P_SUB, C, nsyncs)
    qsum = qs[:, dd:].sum(axis=1)                            # [E, C, S]

    def elect(cur, qk):
        best = jnp.argmax(qk, axis=1).astype(jnp.int32)
        bv = jnp.take_along_axis(qk, best[:, None], axis=1)[:, 0]
        cv = jnp.take_along_axis(qk, cur[:, None], axis=1)[:, 0]
        return jnp.where(bv > cv, best, cur), cur

    cur_out, elected = jax.lax.scan(elect, state["current"], qsum)
    use = us.reshape(E, P_SUB, C, nsyncs)
    sel = jnp.take_along_axis(
        use, elected[:, None, :, None], axis=3)[:, :, :, 0]  # [E,P,C]
    blocks = sel.reshape(T, C).transpose(1, 0)               # [C, T]
    # Expand bits_in bits per block (MSB first), pack to bytes.
    shifts = jnp.asarray(
        np.arange(bits_in - 1, -1, -1, dtype=np.int32))
    bits = ((blocks[:, :, None] >> shifts) & 1).reshape(
        C, T * bits_in).astype(jnp.uint8)
    w = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))
    by = jnp.sum(bits.reshape(C, T * bits_in // 8, 8) * w, axis=2,
                 dtype=jnp.int32).astype(jnp.uint8)
    dsel = jnp.take_along_axis(
        qsum, elected[:, :, None], axis=2)[:, :, 0].T        # [C, E]
    dsel = jnp.concatenate([dsel, cur_out[:, None]], axis=1)

    Sc = plan.consumed
    buf = jnp.concatenate(
        [state["buf"][Sc:], jnp.zeros((Sc, C), jnp.uint8)], axis=0)
    cbuf = jnp.concatenate(
        [state["cost"][Sc:], jnp.zeros((Sc, C), jnp.int16)], axis=0)
    new = dict(state, buf=buf, cost=cbuf,
               fill=jnp.maximum(state["fill"] - Sc, 0),
               metric=cst, path_hi=phi, path_lo=plo, current=cur_out)
    return new, by, dsel, underflow


@partial(jax.jit, static_argnames=("C", "nsyncs", "n_trk"))
def _banked_to_track(plane, current, C: int, nsyncs: int, n_trk: int):
    """Keep each channel's elected sync replica lane (banked layout:
    lane = c*nsyncs + s, planes [64, N])."""
    cols = jnp.arange(C, dtype=jnp.int32) * nsyncs + current
    return jnp.zeros((64, n_trk), plane.dtype).at[:, :C].set(
        plane[:, cols])


@partial(jax.jit, static_argnames=("C", "nsyncs", "n_acq"))
def _banked_to_acquire(plane, C: int, nsyncs: int, n_acq: int):
    """Seed all replicas from the tracked lane (they diverge within one
    traceback depth, like the reference's fresh replicas)."""
    return jnp.zeros((64, n_acq), plane.dtype).at[:, :C * nsyncs].set(
        jnp.repeat(plane[:, :C], nsyncs, axis=1))


@partial(jax.jit, static_argnames=("C", "n_trk"))
def _planes_to_track(metric, path, current, C: int, n_trk: int):
    """Keep only each channel's elected sync replica's trellis state."""
    cols = jnp.arange(C, dtype=jnp.int32) * NSYNCS + current
    m = jnp.zeros((64, n_trk), metric.dtype).at[:, :C].set(
        metric[:, cols])
    p = jnp.zeros((64, n_trk), path.dtype).at[:, :C].set(path[:, cols])
    return m, p


@partial(jax.jit, static_argnames=("C", "n_acq"))
def _planes_to_acquire(metric, path, C: int, n_acq: int):
    """Seed all 4 replicas from the tracked trellis state (they diverge
    within one traceback depth, like the reference's fresh replicas)."""
    m = jnp.zeros((64, n_acq), metric.dtype).at[:, :C * NSYNCS].set(
        jnp.repeat(metric[:, :C], NSYNCS, axis=1))
    p = jnp.zeros((64, n_acq), path.dtype).at[:, :C * NSYNCS].set(
        jnp.repeat(path[:, :C], NSYNCS, axis=1))
    return m, p


class MultiViterbiSync:
    """N-channel viterbi_sync: symbol+cost ring -> Pallas ACS over all
    sync replicas -> elected bit stream, packed to bytes on device.

    Same streaming interface as DeviceDeconvolver (append / decode /
    fill bookkeeping), so MultiDvbsReceiver uses either interchangeably.
    `fastlock` is accepted for interface parity: replicas are always-on
    (hypothesis parallelism), so both modes use the same election — the
    non-fastlock resync_period gating exists in the reference purely to
    save CPU (dvb.h:1241).
    """

    def __init__(self, cstln, rate: str, nchan: int, nsamp: int,
                 omega: float, fastlock: bool = True,
                 interpret: bool | None = None,
                 banked: bool | None = None):
        maps, nconj, nrot, nshifts = make_sync_maps(cstln, rate)
        self.maps = tuple(tuple(int(v) for v in row) for row in maps)
        # nshifts=1, 4-sync codes (QPSK rate 1/2, the north-star config)
        # use the Pallas constant-geometry ACS bank. Punctured rates
        # (puncturing expanded into the trellis with nshifts
        # symbol-offset replicas, dvb.h:1179-1212) use the BANKED
        # Pallas ACS (fec/viterbi_banked.py) on TPU; on CPU they fall
        # back to the exact XLA-scan ACS (viterbi_decode_xla) because
        # the Pallas interpreter is orders of magnitude slower.
        punctured = not (nconj * nrot == NSYNCS and nshifts == 1)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        if banked is None:
            banked = not interpret
        self.banked = punctured and banked
        self.xla = punctured and not self.banked
        prod = int(nsamp / omega)
        E = max(1, prod // (P_SUB * nshifts))
        cap = E * P_SUB * nshifts + prod + nsamp + DELTA_MAX + 8192
        nsyncs = nconj * nrot * nshifts
        self.plan = ViterbiPlan(rate, nchan, nsamp, nshifts, E, cap,
                                nsyncs=nsyncs, nconj=nconj, nrot=nrot)
        self.plan_track = ViterbiPlan(rate, nchan, nsamp, nshifts, E,
                                      cap, nsyncs=1, nconj=nconj,
                                      nrot=nrot)
        self.interpret = interpret
        C = nchan
        self.state = {
            "buf": jnp.zeros((cap, C), jnp.uint8),
            "cost": jnp.zeros((cap, C), jnp.int16),
            "fill": jnp.zeros(C, jnp.int32),
            "current": jnp.zeros(C, jnp.int32),
            "tsync": jnp.zeros(C, jnp.int32),
        }
        if self.xla:
            S = C * nsyncs
            self.state.update(
                metric=jnp.zeros((S, 64), jnp.int32),
                path_hi=jnp.zeros((S, 64), jnp.uint32),
                path_lo=jnp.zeros((S, 64), jnp.uint32))
        elif self.banked:
            N = self.plan.n_lanes
            self.state.update(
                metric=jnp.zeros((64, N), jnp.int32),
                path_hi=jnp.zeros((64, N), jnp.int32),
                path_lo=jnp.zeros((64, N), jnp.int32))
        else:
            N = self.plan.n_lanes
            self.state.update(
                metric=jnp.zeros((64, N), jnp.int32),
                path=jnp.zeros((64, N), jnp.int32))
        self._est_fill = 0
        # TRACK-mode policy (host side, fed by observe() from the
        # fetched discriminants — one chunk of lag, no extra round
        # trip): enter after `track_after` consecutive decodes with a
        # fleet-wide stable election; leave when any channel's tracked
        # discriminant falls below HALF its entry level (a persistent
        # polarity flip leaves the single-replica discriminant at
        # ~0.35-0.45 of the locked level — measured in
        # tests/test_election_stress.py — so 0.25 would ride through
        # it decoding garbage). Belt-and-braces: every `probe_period`
        # TRACK decodes, re-acquire for one election round — the TPU
        # analogue of the reference's periodic resync (dvb.h:1386-1394),
        # which compares all replicas no matter what the tracked
        # discriminant says. Steady-state cost: ~3/(probe_period+3)
        # of decodes run all-replica lanes.
        self.track = False
        self.track_after = 2
        self.probe_period = 32
        self._track_decodes = 0
        self._want_track = False
        self._last_cur = None
        self._stable = 0
        self._entry_d = None

    def append(self, sym, valid, cost):
        assert cost is not None, "viterbi needs demod costs"
        self.state = deconv_append(self.plan, self.state, sym, valid,
                                   cost)

    def note_production(self, nsyms_min: int):
        self._est_fill += nsyms_min

    def sync_fill(self, fill: np.ndarray):
        self._est_fill = int(fill.min())

    def can_decode(self) -> bool:
        return self._est_fill >= self.plan.needed

    def apply_pending_transition(self):
        """Apply a pending ACQUIRE<->TRACK switch to the trellis planes
        (requested by observe() between chunks)."""
        if self.xla or self._want_track == self.track:
            return
        C = self.plan.nchan
        st = self.state
        nsyncs = self.plan.nsyncs
        if self.banked:
            if self._want_track:
                m, h, lo = (_banked_to_track(
                    st[k], st["current"], C, nsyncs,
                    self.plan_track.n_lanes)
                    for k in ("metric", "path_hi", "path_lo"))
                self.state = dict(st, metric=m, path_hi=h, path_lo=lo,
                                  tsync=st["current"])
            else:
                m, h, lo = (_banked_to_acquire(
                    st[k], C, nsyncs, self.plan.n_lanes)
                    for k in ("metric", "path_hi", "path_lo"))
                self.state = dict(st, metric=m, path_hi=h, path_lo=lo,
                                  current=st["tsync"])
        elif self._want_track:
            m, p = _planes_to_track(st["metric"], st["path"],
                                    st["current"], C,
                                    self.plan_track.n_lanes)
            self.state = dict(st, metric=m, path=p, tsync=st["current"])
        else:
            m, p = _planes_to_acquire(st["metric"], st["path"], C,
                                      self.plan.n_lanes)
            self.state = dict(st, metric=m, path=p, current=st["tsync"])
        self.track = self._want_track

    def decode(self):
        self.apply_pending_transition()
        plan = self.plan_dec
        if self.xla:
            self.state, by, discr, under = viterbi_decode_xla(
                plan, self.state, self.maps)
        elif self.banked:
            self.state, by, discr, under = viterbi_decode_banked(
                plan, self.state, self.maps, interpret=self.interpret)
        else:
            self.state, by, discr, under = viterbi_decode(
                plan, self.state, self.maps, interpret=self.interpret)
        self._est_fill -= plan.consumed
        return by, discr, under

    # -- fused-dispatch interface (pipelines/multi_rx._fused_chunk) ------
    @property
    def kind(self):
        return ("viterbi_xla" if self.xla
                else "viterbi_banked" if self.banked else "viterbi")

    @property
    def plan_dec(self):
        return (self.plan if self.xla
                else self.plan_track if self.track else self.plan)

    def schedule_decode(self) -> int:
        """Bookkeeping-only equivalent of `while can_decode(): decode`."""
        k = 0
        while self.can_decode():
            self._est_fill -= self.plan_dec.consumed
            k += 1
        return k

    def observe(self, discr: np.ndarray, under: np.ndarray):
        """Host feedback from a fetched decode: discr [C, E+1] i32 with
        the elected sync index in the last column. Drives the
        ACQUIRE<->TRACK transition (see __init__)."""
        if under.any() or self.xla:     # XLA path has no TRACK mode
            return
        cur = discr[:, -1]
        d = discr[:, :-1].mean(axis=1)
        if self.track or self._want_track:
            self._track_decodes += 1
            collapse = (d < 0.5 * self._entry_d).any()
            probe = self._track_decodes >= self.probe_period
            if collapse or probe:
                self._want_track = False
                self._stable = 0
                self._last_cur = None
                self._track_decodes = 0
        else:
            if self._last_cur is not None and (cur == self._last_cur).all():
                self._stable += 1
            else:
                self._stable = 0
            self._last_cur = cur.copy()
            if self._stable >= self.track_after and (d > 0).all():
                self._want_track = True
                self._entry_d = d.copy()
