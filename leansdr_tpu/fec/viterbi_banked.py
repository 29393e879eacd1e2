"""Banked Pallas ACS for the punctured DVB-S rates (bits_in > 1).

Re-designs viterbi_sync's punctured-rate decoding (reference
dvb.h:1179-1212: puncturing expanded into the trellis, 2^bits_in
branches per state, nshifts symbol-offset replicas) as a TPU
constant-geometry kernel, replacing the scan-step-bound XLA path
(fec/viterbi_device.viterbi_decode_xla) on the hot path.

Geometry (verified at import for every rate):

* bits_in = B <= 5: the predecessors of new state s' are the CONTIGUOUS
  block [ (s' mod G)*K, +K ) with K = 2^B, G = 64/K, and the uncoded
  symbol is a function of s' alone. Metric planes are stored under the
  mixed-radix digit swap rho(s) = (s mod G)*K + (s div G), which makes
  each bank's K outputs a CONTIGUOUS row block while its K predecessor
  rows are static single-row reads -- no gathers anywhere.

* bits_in = 7 (rate 7/8): every state connects to every state (64 preds
  x 2 coded symbols per edge). The plain-branch candidate per pred
  collapses to its larger coded symbol (the reference's last-min '<='
  over cs-ascending branches prefers the larger cs on metric ties), so
  one pass over the 64 predecessor rows covers all 128 branches.

Tie-breaking matches viterbi_dec exactly (viterbi.h:202-244): candidate
keys pack (metric << RB) | rank with rank = NCS-1-cs for plain branches
and NCS for the provided-with-metric branch, so a single min reduction
realizes "provided first, then branches cs-ascending, last minimum
wins". The best-state scan packs (metric << 6) | state ('<' ascending,
FIRST minimum wins). Path registers are 64-bit register-exchange words
(bitpath, viterbi.h:287-293) split over two i32 planes.
"""

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import NSTATES, PATH_SPEC, make_trellis

LANES = 128
P_SUB = 1024


@dataclass(frozen=True)
class BankGeometry:
    rate: str
    B: int                    # bits_in
    K: int                    # 2^B branches per state
    G: int                    # number of banks (64/K), 1 for B=7
    ncs: int                  # 2^bits_out
    rank_bits: int            # bits needed for rank in the packed key
    rho: np.ndarray           # [64] state -> stored row
    orig: np.ndarray          # [64] stored row -> state
    pred_row: np.ndarray      # [G, K] stored row of pred k of bank g
    # Static per-output-row columns (j indexes the bank's output rows,
    # i.e. stored rows g*K+j):
    cs: np.ndarray            # [G, K, K]  cs[g,k,j]: plain branch cs
    us: np.ndarray            # [G, K]     us[g,j] uncoded symbol of s'
    # 7/8 only (G == 1): second coded symbol + per-branch us
    cs2: np.ndarray | None    # [1, K2, 64] smaller cs per pred (B=7)
    us_hi: np.ndarray | None  # [1, K2, 64] us of larger-cs branch
    us_lo: np.ndarray | None  # [1, K2, 64] us of smaller-cs branch


@lru_cache(maxsize=None)
def bank_geometry(rate: str) -> BankGeometry:
    t = make_trellis(rate)
    B, ncs = t.bits_in, t.ncs
    rank_bits = int(np.ceil(np.log2(ncs + 1)))
    if B <= 5:
        K, G = 1 << B, NSTATES >> B
        rho = np.array([(s % G) * K + (s // G) for s in range(NSTATES)],
                       np.int32)
        orig = np.argsort(rho).astype(np.int32)
        pred_row = np.zeros((G, K), np.int32)
        cs = np.zeros((G, K, K), np.int32)
        us = np.zeros((G, K), np.int32)
        for g in range(G):
            for k in range(K):
                pred_row[g, k] = rho[g * K + k]
            for j in range(K):
                sp = j * G + g
                assert len(set(t.in_us[sp])) == 1
                # Coded symbols are distinct across the K branches into
                # a state: packed candidate keys are then UNIQUE per
                # (row, lane), so the kernel's order-free strict-<
                # running min reproduces the reference scan exactly.
                assert len(set(t.in_cs[sp])) == K, (rate, sp)
                us[g, j] = t.in_us[sp][0]
                for k in range(K):
                    p = g * K + k
                    hit = np.where(t.in_pred[sp] == p)[0]
                    assert len(hit) == 1
                    cs[g, k, j] = t.in_cs[sp][hit[0]]
        return BankGeometry(rate, B, K, G, ncs, rank_bits, rho, orig,
                            pred_row, cs, us, None, None, None)
    assert B == 7, rate
    # 7/8: one bank; k iterates the 64 predecessors; each (pred, state)
    # pair carries two branches (two coded symbols).
    K2 = NSTATES
    rho = np.arange(NSTATES, dtype=np.int32)
    pred_row = np.arange(NSTATES, dtype=np.int32).reshape(1, K2)
    cs_hi = np.zeros((1, K2, NSTATES), np.int32)
    cs_lo = np.zeros((1, K2, NSTATES), np.int32)
    us_hi = np.zeros((1, K2, NSTATES), np.int32)
    us_lo = np.zeros((1, K2, NSTATES), np.int32)
    us = np.zeros((1, NSTATES), np.int32)   # unused for B=7
    for sp in range(NSTATES):
        per = {}
        for i in range(t.nus):
            per.setdefault(int(t.in_pred[sp][i]), []).append(
                (int(t.in_cs[sp][i]), int(t.in_us[sp][i])))
        for p, v in per.items():
            assert len(v) == 2
            (c0, u0), (c1, u1) = sorted(v)
            cs_lo[0, p, sp], us_lo[0, p, sp] = c0, u0
            cs_hi[0, p, sp], us_hi[0, p, sp] = c1, u1
    return BankGeometry(rate, B, K2, 1, ncs, rank_bits, rho, rho,
                        pred_row, cs_hi, us, cs_lo, us_hi, us_lo)


# ---------------------------------------------------------------------------
# NumPy model (bit-exact vs ViterbiBank; the kernel mirrors this)
# ---------------------------------------------------------------------------

def acs_block_np(geo: BankGeometry, m, hi, lo, cs_b, c_b):
    """One trellis block over stored planes m/hi/lo [64, N] (i64 model).

    cs_b/c_b: [N] i64. Returns (m', hi', lo', us_out [N], q [N]).
    """
    nbits, depth = PATH_SPEC[geo.rate]
    N = m.shape[1]
    BIG = np.int64(1) << 40
    RB = geo.rank_bits
    new_m = np.zeros_like(m)
    new_hi = np.zeros_like(hi)
    new_lo = np.zeros_like(lo)
    for g in range(geo.G):
        plain_min = np.full((geo.K if geo.B <= 5 else NSTATES, N), BIG)
        prov_min = np.full_like(plain_min, BIG)
        nrows = plain_min.shape[0]
        for k in range(geo.K):
            mk = m[geo.pred_row[g, k]][None, :]          # [1, N]
            csk = geo.cs[g, k][:, None]                   # [rows, 1]
            plain = (mk << RB) | (geo.ncs - 1 - csk)
            plain_min = np.minimum(plain_min, plain)
            match = csk == cs_b[None, :]
            prov = np.where(match, ((mk + c_b[None, :]) << RB) | geo.ncs,
                            BIG)
            if geo.cs2 is not None:
                cs2k = geo.cs2[g, k][:, None]
                plain2 = (mk << RB) | (geo.ncs - 1 - cs2k)
                plain_min = np.minimum(plain_min, plain2)
                prov2 = np.where(cs2k == cs_b[None, :],
                                 ((mk + c_b[None, :]) << RB) | geo.ncs,
                                 BIG)
                prov_min = np.minimum(prov_min, prov2)
            prov_min = np.minimum(prov_min, prov)
        win = np.minimum(plain_min, prov_min)
        wm = win >> RB

        # Path select: pred whose candidate produced the winning key.
        sel_hi = np.zeros((nrows, N), hi.dtype)
        sel_lo = np.zeros((nrows, N), lo.dtype)
        sel_us = np.zeros((nrows, N), np.int64)
        for k in range(geo.K):
            mk = m[geo.pred_row[g, k]][None, :]
            hk = hi[geo.pred_row[g, k]][None, :]
            lk = lo[geo.pred_row[g, k]][None, :]
            csk = geo.cs[g, k][:, None]
            match = csk == cs_b[None, :]
            cond = ((mk << RB) | (geo.ncs - 1 - csk)) == win
            if geo.cs2 is not None:
                cs2k = geo.cs2[g, k][:, None]
                match2 = cs2k == cs_b[None, :]
                # us depends on which coded symbol's branch won
                cond2 = (((mk << RB) | (geo.ncs - 1 - cs2k)) == win)
                provwin = ((((mk + c_b[None, :]) << RB) | geo.ncs)
                           == win)
                cond_hi = cond | (provwin & match)
                cond_lo = cond2 | (provwin & match2)
                u_hi = geo.us_hi[g, k][:, None]
                u_lo = geo.us_lo[g, k][:, None]
                sel_hi = np.where(cond_hi | cond_lo, hk, sel_hi)
                sel_lo = np.where(cond_hi | cond_lo, lk, sel_lo)
                sel_us = np.where(cond_hi, u_hi,
                                  np.where(cond_lo, u_lo, sel_us))
            else:
                provwin = ((((mk + c_b[None, :]) << RB) | geo.ncs)
                           == win) & match
                condk = cond | provwin
                sel_hi = np.where(condk, hk, sel_hi)
                sel_lo = np.where(condk, lk, sel_lo)
        if geo.cs2 is None:
            sel_us = geo.us[g][:, None] + np.zeros((1, N), np.int64)
        M32 = np.uint64(0xFFFFFFFF)
        nh = (((sel_hi.astype(np.uint64) << np.uint64(nbits))
               | (sel_lo.astype(np.uint64) >> np.uint64(32 - nbits)))
              & M32).astype(hi.dtype)
        nl = (((sel_lo.astype(np.uint64) << np.uint64(nbits))
               | sel_us.astype(np.uint64)) & M32).astype(lo.dtype)
        new_m[g * geo.K:(g + 1) * geo.K] = wm
        new_hi[g * geo.K:(g + 1) * geo.K] = nh
        new_lo[g * geo.K:(g + 1) * geo.K] = nl

    # Best/second state ('<' first-min by original state index).
    key = (new_m << 6) | geo.orig[:, None]
    bk = key.min(axis=0)
    bm = bk >> 6
    mask = key == bk[None, :]
    shift = (depth - 1) * nbits
    path64 = ((new_hi.astype(np.uint64) << np.uint64(32))
              | new_lo.astype(np.uint64))
    usp = ((path64 >> np.uint64(shift))
           & np.uint64((1 << nbits) - 1)).astype(np.int64)
    us_out = np.where(mask, usp, 0).max(axis=0)
    second = np.where(mask, BIG, key).min(axis=0) >> 6
    q = second - bm
    return new_m - bm[None, :], new_hi, new_lo, us_out, q


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _use_fori(geo: BankGeometry) -> bool:
    """K >= 32 (5/6, 7/8): a fully-unrolled pred loop materializes an
    expression DAG whose Mosaic stack exceeds the 16 MB VMEM; iterate
    preds with lax.fori_loop (8 unrolled per step) and carried
    running-min accumulators instead."""
    return geo.K >= 32


@lru_cache(maxsize=None)
def _pred_runs(rate: str):
    """For fori rates: per bank, the predecessor STORED rows grouped
    into contiguous runs (so each fori step loads one aligned [8, N]
    block of each plane), plus the branch order matching that row
    order. Returns runs[g] = (row_start, length) list and order[g] =
    the k indices in stored-row order."""
    geo = bank_geometry(rate)
    runs, orders = [], []
    for g in range(geo.G):
        rows = [(int(geo.pred_row[g, k]), k) for k in range(geo.K)]
        rows.sort()
        order = [k for _, k in rows]
        rr = [r for r, _ in rows]
        rn = []
        start = prev = rr[0]
        for r in rr[1:]:
            if r == prev + 1:
                prev = r
                continue
            rn.append((start, prev - start + 1))
            start = prev = r
        rn.append((start, prev - start + 1))
        assert all(ln % 8 == 0 for _, ln in rn), rn
        runs.append(tuple(rn))
        orders.append(tuple(order))
    return tuple(runs), tuple(orders)


@lru_cache(maxsize=None)
def _kernel_tables(rate: str):
    """Static tables as kernel inputs (Pallas forbids captured arrays).

    Unrolled layout (K <= 16): tblA [max(K,8), 128] i32: column g*K+k
    rows 0..K-1 = RANKS ncs-1-cs[g,k,:]; columns 64+g = us[g,:].

    Fori layout (K >= 32): per-pred data stacked ALONG SUBLANES so the
    traced pred index becomes a dynamic SUBLANE slice (dynamic lane
    indexing is unsupported). Row (g*K + pos)*J + j, with pos the
    stored-row iteration order (_pred_runs), lane 0 packs the branch
    constants into one i32:
      bits 0-7   rank of the (larger) coded symbol  = ncs-1-cs
      bits 8-15  rank of the smaller coded symbol (B=7; 0xFF pad else)
      bits 16-22 us of the larger-cs branch (us of s' for B<=5)
      bits 23-29 us of the smaller-cs branch (B=7)
    """
    geo = bank_geometry(rate)
    if not _use_fori(geo):
        rows = max(geo.K, 8)
        tblA = np.zeros((rows, LANES), np.int32)
        for g in range(geo.G):
            for k in range(geo.K):
                tblA[:geo.K, g * geo.K + k] = geo.ncs - 1 - geo.cs[g, k]
        for g in range(geo.G):
            tblA[:geo.K, 64 + g] = geo.us[g]
        return tblA
    _, orders = _pred_runs(rate)
    J = NSTATES if geo.cs2 is not None else geo.K
    tblA = np.zeros((geo.G * geo.K * J, LANES), np.int32)
    for g in range(geo.G):
        for pos, k in enumerate(orders[g]):
            r = (g * geo.K + pos) * J
            rk = geo.ncs - 1 - geo.cs[g, k]
            if geo.cs2 is not None:
                rk2 = geo.ncs - 1 - geo.cs2[g, k]
                uh, ul = geo.us_hi[g, k], geo.us_lo[g, k]
            else:
                rk2 = np.full(J, 0xFF)
                uh = geo.us[g]                    # [J], us per output row
                ul = np.zeros(J, np.int32)
            tblA[r:r + J, 0] = (rk | (rk2 << 8) | (uh << 16)
                                | (ul << 23))
    return tblA


@lru_cache(maxsize=None)
def _kernel_tables_grouped(rate: str, groups: int):
    """Grouped (pred-on-lanes) tables for B=7: lane-group g handles
    predecessors [g*P, (g+1)*P), P = 64/groups; iteration `it` covers
    pred g*P+it for every group at once. Row it*64+j, lane g*ncols+col
    packs that group's branch constants (same packing as
    _kernel_tables), replicated over the ncols channel columns."""
    geo = bank_geometry(rate)
    assert geo.cs2 is not None
    P = NSTATES // groups
    ncols = LANES // groups
    tbl = np.zeros((P * NSTATES, LANES), np.int32)
    for g in range(groups):
        for it in range(P):
            k = g * P + it
            rk = geo.ncs - 1 - geo.cs[0, k]
            rk2 = geo.ncs - 1 - geo.cs2[0, k]
            packed = (rk | (rk2 << 8) | (geo.us_hi[0, k] << 16)
                      | (geo.us_lo[0, k] << 23))
            for col in range(ncols):
                tbl[it * NSTATES:(it + 1) * NSTATES,
                    g * ncols + col] = packed
    return tbl


@lru_cache(maxsize=None)
def _kernel_tables_rowsplit(rate: str):
    """Row-split (B=7, 64-channel) tables: the 64 OUTPUT STATES are
    split across the two lane-halves (channels replicated), so every
    candidate op runs on [32, LANES] half-planes — 4 native vregs
    instead of 8.  Row p*32 + r, lane l packs the branch constants for
    predecessor p into state s = r + 32*(l >= 64) (same field packing
    as _kernel_tables' fori layout), replicated over the 64 channel
    columns of each half."""
    geo = bank_geometry(rate)
    assert geo.cs2 is not None
    tbl = np.zeros((NSTATES * 32, LANES), np.int32)
    for p in range(NSTATES):
        rk = geo.ncs - 1 - geo.cs[0, p]          # [64] per state
        rk2 = geo.ncs - 1 - geo.cs2[0, p]
        packed = (rk | (rk2 << 8) | (geo.us_hi[0, p] << 16)
                  | (geo.us_lo[0, p] << 23))
        for r in range(32):
            tbl[p * 32 + r, 0:64] = packed[r]
            tbl[p * 32 + r, 64:128] = packed[32 + r]
    return tbl


def _acs_banked_kernel(rate: str, cheap_q: bool, groups: int,
                       rowsplit: bool,
                       tblA_ref, cs_ref, cost_ref,
                       m_in_ref, hi_in_ref, lo_in_ref,
                       m_out_ref, hi_out_ref, lo_out_ref,
                       us_ref, q_ref, scratch):
    """One grid step = one (128-lane slab, P_SUB-block tile).

    scratch (384, LANES): two 192-row regions (m 0:64, hi 64:128,
    lo 128:192), ping-ponged per block because every bank reads
    predecessor rows scattered across the whole previous plane.
    rowsplit (B=7, 64 channels): output states split across the two
    lane-halves, half-height planes (see _kernel_tables_rowsplit).
    """
    geo = bank_geometry(rate)
    nbits, depth = PATH_SPEC[rate]
    sh = (depth - 1) * nbits - 32        # >= 0 for all supported rates
    RB = geo.rank_bits
    K, G, ncs = geo.K, geo.G, geo.ncs
    i = pl.program_id(1)
    BIG = jnp.int32(1 << 30)
    nb = jnp.int32(nbits)
    carry_mask = jnp.int32((1 << nbits) - 1)
    lane_hi = jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 1) >= 64

    @pl.when(i == 0)
    def _():
        if rowsplit:
            # Repack tiled [64, N] planes (lane-halves replicate the
            # channels) into half-height row-split planes: row r lane l
            # holds state r + 32*(l >= 64).
            for off, ref in ((0, m_in_ref), (64, hi_in_ref),
                             (128, lo_in_ref)):
                v = ref[...]
                scratch[off:off + 32] = jnp.where(lane_hi, v[32:64],
                                                  v[0:32])
        else:
            scratch[0:64] = m_in_ref[...]
            scratch[64:128] = hi_in_ref[...]
            scratch[128:192] = lo_in_ref[...]

    # stored row -> original state index, as a [64, 1] column.
    rr = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
    if geo.B <= 5:
        ocol = (rr % K) * G + rr // K
    else:
        ocol = rr

    def _epilogue(t, ro_out, want_q):
        # Best/second state + traceback read + normalization.
        m_new = scratch[ro_out:ro_out + 64]
        key = (m_new << 6) | ocol
        bk = jnp.min(key, axis=0, keepdims=True)               # [1, N]
        bm = bk >> 6
        mask = key == bk
        usp = (scratch[ro_out + 64:ro_out + 128] >> sh) & \
            jnp.int32((1 << nbits) - 1)
        us_ref[t] = jnp.max(jnp.where(mask, usp, 0), axis=0)
        if want_q:
            second = jnp.min(jnp.where(mask, BIG, key), axis=0,
                             keepdims=True) >> 6
            q_ref[t] = (second - bm)[0]
        else:
            q_ref[t] = jnp.zeros((LANES,), jnp.int32)
        scratch[ro_out:ro_out + 64] = m_new - bm

    def block_fori(t, ro_in, ro_out, want_q, cs_b, c_b):
        """Single running-min pass over predecessors, 8 unrolled per
        lax.fori_loop step (K >= 32; see _use_fori). Packed candidate
        keys are UNIQUE per (row, lane) -- the rank field encodes the
        coded symbol and coded symbols are distinct across all branches
        of a state -- so an order-free strict-< running min reproduces
        the reference scan exactly."""
        J = 64 if geo.cs2 is not None else K
        U = 8
        runs, _ = _pred_runs(rate)
        rcs = (ncs - 1) - cs_b                      # rank of provided cs
        cshift = c_b << RB                          # hoisted: (m+c)<<RB
        us_mask = jnp.int32(0x7F)
        for g in range(G):
            BIGc = jnp.full((J, LANES), BIG, jnp.int32)
            z = jnp.zeros((J, LANES), jnp.int32)

            def step8(row0, tr0, carry):
                # The us sub-selection is DEFERRED: the loop carries the
                # winning pred's raw table word and the epilogue unpacks
                # once (incl. the hi-cs match bit, re-derived from the
                # word), saving ~6 VPU ops per pred.
                run_key, run_hi, run_lo, run_tc = carry
                m8 = scratch[pl.ds(ro_in + row0, U)]
                h8 = scratch[pl.ds(ro_in + 64 + row0, U)]
                l8 = scratch[pl.ds(ro_in + 128 + row0, U)]
                t8 = tblA_ref[pl.ds(tr0, U * J), 0][:, None]   # [U*J, 1]
                for ki in range(U):
                    mk = m8[ki:ki + 1]
                    hk = h8[ki:ki + 1]
                    lk = l8[ki:ki + 1]
                    tc = t8[ki * J:(ki + 1) * J]
                    rk = tc & 0xFF
                    base = mk << RB
                    p1 = base | rk
                    mh = rk == rcs
                    provk = (base + cshift) | ncs
                    if geo.cs2 is not None:
                        rk2 = (tc >> 8) & 0xFF
                        p2 = base | rk2
                        prov = jnp.where(mh | (rk2 == rcs), provk, BIG)
                        key_k = jnp.minimum(jnp.minimum(p1, p2), prov)
                    else:
                        prov = jnp.where(mh, provk, BIG)
                        key_k = jnp.minimum(p1, prov)
                    cond = key_k < run_key
                    run_key = jnp.where(cond, key_k, run_key)
                    run_hi = jnp.where(cond, hk, run_hi)
                    run_lo = jnp.where(cond, lk, run_lo)
                    run_tc = jnp.where(cond, tc, run_tc)
                return run_key, run_hi, run_lo, run_tc

            carry = (BIGc, z, z, z)
            pos = 0
            for (rstart, rlen) in runs[g]:
                def body(kb, c, rstart=rstart, pos=pos):
                    return step8(rstart + kb * U,
                                 (g * K + pos + kb * U) * J, c)
                carry = jax.lax.fori_loop(0, rlen // U, body, carry)
                pos += rlen
            run_key, run_hi, run_lo, run_tc = carry
            wm = run_key >> RB
            uh = (run_tc >> 16) & us_mask
            if geo.cs2 is not None:
                ul = (run_tc >> 23) & us_mask
                rank = run_key & jnp.int32((1 << RB) - 1)
                is_prov = rank == ncs
                is_p2 = rank == ((run_tc >> 8) & 0xFF)
                # hi-cs match bit re-derived from the winning table word
                # (the carried run_mh plane it replaces was exactly
                # this predicate at carry time).
                run_mh = (run_tc & 0xFF) == rcs
                run_us = jnp.where(is_prov,
                                   jnp.where(run_mh, uh, ul),
                                   jnp.where(is_p2, ul, uh))
            else:
                run_us = uh
            new_hi = (run_hi << nb) | ((run_lo >> (32 - nbits))
                                       & carry_mask)
            new_lo = (run_lo << nb) | run_us
            scratch[ro_out + g * J:ro_out + (g + 1) * J] = wm
            scratch[ro_out + 64 + g * J:ro_out + 64 + (g + 1) * J] = \
                new_hi
            scratch[ro_out + 128 + g * J:ro_out + 128 + (g + 1) * J] = \
                new_lo

    ncols_g = LANES // groups
    P_g = NSTATES // groups
    log2ncols = ncols_g.bit_length() - 1
    rowi = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    gbase = (jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 1)
             >> log2ncols) * P_g

    def block_grouped(t, ro_in, ro_out, want_q, cs_b, c_b):
        """Pred-on-lanes (B=7, groups > 1): the metric planes are
        replicated across `groups` lane-groups; each fori step covers
        one predecessor PER GROUP (static mask extract + full-width
        table row block), and a circular-roll butterfly all-reduces the
        unique packed keys so every group ends with the identical
        winning planes — exact, order-free."""
        rcs = (ncs - 1) - cs_b
        cshift = c_b << RB
        us_mask = jnp.int32(0x7F)
        BIGc = jnp.full((64, LANES), BIG, jnp.int32)
        z = jnp.zeros((64, LANES), jnp.int32)

        def body(it, carry):
            run_key, run_hi, run_lo, run_tc = carry
            mask = rowi == (gbase + it)
            mkv = jnp.sum(jnp.where(mask, scratch[ro_in:ro_in + 64], 0),
                          axis=0, keepdims=True)            # [1, N]
            hkv = jnp.sum(jnp.where(mask,
                                    scratch[ro_in + 64:ro_in + 128], 0),
                          axis=0, keepdims=True)
            lkv = jnp.sum(jnp.where(mask,
                                    scratch[ro_in + 128:ro_in + 192], 0),
                          axis=0, keepdims=True)
            tc = tblA_ref[pl.ds(it * 64, 64), :]             # [64, N]
            rk = tc & 0xFF
            rk2 = (tc >> 8) & 0xFF
            base = mkv << RB
            p1 = base | rk
            p2 = base | rk2
            mh = rk == rcs
            provk = (base + cshift) | ncs
            prov = jnp.where(mh | (rk2 == rcs), provk, BIG)
            key_k = jnp.minimum(jnp.minimum(p1, p2), prov)
            cond = key_k < run_key
            return (jnp.where(cond, key_k, run_key),
                    jnp.where(cond, hkv, run_hi),
                    jnp.where(cond, lkv, run_lo),
                    jnp.where(cond, tc, run_tc))

        run_key, run_hi, run_lo, run_tc = jax.lax.fori_loop(
            0, P_g, body, (BIGc, z, z, z))
        # Butterfly all-reduce across the lane-groups (keys unique).
        for kk in range(groups.bit_length() - 1):
            sh = ncols_g << kk
            ok = pltpu.roll(run_key, shift=sh, axis=1)
            take = ok < run_key
            run_key = jnp.where(take, ok, run_key)
            run_hi = jnp.where(take, pltpu.roll(run_hi, shift=sh,
                                                axis=1), run_hi)
            run_lo = jnp.where(take, pltpu.roll(run_lo, shift=sh,
                                                axis=1), run_lo)
            run_tc = jnp.where(take, pltpu.roll(run_tc, shift=sh,
                                                axis=1), run_tc)
        wm = run_key >> RB
        uh = (run_tc >> 16) & us_mask
        ul = (run_tc >> 23) & us_mask
        rank = run_key & jnp.int32((1 << RB) - 1)
        run_us = jnp.where(rank == ncs,
                           jnp.where((run_tc & 0xFF) == rcs, uh, ul),
                           jnp.where(rank == ((run_tc >> 8) & 0xFF),
                                     ul, uh))
        new_hi = (run_hi << nb) | ((run_lo >> (32 - nbits))
                                   & carry_mask)
        new_lo = (run_lo << nb) | run_us
        scratch[ro_out:ro_out + 64] = wm
        scratch[ro_out + 64:ro_out + 128] = new_hi
        scratch[ro_out + 128:ro_out + 192] = new_lo

    ocol2 = (jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 0)
             + jnp.where(lane_hi, 32, 0))
    half_idx = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) >> 6

    def block_rowsplit(t, ro_in, ro_out, want_q, cs_b, c_b):
        """B=7 at 64 channels: states on half-height planes, channels
        replicated across the lane-halves. Every candidate op is
        [32, LANES] (4 native vregs, half the full-plane sweep). Each
        ALIGNED [8, N] plane read serves 16 predecessors: row r carries
        pred r (lanes 0-63) and pred 32+r (lanes 64-127), split out by
        one half-swap roll. The packed keys stay globally unique, so
        the strict-< running min is exact as in the other paths."""
        rcs = (ncs - 1) - cs_b
        cshift = c_b << RB
        us_mask = jnp.int32(0x7F)
        BIGc = jnp.full((32, LANES), BIG, jnp.int32)
        z = jnp.zeros((32, LANES), jnp.int32)
        lmask = half_idx == 0                        # [1, N] lanes < 64

        def body(b8, carry):
            run_key, run_hi, run_lo, run_tc = carry
            r0 = b8 * 8
            m8 = scratch[pl.ds(ro_in + r0, 8)]
            h8 = scratch[pl.ds(ro_in + 64 + r0, 8)]
            l8 = scratch[pl.ds(ro_in + 128 + r0, 8)]
            tcA = tblA_ref[pl.ds(r0 * 32, 8 * 32), :]
            tcB = tblA_ref[pl.ds((32 + r0) * 32, 8 * 32), :]
            for ki in range(8):
                rowm = m8[ki:ki + 1]
                rowh = h8[ki:ki + 1]
                rowl = l8[ki:ki + 1]
                rm = pltpu.roll(rowm, shift=64, axis=1)
                rh = pltpu.roll(rowh, shift=64, axis=1)
                rl = pltpu.roll(rowl, shift=64, axis=1)
                for half, tch in ((0, tcA), (1, tcB)):
                    if half == 0:
                        mk = jnp.where(lmask, rowm, rm)
                        hk = jnp.where(lmask, rowh, rh)
                        lk = jnp.where(lmask, rowl, rl)
                    else:
                        mk = jnp.where(lmask, rm, rowm)
                        hk = jnp.where(lmask, rh, rowh)
                        lk = jnp.where(lmask, rl, rowl)
                    tc = tch[ki * 32:(ki + 1) * 32]
                    rk = tc & 0xFF
                    rk2 = (tc >> 8) & 0xFF
                    base = mk << RB
                    p1 = base | rk
                    p2 = base | rk2
                    provk = (base + cshift) | ncs
                    prov = jnp.where((rk == rcs) | (rk2 == rcs),
                                     provk, BIG)
                    key_k = jnp.minimum(jnp.minimum(p1, p2), prov)
                    cond = key_k < run_key
                    run_key = jnp.where(cond, key_k, run_key)
                    run_hi = jnp.where(cond, hk, run_hi)
                    run_lo = jnp.where(cond, lk, run_lo)
                    run_tc = jnp.where(cond, tc, run_tc)
            return run_key, run_hi, run_lo, run_tc

        run_key, run_hi, run_lo, run_tc = jax.lax.fori_loop(
            0, 4, body, (BIGc, z, z, z))
        wm = run_key >> RB
        uh = (run_tc >> 16) & us_mask
        ul = (run_tc >> 23) & us_mask
        rank = run_key & jnp.int32((1 << RB) - 1)
        run_us = jnp.where(rank == ncs,
                           jnp.where((run_tc & 0xFF) == rcs, uh, ul),
                           jnp.where(rank == ((run_tc >> 8) & 0xFF),
                                     ul, uh))
        new_hi = (run_hi << nb) | ((run_lo >> (32 - nbits))
                                   & carry_mask)
        new_lo = (run_lo << nb) | run_us
        scratch[ro_out:ro_out + 32] = wm
        scratch[ro_out + 64:ro_out + 96] = new_hi
        scratch[ro_out + 128:ro_out + 160] = new_lo

    def _epilogue_rowsplit(t, ro_out, want_q):
        m_new = scratch[ro_out:ro_out + 32]
        key = (m_new << 6) | ocol2
        bh = jnp.min(key, axis=0, keepdims=True)               # [1, N]
        bk = jnp.minimum(bh, pltpu.roll(bh, shift=64, axis=1))
        bm = bk >> 6
        mask = key == bk
        usp = (scratch[ro_out + 64:ro_out + 96] >> sh) & \
            jnp.int32((1 << nbits) - 1)
        uh2 = jnp.max(jnp.where(mask, usp, 0), axis=0,
                      keepdims=True)
        us_ref[t] = jnp.maximum(uh2, pltpu.roll(uh2, shift=64,
                                                axis=1))[0]
        if want_q:
            s2 = jnp.min(jnp.where(mask, BIG, key), axis=0,
                         keepdims=True)
            second = jnp.minimum(s2, pltpu.roll(s2, shift=64,
                                                axis=1)) >> 6
            q_ref[t] = (second - bm)[0]
        else:
            q_ref[t] = jnp.zeros((LANES,), jnp.int32)
        scratch[ro_out:ro_out + 32] = m_new - bm

    def block(t, ro_in, ro_out, want_q):
        cs_b = cs_ref[t][None, :]                  # [1, N]
        c_b = cost_ref[t][None, :]

        if rowsplit:
            block_rowsplit(t, ro_in, ro_out, want_q, cs_b, c_b)
            _epilogue_rowsplit(t, ro_out, want_q)
            return
        if groups > 1:
            block_grouped(t, ro_in, ro_out, want_q, cs_b, c_b)
            _epilogue(t, ro_out, want_q)
            return
        if _use_fori(geo):
            block_fori(t, ro_in, ro_out, want_q, cs_b, c_b)
            _epilogue(t, ro_out, want_q)
            return

        # Single-pass running min (keys unique per (row, lane): ranks
        # are distinct across the K branches into a state — asserted in
        # bank_geometry — and the provided key's rank field is ncs);
        # the winning pred's path rows ride along, no re-scan pass.
        rcs = (ncs - 1) - cs_b                     # [1, N]
        cshift = c_b << RB
        for g in range(G):
            run_key = run_hi = run_lo = None
            for k in range(K):
                row = int(geo.pred_row[g, k])
                mk = scratch[ro_in + row:ro_in + row + 1]      # [1, N]
                hk = scratch[ro_in + 64 + row:ro_in + 64 + row + 1]
                lk = scratch[ro_in + 128 + row:ro_in + 128 + row + 1]
                rkk = tblA_ref[0:K, g * K + k][:, None]        # [K, 1]
                base = mk << RB                                # [1, N]
                plain = base | rkk                             # [K, N]
                provk = (base + cshift) | ncs                  # [1, N]
                key_k = jnp.where(rkk == rcs,
                                  jnp.minimum(plain, provk), plain)
                if run_key is None:
                    z = jnp.zeros_like(key_k)
                    run_key, run_hi, run_lo = key_k, hk + z, lk + z
                else:
                    cond = key_k < run_key
                    run_key = jnp.where(cond, key_k, run_key)
                    run_hi = jnp.where(cond, hk, run_hi)
                    run_lo = jnp.where(cond, lk, run_lo)
            wm = run_key >> RB
            sel_us = tblA_ref[0:K, 64 + g][:, None] + \
                jnp.zeros_like(wm)
            new_hi = (run_hi << nb) | ((run_lo >> (32 - nbits))
                                       & carry_mask)
            new_lo = (run_lo << nb) | sel_us
            scratch[ro_out + g * K:ro_out + (g + 1) * K] = wm
            scratch[ro_out + 64 + g * K:ro_out + 64 + (g + 1) * K] = \
                new_hi
            scratch[ro_out + 128 + g * K:ro_out + 128 + (g + 1) * K] = \
                new_lo

        _epilogue(t, ro_out, want_q)

    def body2(p, carry):
        block(2 * p, 0, 192, want_q=True)
        block(2 * p + 1, 192, 0, want_q=True)
        return carry

    def body2_cheap(p, carry):
        # q on even blocks of every 2nd pair only (1-in-4 subsample).
        block(4 * p, 0, 192, want_q=True)
        block(4 * p + 1, 192, 0, want_q=False)
        block(4 * p + 2, 0, 192, want_q=False)
        block(4 * p + 3, 192, 0, want_q=False)
        return carry

    if cheap_q:
        jax.lax.fori_loop(0, P_SUB // 4, body2_cheap, 0)
    else:
        jax.lax.fori_loop(0, P_SUB // 2, body2, 0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        if rowsplit:
            # Unpack half-height row-split planes back to the tiled
            # [64, N] layout (both lane-halves replicate the channels).
            for off, ref in ((0, m_out_ref), (64, hi_out_ref),
                             (128, lo_out_ref)):
                rep = scratch[off:off + 32]
                swp = pltpu.roll(rep, shift=64, axis=1)
                lo32 = jnp.where(lane_hi, swp, rep)
                hi32 = jnp.where(lane_hi, rep, swp)
                ref[...] = jnp.concatenate([lo32, hi32], axis=0)
        else:
            m_out_ref[...] = scratch[0:64]
            hi_out_ref[...] = scratch[64:128]
            lo_out_ref[...] = scratch[128:192]


@partial(jax.jit, static_argnames=("rate", "interpret", "cheap_q",
                                   "groups", "rowsplit"))
def viterbi_acs_banked(rate: str, metric, path_hi, path_lo, cs, cost,
                       interpret=False, cheap_q=False, groups=1,
                       rowsplit=False):
    """Banked ACS over T = E*P_SUB blocks for a punctured rate.

    metric/path_hi/path_lo [64, N] i32; cs/cost [T, N] i32 (N multiple
    of 128; cs carries the full bits_out-bit block symbol, cost the
    summed nshifts softsymbol costs). Returns (metric, hi, lo,
    us [T, N] i32, q [T, N] i32).

    groups > 1 (B=7 only, N == 128): pred-on-lanes — the caller tiles
    channels across `groups` lane-groups (planes AND cs/cost), and the
    kernel splits the 64 predecessors across groups with a butterfly
    key reduction. All groups return identical planes/outputs.

    rowsplit (B=7 only, N == 128, <= 64 channels tiled across both
    lane-halves like groups=2): output states split across the
    lane-halves so the pred sweep runs on half-height planes.
    """
    T, N = cs.shape
    assert T % P_SUB == 0 and N % LANES == 0
    assert groups == 1 or N == LANES
    assert not (rowsplit and groups > 1)
    assert not rowsplit or N == LANES
    nT, nG = T // P_SUB, N // LANES
    tblA = (_kernel_tables_rowsplit(rate) if rowsplit
            else _kernel_tables(rate) if groups == 1
            else _kernel_tables_grouped(rate, groups))
    kernel = partial(_acs_banked_kernel, rate, cheap_q, groups,
                     rowsplit)
    blk = pl.BlockSpec((P_SUB, LANES), lambda g, i: (i, g),
                       memory_space=pltpu.VMEM)
    st = pl.BlockSpec((64, LANES), lambda g, i: (0, g),
                      memory_space=pltpu.VMEM)
    tba = pl.BlockSpec((tblA.shape[0], LANES), lambda g, i: (0, 0),
                       memory_space=pltpu.VMEM)
    m2, h2, l2, us, q = pl.pallas_call(
        kernel,
        grid=(nG, nT),
        in_specs=[tba, blk, blk, st, st, st],
        out_specs=[st, st, st, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((64, N), jnp.int32),
            jax.ShapeDtypeStruct((64, N), jnp.int32),
            jax.ShapeDtypeStruct((64, N), jnp.int32),
            jax.ShapeDtypeStruct((T, N), jnp.int32),
            jax.ShapeDtypeStruct((T, N), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((384, LANES), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(tblA), cs, cost, metric, path_hi, path_lo)
    return m2, h2, l2, us, q
