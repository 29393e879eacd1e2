"""Viterbi decoding with puncturing expanded into the trellis.

Mirrors trellis/viterbi_dec (reference viterbi.h:43-293) and viterbi_sync
(reference dvb.h:1173-1416): per code rate, a 64-state trellis whose coded
symbols span one full puncturing period (NCS = 2^bits_out), register-
exchange paths packed into 64-bit words, partial branch metrics from the
nearest-minus-second-nearest softsymbol costs, and nconj x nrot x nshift
decoder replicas elected by path-metric discriminant.

The ACS is vectorized over the 64 states and over decoder replicas
(NumPy on host; the states axis maps directly to TPU lanes for the device
version). Tie-breaking follows the reference exactly: branches are
scanned provided-metric first then all coded symbols ascending, with '<='
so the LAST minimal branch wins (viterbi.h:202-237).
"""

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .convenc import POLYS, FEC_SPECS
from ..dsp.math_utils import parity_u64_np

NSTATES = 64

# bitpath depth per rate (dvb.h:1180-1212): (path bits per block, depth)
PATH_SPEC = {
    "1/2": (1, 32), "2/3": (3, 21), "4/6": (4, 16), "3/4": (3, 21),
    "4/5": (4, 16), "5/6": (5, 12), "7/8": (7, 9),
}


@dataclass
class Trellis:
    rate: str
    bits_in: int
    bits_out: int
    nus: int                  # 2^bits_in uncoded symbols
    ncs: int                  # 2^bits_out coded symbols
    pred: np.ndarray          # [64, NCS] predecessor state or -1
    us: np.ndarray            # [64, NCS] uncoded symbol
    # Dense incoming-branch view (each state has exactly NUS branches):
    in_cs: np.ndarray         # [64, NUS] coded symbol of branch k
    in_pred: np.ndarray       # [64, NUS]
    in_us: np.ndarray         # [64, NUS]


@lru_cache(maxsize=None)
def make_trellis(rate: str) -> Trellis:
    """init_convolutional (viterbi.h:61-92)."""
    bits_in, bits_out = FEC_SPECS[rate]
    polys = POLYS[rate]
    nus, ncs = 1 << bits_in, 1 << bits_out
    pred = np.full((NSTATES, ncs), -1, np.int32)
    usx = np.zeros((NSTATES, ncs), np.int32)
    for s in range(NSTATES):
        for us in range(nus):
            shiftreg = s
            us_rev = 0
            b = 1
            while b < nus:
                if us & b:
                    us_rev |= nus // 2 // b
                b *= 2
            shiftreg |= us_rev * NSTATES
            cs = 0
            for g in polys:
                cs = (cs << 1) | int(parity_u64_np(shiftreg & g))
            shiftreg //= nus
            if pred[shiftreg, cs] != -1:
                raise ValueError("Invalid convolutional code")
            pred[shiftreg, cs] = s
            usx[shiftreg, cs] = us
    # Dense incoming view in ascending-cs order (the reference's rescan
    # order, viterbi.h:224-233).
    in_cs = np.zeros((NSTATES, nus), np.int32)
    in_pred = np.zeros((NSTATES, nus), np.int32)
    in_us = np.zeros((NSTATES, nus), np.int32)
    for s in range(NSTATES):
        k = 0
        for cs in range(ncs):
            if pred[s, cs] >= 0:
                in_cs[s, k] = cs
                in_pred[s, k] = pred[s, cs]
                in_us[s, k] = usx[s, cs]
                k += 1
        assert k == nus
    return Trellis(rate, bits_in, bits_out, nus, ncs, pred, usx,
                   in_cs, in_pred, in_us)


class ViterbiBank:
    """A bank of decoder replicas sharing one trellis (the [nsyncs]
    replicas of viterbi_sync), states vectorized in the last axis."""

    def __init__(self, trellis: Trellis, n: int):
        self.t = trellis
        self.n = n
        self.cost = np.zeros((n, NSTATES), np.int64)
        self.path = np.zeros((n, NSTATES), np.uint64)
        nbits, depth = PATH_SPEC[trellis.rate]
        self.nbits, self.depth = nbits, depth

    def update(self, idx: np.ndarray, cs: np.ndarray, cost: np.ndarray):
        """Partial-metric ACS (viterbi.h:202-260) for replicas `idx`.

        cs, cost: per-replica coded symbol and (negative) metric.
        Returns (us_out [k], quality [k]).
        """
        t = self.t
        prev_cost = self.cost[idx]                     # [k, 64]
        prev_path = self.path[idx]

        # Candidate metrics in the reference's scan order: provided branch
        # first, then all branches (without metric) cs-ascending; '<='
        # means the LAST minimum wins.
        m_other = prev_cost[:, t.in_pred]              # [k, 64, NUS]
        has = t.pred[:, :] >= 0                        # [64, NCS]
        prov_pred = t.pred[np.arange(NSTATES)[None, :], cs[:, None]]  # [k,64]
        prov_valid = prov_pred >= 0
        m_prov = np.where(prov_valid,
                          np.take_along_axis(prev_cost, np.maximum(
                              prov_pred, 0), axis=1) + cost[:, None],
                          np.int64(1) << 60)
        cand = np.concatenate([m_prov[:, :, None], m_other], axis=2)
        # last argmin = reverse argmin
        rev = cand[:, :, ::-1]
        j = rev.shape[2] - 1 - np.argmin(rev, axis=2)  # [k,64]
        best_m = np.take_along_axis(cand, j[:, :, None], axis=2)[:, :, 0]

        prov_us = t.us[np.arange(NSTATES)[None, :], cs[:, None]]
        all_pred = np.concatenate(
            [np.maximum(prov_pred, 0)[:, :, None],
             np.broadcast_to(t.in_pred[None], m_other.shape)], axis=2)
        all_us = np.concatenate(
            [prov_us[:, :, None],
             np.broadcast_to(t.in_us[None], m_other.shape)], axis=2)
        bpred = np.take_along_axis(all_pred, j[:, :, None], axis=2)[:, :, 0]
        bus = np.take_along_axis(all_us, j[:, :, None], axis=2)[:, :, 0]

        new_path = (np.take_along_axis(prev_path, bpred, axis=1)
                    << np.uint64(self.nbits)) | bus.astype(np.uint64)

        # Best / second-best states ('<' scan ascending, viterbi.h:239-244)
        best_state = np.argmin(best_m, axis=1)
        best_tpm = np.min(best_m, axis=1)
        tmp = best_m.copy()
        tmp[np.arange(len(idx)), best_state] = np.int64(1) << 60
        best2_tpm = np.min(tmp, axis=1)

        self.cost[idx] = best_m - best_tpm[:, None]
        self.path[idx] = new_path

        out = (new_path[np.arange(len(idx)), best_state]
               >> np.uint64((self.depth - 1) * self.nbits)) \
            & np.uint64((1 << self.nbits) - 1)
        return out.astype(np.int64), (best2_tpm - best_tpm)


def make_sync_maps(cstln, rate: str):
    """init_map for all (conj, rot) combinations (dvb.h:1336-1351).

    Returns (maps [nmaps, nsymbols], nconj, nrotations, nshifts, order)
    where sync s uses map[(s // nrotations) %% nconj * nrotations + rot].
    """
    bits_per_symbol = cstln.bits_per_symbol
    bits_in, bits_out = FEC_SPECS[rate]
    nconj = 1 if cstln.nsymbols == 2 else 2
    if cstln.nsymbols in (2, 4):
        nrotations = cstln.nrotations // 2
    else:
        nrotations = cstln.nrotations
    nshifts = bits_out // bits_per_symbol
    if nshifts * bits_per_symbol != bits_out:
        raise ValueError("Code rate not suitable for this constellation")
    lut_symbol = cstln.lut_symbol.reshape(256, 256)
    maps = np.zeros((nconj * nrotations, cstln.nsymbols), np.int32)
    for conj in range(nconj):
        for rot in range(nrotations):
            angle = 2 * np.pi * rot / cstln.nrotations
            ca, sa = np.float32(np.cos(angle)), np.float32(np.sin(angle))
            for i in range(cstln.nsymbols):
                I = np.float32(cstln.symbols[i, 0])
                Q = np.float32(cstln.symbols[i, 1])
                if conj:
                    Q = -Q
                RI = int(np.trunc(I * ca - Q * sa)) & 0xFF
                RQ = int(np.trunc(I * sa + Q * ca)) & 0xFF
                maps[conj * nrotations + rot, i] = lut_symbol[RI, RQ]
    return maps, nconj, nrotations, nshifts


class ViterbiSync:
    """viterbi_sync (dvb.h:1173-1416): all-rate soft-decision Viterbi with
    periodic sync election. Consumes (symbol, cost) softsymbol streams."""

    CHUNK = 128

    def __init__(self, cstln, rate: str, fastlock: bool = False):
        self.rate = rate
        self.trellis = make_trellis(rate)
        self.bits_in = self.trellis.bits_in
        self.bps = cstln.bits_per_symbol
        maps, nconj, nrot, nshifts = make_sync_maps(cstln, rate)
        self.maps = maps
        self.nrot, self.nconj, self.nshifts = nrot, nconj, nshifts
        self.nsyncs = nconj * nrot * nshifts
        # sync s: rot = s%nrot, conj = (s//nrot)%nconj, shift = s//nrot//nconj
        self.sync_shift = np.array(
            [s // nrot // nconj for s in range(self.nsyncs)])
        self.sync_map = np.array(
            [(s // nrot) % nconj * nrot + (s % nrot)
             for s in range(self.nsyncs)])
        self.bank = ViterbiBank(self.trellis, self.nsyncs)
        self.current = 0
        self.resync_phase = 0
        self.resync_period = 1 if fastlock else 32
        self.sym_backlog = np.empty(0, np.uint8)
        self.cost_backlog = np.empty(0, np.int16)

    def _block_inputs(self, syms, costs, nblocks):
        """Per sync: coded symbols + costs for `nblocks` FEC blocks.

        Block b of sync s reads symbols [shift_s + b*nshifts, +nshifts),
        maps them, concatenates bits (dvb.h:1353-1363).
        """
        t = self.trellis
        cs = np.zeros((self.nsyncs, nblocks), np.int64)
        cost = np.zeros((self.nsyncs, nblocks), np.int64)
        base = np.arange(nblocks)[None, :] * self.nshifts \
            + self.sync_shift[:, None]                       # [S, B]
        for i in range(self.nshifts):
            sym = syms[base + i]                             # [S, B]
            mapped = self.maps[self.sync_map[:, None], sym]
            cs = (cs << self.bps) | mapped
            cost = cost + costs[base + i]
        return cs, cost

    def process(self, syms: np.ndarray, costs: np.ndarray) -> np.ndarray:
        """Feed softsymbols; returns decoded bytes."""
        self.sym_backlog = np.concatenate([self.sym_backlog, syms])
        self.cost_backlog = np.concatenate([self.cost_backlog, costs])
        out = []
        need = self.nshifts * self.CHUNK + (self.nshifts - 1)
        while len(self.sym_backlog) >= need:
            out.append(self._chunk())
        return (np.concatenate(out) if out
                else np.empty(0, np.uint8))

    def _chunk(self) -> np.ndarray:
        B = self.CHUNK
        discr_delay = 64 // self.bits_in
        syms = self.sym_backlog
        costs = self.cost_backlog.astype(np.int64)
        cs, cost = self._block_inputs(syms, costs, B)

        run_all = self.resync_phase == 0
        active = (np.arange(self.nsyncs) if run_all
                  else np.array([self.current]))
        totaldiscr = np.zeros(self.nsyncs, np.int64)
        out_bits = np.empty((B, self.bits_in), np.uint8)
        for b in range(B):
            us, q = self.bank.update(active, cs[active, b], cost[active, b])
            for k, s in enumerate(active):
                if b >= discr_delay:
                    totaldiscr[s] += q[k]
                if s == self.current:
                    r = int(us[k])
                    for j in range(self.bits_in):
                        out_bits[b, j] = (r >> (self.bits_in - 1 - j)) & 1
        self.sym_backlog = self.sym_backlog[B * self.nshifts:]
        self.cost_backlog = self.cost_backlog[B * self.nshifts:]
        if run_all:
            best = int(np.argmax(totaldiscr))
            # reference: strictly greater switches (dvb.h:1404-1406)
            if totaldiscr[best] > totaldiscr[self.current]:
                self.current = best
        self.resync_phase += 1
        if self.resync_phase >= self.resync_period:
            self.resync_phase = 0
        return np.packbits(out_bits.reshape(-1))
