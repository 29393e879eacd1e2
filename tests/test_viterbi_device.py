"""Device Viterbi (fec/viterbi_device.py) vs the host reference
implementation (fec/viterbi.py), interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from leansdr_tpu.dsp.cstln import Predef, make_dvbs2_constellation
from leansdr_tpu.fec import viterbi as vit
from leansdr_tpu.fec.viterbi_device import (
    NSYNCS, P_SUB, MultiViterbiSync, ViterbiPlan, viterbi_acs)


def test_acs_kernel_matches_host_bank():
    """Kernel ACS == ViterbiBank.update bit-for-bit (metrics, paths,
    decoded symbols, discriminants), including tie cases (small integer
    costs make metric ties frequent)."""
    rate = "1/2"
    T = P_SUB
    N = 128                     # one lane register
    rng = np.random.default_rng(7)
    cs = rng.integers(0, 4, (T, N)).astype(np.int32)
    cost = -rng.integers(0, 4, (T, N)).astype(np.int32)   # ties likely

    m, p, us, q = viterbi_acs(rate, jnp.zeros((64, N), jnp.int32),
                              jnp.zeros((64, N), jnp.int32),
                              jnp.asarray(cs), jnp.asarray(cost),
                              interpret=True)
    us = np.asarray(us)
    q = np.asarray(q)

    bank = vit.ViterbiBank(vit.make_trellis(rate), N)
    idx = np.arange(N)
    for t in range(T):
        bus, bq = bank.update(idx, cs[t].astype(np.int64),
                              cost[t].astype(np.int64))
        assert np.array_equal(us[t], bus), f"us mismatch at block {t}"
        assert np.array_equal(q[t], bq), f"q mismatch at block {t}"
    assert np.array_equal(np.asarray(m),
                          bank.cost.T.astype(np.int32))
    assert np.array_equal(np.asarray(p).astype(np.uint32),
                          (bank.path & np.uint64(0xFFFFFFFF)
                           ).T.astype(np.uint32))


def test_multi_viterbi_matches_host_sync():
    """MultiViterbiSync byte stream == host ViterbiSync(fastlock) on the
    same softsymbol stream, for every channel (steady state; the device
    election cadence is per P_SUB blocks vs 128, so use a clean stream
    where elections agree)."""
    rate = "1/2"
    cstln = make_dvbs2_constellation(Predef.QPSK, rate)
    C = 3
    nsamp = 2 * P_SUB + 64
    rng = np.random.default_rng(3)

    # Clean coded stream: encode random bytes, map to symbols, with a
    # per-channel sync transform so different replicas win.
    from leansdr_tpu.fec import convenc
    syms = np.zeros((nsamp, C), np.uint8)
    costs = np.full((nsamp, C), -40, np.int16)
    rots = [0, 1, 3]
    maps = vit.make_sync_maps(cstln, rate)[0]
    for c in range(C):
        data = rng.integers(0, 256, nsamp // 8, dtype=np.uint8)
        cs, _ = convenc.encode(data, rate, 2)   # [nsamp] coded symbols
        inv = np.argsort(maps[rots[c]])
        syms[:, c] = inv[cs]
    valid = np.ones((nsamp, C), bool)

    mv = MultiViterbiSync(cstln, rate, C, nsamp, 1.0, interpret=True)
    mv.append(jnp.asarray(syms), jnp.asarray(valid),
              jnp.asarray(costs))
    mv.note_production(nsamp)
    assert mv.can_decode()
    by, discr, under = mv.decode()
    by = np.asarray(by)
    assert not np.asarray(under).any()

    for c in range(C):
        host = vit.ViterbiSync(cstln, rate, fastlock=True)
        ref = host.process(syms[:, c], costs[:, c].astype(np.int64))
        n = mv.plan.nbytes
        # Same stream modulo the device's coarser election cadence:
        # compare the steady-state tail.
        tail = min(len(ref), n) // 2
        assert tail > 100
        assert np.array_equal(by[c, n - tail:n], ref[-tail:]), \
            f"channel {c}"


@pytest.mark.parametrize("rate", ["3/4", "2/3", "5/6"])
def test_multi_viterbi_all_rates_matches_host(rate):
    """Punctured rates route to the all-rate XLA-scan ACS
    (viterbi_decode_xla): byte stream == host ViterbiSync per channel,
    with per-channel sync rotations so different replicas win."""
    cstln = make_dvbs2_constellation(Predef.QPSK, rate)
    from leansdr_tpu.fec import convenc
    r = "4/6" if rate == "2/3" else rate
    C = 2
    ns = vit.make_sync_maps(cstln, r)[3]
    nsamp = 2 * P_SUB * ns + 64 * ns   # E=2: tail is post-election
    rng = np.random.default_rng(11)
    syms = np.zeros((nsamp, C), np.uint8)
    costs = np.full((nsamp, C), -40, np.int16)
    maps = vit.make_sync_maps(cstln, r)[0]
    bits_in = vit.make_trellis(r).bits_in
    nbits = nsamp // ns * bits_in // 8 * 8
    for c, rot in enumerate([0, 2]):
        data = rng.integers(0, 256, nbits // 8, dtype=np.uint8)
        cs, _ = convenc.encode(data, r, 2)
        inv = np.argsort(maps[rot])
        syms[:len(cs), c] = inv[cs]
    valid = np.ones((nsamp, C), bool)

    mv = MultiViterbiSync(cstln, r, C, nsamp, 1.0, interpret=True)
    assert mv.xla and mv.kind == "viterbi_xla"
    mv.append(jnp.asarray(syms), jnp.asarray(valid), jnp.asarray(costs))
    mv.note_production(nsamp)
    assert mv.can_decode()
    by, discr, under = mv.decode()
    by = np.asarray(by)
    assert not np.asarray(under).any()

    for c in range(C):
        host = vit.ViterbiSync(cstln, r, fastlock=True)
        ref = host.process(syms[:, c], costs[:, c].astype(np.int64))
        n = mv.plan.nbytes
        tail = min(len(ref), n) // 2
        assert tail > 40, (tail, len(ref), n)
        assert np.array_equal(by[c, n - tail:n], ref[-tail:]), \
            f"channel {c}"


def test_track_mode_policy_transitions():
    """ACQUIRE->TRACK after a stable election; TRACK->ACQUIRE when the
    tracked discriminant collapses (the TPU analogue of resync_period,
    dvb.h:1241)."""
    import numpy as np
    from leansdr_tpu.dsp.cstln import Predef, make_dvbs2_constellation
    from leansdr_tpu.fec.viterbi_device import MultiViterbiSync

    cstln = make_dvbs2_constellation(Predef.QPSK, "1/2")
    v = MultiViterbiSync(cstln, "1/2", 2, 1 << 14, 2.0)
    C, E = 2, v.plan.E
    good = np.concatenate(
        [np.full((C, E), 900, np.int32), np.zeros((C, 1), np.int32)],
        axis=1)
    under = np.zeros(C, bool)
    assert not v._want_track
    v.observe(good, under)
    v.observe(good, under)
    assert not v._want_track          # needs track_after STABLE repeats
    v.observe(good, under)
    assert v._want_track              # stable election -> track
    bad = good.copy()
    bad[0, :E] = 10                   # collapse channel 0's discriminant
    v.observe(bad, under)
    assert not v._want_track          # watchdog -> acquire
