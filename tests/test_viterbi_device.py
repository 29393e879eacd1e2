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


@pytest.mark.parametrize("rate", ["3/4", "7/8", "5/6"])
def test_banked_acs_matches_host_bank(rate):
    """Banked punctured-rate kernel (fec/viterbi_banked.py) ==
    ViterbiBank bit-for-bit — metrics, 64-bit register-exchange paths,
    decoded symbols, discriminants — with coarse costs forcing ties."""
    from leansdr_tpu.fec import viterbi_banked as vb
    geo = vb.bank_geometry(rate)
    t = vit.make_trellis(rate)
    T, N = vb.P_SUB, 128
    rng = np.random.default_rng(11)
    cs = rng.integers(0, t.ncs, (T, N)).astype(np.int32)
    cost = -(rng.integers(0, 4, (T, N)) * 3).astype(np.int32)

    m2, h2, l2, us, q = vb.viterbi_acs_banked(
        rate, jnp.zeros((64, N), jnp.int32),
        jnp.zeros((64, N), jnp.int32), jnp.zeros((64, N), jnp.int32),
        jnp.asarray(cs), jnp.asarray(cost), interpret=True)
    us = np.asarray(us)
    q = np.asarray(q)

    bank = vit.ViterbiBank(t, N)
    idx = np.arange(N)
    for tt in range(T):
        bus, bq = bank.update(idx, cs[tt].astype(np.int64),
                              cost[tt].astype(np.int64))
        assert np.array_equal(us[tt], bus), f"us mismatch at block {tt}"
        assert np.array_equal(q[tt], bq), f"q mismatch at block {tt}"
    # Planes are stored under the bank permutation geo.orig.
    assert np.array_equal(np.asarray(m2),
                          bank.cost[:, geo.orig].T.astype(np.int32))
    p64 = ((np.asarray(h2).astype(np.uint32).astype(np.uint64) << 32)
           | np.asarray(l2).astype(np.uint32))
    nbits, depth = vit.PATH_SPEC[rate]
    pmask = np.uint64((1 << min(63, nbits * depth)) - 1)
    assert np.array_equal(p64 & pmask,
                          (bank.path[:, geo.orig].T & pmask))


def test_banked_acs_rowsplit_matches_host_bank():
    """Row-split B=7 kernel (states across the lane-halves) ==
    ViterbiBank bit-for-bit, coarse costs forcing ties; the tiled
    layout replicates 64 channels into both halves."""
    from leansdr_tpu.fec import viterbi_banked as vb
    rate = "7/8"
    geo = vb.bank_geometry(rate)
    t = vit.make_trellis(rate)
    T, C = vb.P_SUB, 64
    rng = np.random.default_rng(13)
    cs = rng.integers(0, t.ncs, (T, C)).astype(np.int32)
    cost = -(rng.integers(0, 4, (T, C)) * 3).astype(np.int32)
    cs_t = np.tile(cs, (1, 2))
    cost_t = np.tile(cost, (1, 2))

    m2, h2, l2, us, q = vb.viterbi_acs_banked(
        rate, jnp.zeros((64, 128), jnp.int32),
        jnp.zeros((64, 128), jnp.int32), jnp.zeros((64, 128), jnp.int32),
        jnp.asarray(cs_t), jnp.asarray(cost_t), interpret=True,
        rowsplit=True)
    us = np.asarray(us)[:, :C]
    q = np.asarray(q)[:, :C]

    bank = vit.ViterbiBank(t, C)
    idx = np.arange(C)
    for tt in range(T):
        bus, bq = bank.update(idx, cs[tt].astype(np.int64),
                              cost[tt].astype(np.int64))
        assert np.array_equal(us[tt], bus), f"us mismatch at block {tt}"
        assert np.array_equal(q[tt], bq), f"q mismatch at block {tt}"
    assert np.array_equal(np.asarray(m2)[:, :C],
                          bank.cost[:, geo.orig].T.astype(np.int32))
    # Both lane-halves carry identical unpacked planes.
    assert np.array_equal(np.asarray(m2)[:, :64], np.asarray(m2)[:, 64:])
    p64 = ((np.asarray(h2)[:, :C].astype(np.uint32).astype(np.uint64)
            << 32) | np.asarray(l2)[:, :C].astype(np.uint32))
    nbits, depth = vit.PATH_SPEC[rate]
    pmask = np.uint64((1 << min(63, nbits * depth)) - 1)
    assert np.array_equal(p64 & pmask,
                          (bank.path[:, geo.orig].T & pmask))


def test_rowsplit_track_decode_matches_bank():
    """TRACK-mode fleet decode through the ROW-SPLIT kernel (7/8 at 40
    channels: slot 64, channels tiled across the lane-halves) == the
    host ViterbiBank driven on the tracked block inputs."""
    from leansdr_tpu.fec.viterbi_device import (
        MultiViterbiSync, _punctured_block_inputs_tracked)
    rate, C = "7/8", 40
    cstln = make_dvbs2_constellation(Predef.QPSK, rate)
    t = vit.make_trellis(rate)
    nsamp = 1 << 14
    rng = np.random.default_rng(17)
    b = MultiViterbiSync(cstln, rate, C, nsamp, 2.0, banked=True,
                         interpret=True)
    b._want_track = True
    b.apply_pending_transition()
    assert b.track and b.plan_dec.nsyncs == 1
    plan = b.plan_dec
    n = plan.needed
    sym = rng.integers(0, 4, (n, C)).astype(np.uint8)
    cost = -(rng.integers(0, 4, (n, C)) * 3).astype(np.int16)
    b.append(jnp.asarray(sym), jnp.asarray(np.ones((n, C), bool)),
             jnp.asarray(cost))
    by, dsel, under = b.decode()
    assert not np.asarray(under).any()

    cs, co = _punctured_block_inputs_tracked(
        plan, b.maps, jnp.asarray(sym.astype(np.int32)),
        jnp.asarray(cost.astype(np.int32)),
        jnp.zeros(C, jnp.int32))
    cs, co = np.asarray(cs), np.asarray(co)
    bank = vit.ViterbiBank(t, C)
    idx = np.arange(C)
    uss = np.stack([bank.update(idx, cs[tt].astype(np.int64),
                                co[tt].astype(np.int64))[0]
                    for tt in range(plan.nblocks)])      # [T, C]
    bits_in = t.bits_in
    shifts = np.arange(bits_in - 1, -1, -1)
    bits = ((uss.T[:, :, None] >> shifts) & 1).reshape(
        C, plan.nblocks * bits_in)
    w = 1 << np.arange(7, -1, -1)
    exp = (bits.reshape(C, -1, 8) * w).sum(axis=2).astype(np.uint8)
    assert np.array_equal(np.asarray(by), exp)


@pytest.mark.parametrize("rate,C", [("3/4", 3), ("7/8", 3)])
def test_banked_fleet_decode_matches_xla(rate, C):
    """viterbi_decode_banked == viterbi_decode_xla (both exact vs the
    host bank) through the full fleet decode wrapper — bytes,
    discriminants and elections — plus a TRACK-mode transition."""
    cstln = make_dvbs2_constellation(Predef.QPSK, rate)
    nsamp = 1 << 14
    rng = np.random.default_rng(5)
    a = MultiViterbiSync(cstln, rate, C, nsamp, 2.0, banked=False)
    b = MultiViterbiSync(cstln, rate, C, nsamp, 2.0, banked=True,
                         interpret=True)
    for it in range(3):
        n = a.plan.consumed + (a.plan.nshifts if it == 0 else 0)
        sym = rng.integers(0, 4, (n, C)).astype(np.uint8)
        val = np.ones((n, C), bool)
        cost = -(rng.integers(0, 4, (n, C)) * 3).astype(np.int16)
        for x in (a, b):
            x.append(jnp.asarray(sym), jnp.asarray(val),
                     jnp.asarray(cost))
        by_a, d_a, u_a = a.decode()
        by_b, d_b, u_b = b.decode()
        assert np.array_equal(np.asarray(u_a), np.asarray(u_b))
        assert np.array_equal(np.asarray(by_a), np.asarray(by_b))
        assert np.array_equal(np.asarray(d_a), np.asarray(d_b))
    b._want_track = True
    b.apply_pending_transition()
    assert b.track and b.plan_dec.nsyncs == 1
    n = b.plan_track.consumed
    sym = rng.integers(0, 4, (n, C)).astype(np.uint8)
    cost = -(rng.integers(0, 4, (n, C)) * 3).astype(np.int16)
    b.append(jnp.asarray(sym), jnp.asarray(np.ones((n, C), bool)),
             jnp.asarray(cost))
    by_t, d_t, u_t = b.decode()
    assert by_t.shape == (C, b.plan_track.nbytes)
    assert not np.asarray(u_t).any()


@pytest.mark.parametrize("rate", ["3/4", "7/8"])
def test_tracked_block_inputs_match_gather(rate):
    """TRACK-mode elected-only block inputs
    (_punctured_block_inputs_tracked) == the all-replica stack gathered
    at tsync, for every possible per-channel election."""
    from leansdr_tpu.fec.viterbi_device import (
        ViterbiPlan, _punctured_block_inputs,
        _punctured_block_inputs_tracked, P_SUB)
    from leansdr_tpu.fec.viterbi import make_trellis
    t = make_trellis(rate)
    ns = t.bits_out // 2
    M = 4
    C = M * ns                       # one channel per possible election
    plan = ViterbiPlan(rate, C, P_SUB * ns, ns, 1, 4 * P_SUB * ns)
    full = ViterbiPlan(rate, C, plan.nsamp, ns, 1, plan.cap,
                       nsyncs=M * ns)
    track = ViterbiPlan(rate, C, plan.nsamp, ns, 1, plan.cap, nsyncs=1)
    cstln = make_dvbs2_constellation(Predef.QPSK, rate)
    from leansdr_tpu.fec.viterbi_device import make_sync_maps
    maps, _, _, _ = make_sync_maps(cstln, rate)
    maps = tuple(tuple(int(v) for v in row) for row in maps)
    rng = np.random.default_rng(11)
    win_sym = jnp.asarray(
        rng.integers(0, 4, (plan.needed, C), dtype=np.int64), jnp.int32)
    win_cost = jnp.asarray(
        -rng.integers(0, 50, (plan.needed, C), dtype=np.int64),
        jnp.int32)
    tsync = jnp.arange(C, dtype=jnp.int32)
    cs_a, cost_a = _punctured_block_inputs(full, maps, win_sym, win_cost)
    ref_cs = np.take_along_axis(np.asarray(cs_a),
                                np.arange(C)[None, :, None], axis=2)[..., 0]
    ref_cost = np.take_along_axis(np.asarray(cost_a),
                                  np.arange(C)[None, :, None],
                                  axis=2)[..., 0]
    cs, cost = _punctured_block_inputs_tracked(track, maps, win_sym,
                                               win_cost, tsync)
    assert np.array_equal(np.asarray(cs), ref_cs)
    assert np.array_equal(np.asarray(cost), ref_cost)


def test_banked_fleet_e2e_decodes_ts():
    """Real DVB-S 3/4 stimulus through MultiDvbsReceiver with the
    banked kernel (interpret): payload-verified TS out."""
    from leansdr_tpu.pipelines import tsgen, dvbs_tx
    from leansdr_tpu.pipelines.dvbs_rx import RxConfig
    from leansdr_tpu.pipelines.multi_rx import MultiDvbsReceiver

    C, CH = 2, 1 << 15
    pkts = [tsgen.generate(60, start=777 * c) for c in range(C)]
    iqs = [dvbs_tx.modulate(p, dvbs_tx.TxConfig(rate="3/4", interp=2))
           for p in pkts]
    rx = MultiDvbsReceiver(
        RxConfig(Fs=4e6, Fm=2e6, rate="3/4", fastlock=True,
                 float_scale=75.0, exact_lut=False, viterbi=True),
        C, chunk_samples=CH)
    # Swap in the banked path (CPU default is XLA; interpret kernel).
    rx.deconv = type(rx.deconv)(rx.cstln, "3/4", C, CH, 2.0,
                                banked=True, interpret=True)
    assert rx.deconv.kind == "viterbi_banked"
    ra = rx.params.readahead + (len(rx.mf_taps) - 1
                                if rx.mf_taps is not None else 0)
    n = (min(len(q) for q in iqs) - ra) // CH * CH
    x = np.stack([q[:n + ra] for q in iqs]) * np.float32(75.0)
    decoded = verified = 0
    for o in range(0, n, CH):
        for c, ts in enumerate(rx.process(
                jnp.asarray(x[:, o:o + CH + ra]))):
            decoded += len(ts)
            verified += sum(1 for p in ts
                            if (pkts[c] == p).all(axis=1).any())
    assert decoded >= C * 8, decoded
    assert verified >= decoded * 2 // 3, (decoded, verified)
