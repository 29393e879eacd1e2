"""DVB-S energy-dispersal PRBS (de)randomizer.

Mirrors randomizer/derandomizer (reference dvb.h:1063-1163): the
EN 300 421 section 4.4.1 PRBS 1+x^14+x^15 seeded 000251, precomputed as a
188*8-byte pattern with the sync-byte inversion/inhibition rules.  The XOR
itself is a trivially vectorized op over [npackets, 188] byte arrays;
resynchronization (on inverted sync bytes) is data-dependent but operates
at packet rate, expressed with a small scan over packets.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

MPEG_SYNC = 0x47
MPEG_SYNC_INV = MPEG_SYNC ^ 0xFF           # 0xB8
MPEG_SYNC_CORRUPTED = 0x55
TS_SIZE = 188


@lru_cache(maxsize=None)
def prbs_pattern() -> np.ndarray:
    """The 188*8-byte pattern (dvb.h:1072-1085).

    pattern[0] = 0xff (sync inversion); PRBS bytes elsewhere, zeroed on the
    7 other sync-byte positions (inhibited but still clocked).
    """
    pat = np.zeros(188 * 8, dtype=np.uint8)
    pat[0] = 0xFF
    st = 0o000251
    for i in range(1, 188 * 8):
        out = 0
        for _ in range(8):
            bit = ((st >> 13) ^ (st >> 14)) & 1
            out = ((out << 1) | bit) & 0xFF
            st = ((st << 1) | bit) & 0xFFFF
        pat[i] = out if (i % 188) else 0
    return pat


def randomize(packets: np.ndarray, start_phase: int = 0):
    """TX randomizer over a [n, 188] u8 array starting at 8-packet phase
    `start_phase`. Returns (out, next_phase)."""
    n = packets.shape[0]
    pat = prbs_pattern().reshape(8, 188)
    phases = (start_phase + np.arange(n)) % 8
    out = packets ^ pat[phases]
    return out, int((start_phase + n) % 8)


def derandomize_scan(packets: jnp.ndarray, pos0: jnp.ndarray):
    """RX derandomizer (dvb.h:1130-1157) over [n,188] u8 packets.

    Carries the pattern position (0..7, in packets) across the stream;
    resynchronizes to 0 when the incoming sync byte is MPEG_SYNC_INV or its
    corrupted marker. Returns (out [n,188], tei_or_drop mask, next pos).
    The caller drops packets whose descrambled sync != 0x47 and sets the
    TEI bit, as the reference does.
    """
    pat = jnp.asarray(prbs_pattern().reshape(8, 188))

    def step(pos, pkt):
        sync_in = pkt[0]
        resync = (sync_in == MPEG_SYNC_INV) | (
            sync_in == (MPEG_SYNC_INV ^ MPEG_SYNC_CORRUPTED))
        pos = jnp.where(resync, 0, pos)
        out = pkt ^ pat[pos]
        return (pos + 1) % 8, out

    next_pos, out = jax.lax.scan(step, pos0, packets)
    good = out[:, 0] == MPEG_SYNC
    return out, good, next_pos


def derandomize_np(packets: np.ndarray, pos: int = 0):
    """Vectorized host derandomizer (dvb.h:1130-1157).

    Returns (out_packets [n,188], good_mask [n], next_pos). Bad packets
    get the TEI bit set, mirroring dvb.h:1146-1156; the caller drops them
    via the mask.

    The sequential position recurrence (reset to 0 on inverted sync,
    else +1 mod 8) vectorizes as distance-to-last-resync: pos[i] =
    (i - last_resync_at_or_before_i) %% 8, falling back to the carried-in
    phase before the first resync.
    """
    packets = np.atleast_2d(packets)
    n = packets.shape[0]
    if n == 0:
        return packets.copy(), np.zeros(0, bool), pos
    pat = prbs_pattern().reshape(8, 188)
    sync_in = packets[:, 0]
    resync = (sync_in == MPEG_SYNC_INV) | (
        sync_in == (MPEG_SYNC_INV ^ MPEG_SYNC_CORRUPTED))
    idx = np.arange(n)
    last = np.maximum.accumulate(np.where(resync, idx, -1))
    positions = np.where(last >= 0, (idx - last) % 8, (pos + idx) % 8)
    out = packets ^ pat[positions]
    good = out[:, 0] == MPEG_SYNC
    out[~good, 1] |= 0x80  # Transport Error Indicator
    next_pos = int((positions[-1] + 1) % 8)
    return out, good, next_pos
