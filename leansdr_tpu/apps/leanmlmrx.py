"""leanmlmrx-compatible multi-channel FM receiver CLI (reference
src/apps/leanmlmrx.cc:760-867).

Usage: python -m leansdr_tpu.apps.leanmlmrx [options] CHANNEL ... < IQ > AUDIO
Reads int16 I/Q from stdin, writes int8 mono audio to stdout.
Channel syntax: FreqMHz | Min:Step:Max | (...) for initially muted.
"""

import struct
import sys

import numpy as np


def write_wav_header(out, fau):
    """write_wav_header (leanmlmrx.cc:513-528): 8-bit mono PCM."""
    out.write(b"RIFF" + struct.pack("<I", 0) + b"WAVE")
    out.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, int(fau),
                                    int(fau), 1, 8))
    out.write(b"data" + struct.pack("<I", 0))


def parse_channel(cfg_channels, spec, Channel):
    enabled = True
    if spec.startswith("(") and spec.endswith(")"):
        enabled = False
        spec = spec[1:-1]
    if ":" in spec:
        fmin, fstep, fmax = (float(v) for v in spec.split(":"))
        f = fmin
        while f <= fmax + 1e-9:
            cfg_channels.append(Channel(F=f * 1e6, enabled=enabled))
            f += fstep
    else:
        cfg_channels.append(Channel(F=float(spec) * 1e6, enabled=enabled))


def main(argv=None):
    from ..pipelines.mlm_rx import MlmReceiver, MlmConfig, Channel
    from ..util import info as info_mod

    argv = sys.argv[1:] if argv is None else argv
    cfg = MlmConfig()
    fd_info = -1
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            return argv[i]

        if a == "-h":
            print(__doc__, file=sys.stderr)
            return 0
        elif a == "--fs":
            cfg.Fs = float(val())
        elif a == "--fc":
            cfg.Fc = float(val())
        elif a == "-N":
            cfg.N = int(val())
        elif a == "--fq":
            cfg.Fq = float(val())
        elif a == "--maxdev":
            cfg.maxdev = float(val())
        elif a == "--deemph":
            cfg.deemph = float(val())
        elif a == "--squelch":
            cfg.squelch = float(val())
        elif a == "--fa":
            cfg.Fau = float(val())
        elif a == "--wav":
            cfg.wav = True
        elif a == "--fd-info":
            fd_info = int(val())
        elif a in ("--info-rate", "--spectrum-size", "--spectrum-zoom",
                   "--fd-control"):
            val()
        elif a == "--pmp":
            print("PMP shared-memory input is hardware-specific; "
                  "use pipe input", file=sys.stderr)
        else:
            parse_channel(cfg.channels, a, Channel)
        i += 1

    rx = MlmReceiver(cfg)
    print(f"IQ sample rate {cfg.Fs/1000:.3f} kHz", file=sys.stderr)
    print(f"Channel quadrature rate {rx.Fq/1000:.3f} kHz", file=sys.stderr)
    print(f"Audio rate {rx.Fau:.0f} Hz", file=sys.stderr)
    print(f"Realtime requires {rx.Fq:.0f} {cfg.N}-point FFTs per second "
          f"(one batched FFT per chunk here)", file=sys.stderr)

    out = sys.stdout.buffer
    if cfg.wav:
        write_wav_header(out, rx.Fau)
    CH = 1 << 20
    while True:
        raw = sys.stdin.buffer.read(CH * 4)
        if not raw:
            break
        n = len(raw) // 4 * 4
        s16 = np.frombuffer(raw[:n], dtype=np.int16).reshape(-1, 2)
        iq = (s16[:, 0].astype(np.float32)
              + 1j * s16[:, 1].astype(np.float32)).astype(np.complex64)
        au = rx.process(iq)
        if len(au):
            out.write(au.tobytes())
            out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
