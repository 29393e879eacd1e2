"""leandvbtx-compatible DVB-S modulator CLI (reference leandvbtx.cc).

Usage: python -m leansdr_tpu.apps.leandvbtx [options] < TS > IQ
"""

import sys

import numpy as np


def main(argv=None):
    from ..pipelines import dvbs_tx
    from ..util.iofmt import write_iq

    argv = sys.argv[1:] if argv is None else argv
    cfg = dvbs_tx.TxConfig()
    out_fmt = "f32"
    from ._dvbs_flags import CODE_RATES, CONSTELLATIONS as consts
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            return argv[i]

        if a == "-h":
            print("Usage: leandvbtx [options] < TS > IQ", file=sys.stderr)
            return 0
        elif a in ("-v", "-d"):
            pass
        elif a == "--cr":
            cfg.rate = val()
            if cfg.rate not in CODE_RATES:
                print(f"** Error while processing '{cfg.rate}'",
                      file=sys.stderr)
                return 1
        elif a == "--const":
            cfg.constellation = consts[val()]
        elif a == "-f":
            v = val()
            if "/" in v:
                cfg.interp, cfg.decim = map(int, v.split("/"))
            else:
                cfg.interp, cfg.decim = int(v), 1
        elif a == "--roll-off":
            cfg.rolloff = float(val())
        elif a == "--rrc-rej":
            cfg.rrc_rej = float(val())
        elif a == "--power":
            cfg.amp = dvbs_tx.power_to_amp(float(val()))
        elif a == "--agc":
            cfg.agc = True
        elif a == "--f32":
            out_fmt = "f32"
        elif a == "--s16":
            out_fmt = "s16"
        elif a == "--fill":
            pass   # realtime blank-packet insertion: N/A for file batch
        else:
            print(f"** Error while processing '{a}'", file=sys.stderr)
            return 1
        i += 1

    ts = sys.stdin.buffer.read()
    n = len(ts) // 188
    packets = np.frombuffer(ts[:n * 188], dtype=np.uint8).reshape(-1, 188)
    iq = dvbs_tx.modulate(packets, cfg)
    sys.stdout.buffer.write(write_iq(iq, out_fmt))
    return 0


if __name__ == "__main__":
    sys.exit(main())
