#!/usr/bin/env python
"""Segmented-demod chain sweep (docs/PERF.md "Segmented demod").

Measures the full-chain per-chip throughput (bench._chain_bench: RRC mf
+ demod kernel + ring + device Viterbi + packed fetch) at the
north-star 64-channel shape for segments in {1, 2, 4, 8}, per rate.
The demod kernel's per-step cost at fleet shapes is issue/latency-bound
(tools/bench_lane_shadow.py: 8x lanes for +25% wall), so splitting each
channel's chunk into S lane-parallel segments should cut the demod
stage's wall near-S-fold at the cost of S*(warmup+readahead) extra
samples (~3% at S=4, W=2048).

Usage: python tools/bench_segmented.py [nchan] [rates...]
Prints one JSON line per (rate, segments).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    sys.path.insert(0, str(REPO))
    import bench
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    nchan = int(args[0]) if args else 64
    rates = args[1:] or ["1/2", "3/4", "7/8"]
    for rate in rates:
        base = None
        for S in (1, 2, 4, 8):
            if S * nchan > 1024:
                continue
            try:
                v = bench._chain_bench(rate=rate, nchan=nchan, segments=S)
            except Exception as e:
                print(json.dumps({"rate": rate, "segments": S,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            if S == 1:
                base = v
            print(json.dumps({
                "metric": "chain_msps_per_chip", "rate": rate,
                "nchan": nchan, "segments": S, "value": round(v, 1),
                "vs_seq": round(v / base, 2) if base else None,
            }), flush=True)


if __name__ == "__main__":
    main()
