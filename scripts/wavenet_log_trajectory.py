"""Summarize a train_vocoder WaveNet log into an NLL trajectory table.

Parses `[wavenet] iter X/CHUNK nll V` lines, averages per bucket of
--every run-local iterations, and prints rows as `total_iters mean_nll n`
where total_iters = --offset + run-local (offset = init artifact iters +
any restored optimizer count, i.e. the run's true starting position).

Watchdog logs contain multiple trainer legs whose iter/checkpoint counters
reset per restart; pass --num_iters (the watchdog's leg budget) so the
`[watchdog] attempt k: ... remaining=R` lines re-base each leg at
num_iters - R run-local iterations.

Usage: python scripts/wavenet_log_trajectory.py /tmp/wavenet_r4b.log \
           --offset 50000 --every 10000 [--num_iters 110000]
"""

from __future__ import annotations

import argparse
import re


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log")
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--every", type=int, default=10000)
    ap.add_argument("--num_iters", type=int, default=None,
                    help="watchdog leg budget, enables cross-restart re-basing")
    args = ap.parse_args(argv)

    iter_re = re.compile(r"\[wavenet\] iter (\d+)/(\d+) nll ([\d.]+)")
    ckpt_re = re.compile(r"checkpointed .* @ (\d+)/")
    rem_re = re.compile(r"\[watchdog\] attempt \d+: .* remaining=(\d+)")
    base = 0  # run-local iters completed before the current log chunk
    leg_base = 0  # run-local iters completed before the current trainer leg
    buckets: dict[int, list[float]] = {}
    for line in open(args.log):
        m = iter_re.search(line)
        if m:
            run_local = base + int(m.group(1))
            b = (args.offset + run_local - 1) // args.every
            buckets.setdefault(b, []).append(float(m.group(3)))
            continue
        m = ckpt_re.search(line)
        if m:
            base = leg_base + int(m.group(1))
            continue
        m = rem_re.search(line)
        if m and args.num_iters is not None:
            leg_base = args.num_iters - int(m.group(1))
            base = leg_base
    for b in sorted(buckets):
        vals = buckets[b]
        print(f"{(b + 1) * args.every:>8}  nll {sum(vals)/len(vals):.3f}  (n={len(vals)})")


if __name__ == "__main__":
    main()
