"""Summarize a train_vocoder WaveNet log into an NLL trajectory table.

Parses `[wavenet] iter X/CHUNK nll V` lines, averages per bucket of
--every run-local iterations, and prints rows as `total_iters mean_nll n`
where total_iters = --offset + run-local (offset = init artifact iters +
any restored optimizer count, i.e. the run's true starting position).

Usage: python scripts/wavenet_log_trajectory.py /tmp/wavenet_r4b.log \
           --offset 50000 --every 10000
"""

from __future__ import annotations

import argparse
import re


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log")
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--every", type=int, default=10000)
    args = ap.parse_args(argv)

    iter_re = re.compile(r"\[wavenet\] iter (\d+)/(\d+) nll ([\d.]+)")
    ckpt_re = re.compile(r"checkpointed .* @ (\d+)/")
    base = 0
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
            base = int(m.group(1))
    for b in sorted(buckets):
        vals = buckets[b]
        print(f"{(b + 1) * args.every:>8}  nll {sum(vals)/len(vals):.3f}  (n={len(vals)})")


if __name__ == "__main__":
    main()
