#!/usr/bin/env python
"""End-to-end cohort imputation walkthrough.

Simulates an F2 cross (swap in ``load_plantimpute`` / the other readers
for real data), hides a fraction of genotypes, runs the full inference
loop, scores the recovery, and writes the three output artifacts:
genotype-probability table, phased haplotype dump (the checkpoint
format), and founder line-origin posteriors.

    python examples/impute_cohort.py [--f2 40] [--markers 30] [--iters 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))   # repo-checkout convenience


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--f2", type=int, default=40)
    ap.add_argument("--markers", type=int, default=30)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mask-every", type=int, default=7)
    ap.add_argument("--out-prefix", default="/tmp/impute_demo")
    args = ap.parse_args(argv)

    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.io.outputs import (write_genotype_table,
                                         write_haplotype_dump,
                                         write_line_origin_table)
    from cnf2freq_tpu.utils import mask_markers, score_recovery
    from cnf2freq_tpu.utils.simulate import simulate_f2

    ped = simulate_f2(n_f2=args.f2, n_markers=args.markers,
                      missing_rate=0.05, error_rate=0.01, seed=42)
    held_out = mask_markers(ped, every=args.mask_every)
    print(f"{len(ped.dous)} analysis individuals, "
          f"{ped.num_markers} markers, "
          f"{len(held_out.masked)} genotypes hidden", file=sys.stderr)

    drv = Driver(ped, dtype=np.float32)
    drv.preprocess()
    for i in range(args.iters):
        info = drv.iterate(early=(i == 0))
        print(f"iter {i}: {info}", file=sys.stderr)

    score = score_recovery(ped, held_out)
    print(f"recovery: {score}", file=sys.stderr)

    with open(args.out_prefix + ".genotypes", "w") as f:
        write_genotype_table(ped, drv.pair_tables, f)
    with open(args.out_prefix + ".dump", "w") as f:
        write_haplotype_dump(ped, f, reset_negshift=False)
    with open(args.out_prefix + ".lineorigin", "w") as f:
        write_line_origin_table(ped, drv.line_origin_tables(), f)
    print(f"wrote {args.out_prefix}.genotypes/.dump/.lineorigin",
          file=sys.stderr)
    return 0 if score["accuracy"] > 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
