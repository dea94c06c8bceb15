"""Repeated seeded cross-validation on the 2016 US election county data —
the analog of the reference's replication protocol
(``examples/cv_election2016.R:9-45``): ptesting=20 (80/20 split),
Neig=50, one run per seed, an overview row per replicate, with running
CSV/JSON dumps so partial sweeps survive interruption.

The reference script uses the CENSUS covariates
(``examples/data2016GEcensus.csv``, 3106 counties × 19: y = GOPdelta,
X = 17 census covariates incl. 9 region dummies) — NOT the 68-column
county file, whose 49 state dummies go constant in 80% subsamples and
fail the pre-flight check.  Point ``--csv`` elsewhere for your own copy.

Run:  python examples/election2016_cv.py [--startseed 1] [--nreps 3]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))  # run from a repo checkout

import bigkrls_tpu as bk

DEFAULT_CSV = "/root/reference/examples/data2016GEcensus.csv"

ap = argparse.ArgumentParser()
ap.add_argument("--csv", default=DEFAULT_CSV)
ap.add_argument("--startseed", type=int, default=1)
ap.add_argument("--nreps", type=int, default=3)
ap.add_argument("--neig", type=int, default=50)
ap.add_argument("--out", default=None,
                help="overview CSV path (default cv_seeds_<range>.csv)")
args = ap.parse_args()

d = np.genfromtxt(args.csv, delimiter=",", skip_header=1)
# census file: col 0 is a quoted row number (NaN under genfromtxt),
# col 1 = GOPdelta, cols 2.. = covariates (cv_election2016.R:13-14)
y, X = d[:, 1], d[:, 2:]
print(f"data: {os.path.basename(args.csv)}  N={X.shape[0]} P={X.shape[1]}")

seeds = range(args.startseed, args.startseed + args.nreps)
out = args.out or f"cv_seeds_{args.startseed}_to_{seeds[-1]}.csv"

rows = []
for seed in seeds:
    cv = bk.crossvalidate(y, X, ptesting=20, seed=seed, neig=args.neig,
                          noisy=False)
    row = {"seed": seed, **{k: round(float(v), 6)
                            for k, v in cv.metrics.items()}}
    rows.append(row)
    print(json.dumps(row))
    # running dump, like the reference's per-iteration write.csv (:39-43)
    with open(out, "w") as f:
        f.write(",".join(rows[0]) + "\n")
        for r in rows:
            f.write(",".join(str(r[k]) for k in rows[0]) + "\n")

oos = np.array([r["pseudoR2_oos"] for r in rows])
print(f"\noos pseudo-R² over {len(rows)} replicates: "
      f"mean {oos.mean():.4f}  sd {oos.std(ddof=1) if len(oos) > 1 else 0.0:.4f}")
print(f"overview written to {out}")
