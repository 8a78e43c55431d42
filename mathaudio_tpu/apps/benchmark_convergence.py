"""Strategy x function convergence sweep
(math-differential-evolution/bench/benchmark_convergence.rs): runs every
selected strategy on every selected function, records best-so-far traces
to CSV and a summary JSON."""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

from mathaudio_tpu.optim import DEConfig, Strategy, differential_evolution
from mathaudio_tpu.testfunctions import FUNCTIONS, list_functions

DEFAULT_STRATEGIES = ["best1bin", "rand1bin", "currenttobest1bin", "randtobest1bin", "adaptivebin"]
DEFAULT_FUNCTIONS = [
    "sphere", "rosenbrock", "rastrigin", "ackley", "griewank", "levy",
    "schwefel", "zakharov", "styblinski_tang2", "branin", "goldstein_price",
    "himmelblau", "booth", "beale", "matyas", "six_hump_camel",
]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="benchmark-convergence")
    ap.add_argument("-o", "--out-dir", default="de_benchmark")
    ap.add_argument("--strategies", nargs="*", default=DEFAULT_STRATEGIES)
    ap.add_argument("--functions", nargs="*", default=DEFAULT_FUNCTIONS)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tol", type=float, default=0.0)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    rows = []
    for fname in args.functions:
        if fname not in FUNCTIONS:
            print(f"skipping unknown function {fname}", file=sys.stderr)
            continue
        fn, meta = FUNCTIONS[fname]
        expected = meta.global_minima[0][1] if meta.global_minima else np.nan
        for strat in args.strategies:
            traces = []

            def cb(inter, traces=traces):
                traces.append((inter.iter, inter.fun, inter.convergence))
                from mathaudio_tpu.optim import CallbackAction

                return CallbackAction.CONTINUE

            cfg = DEConfig(
                maxiter=args.maxiter,
                seed=args.seed,
                tol=args.tol,
                strategy=Strategy.from_str(strat),
                callback=cb,
            )
            for g in meta.inequality_constraints:
                cfg.penalty_ineq.append((g, 1e6))
            t0 = time.perf_counter()
            rep = differential_evolution(fn, meta.bounds, config=cfg)
            wall = time.perf_counter() - t0
            err = abs(rep.fun - expected) if np.isfinite(expected) else np.nan
            rows.append(
                {
                    "function": fname,
                    "strategy": strat,
                    "fun": rep.fun,
                    "error": err,
                    "nit": rep.nit,
                    "nfev": rep.nfev,
                    "wall_s": wall,
                }
            )
            trace_path = os.path.join(args.out_dir, f"{fname}_{strat}.csv")
            with open(trace_path, "w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["iter", "best", "convergence"])
                w.writerows(traces)
            print(
                f"{fname:28s} {strat:20s} f={rep.fun:.3e} err={err:.2e} "
                f"nfev={rep.nfev} ({wall:.1f}s)",
                file=sys.stderr,
            )

    with open(os.path.join(args.out_dir, "summary.json"), "w") as fh:
        json.dump(rows, fh, indent=2)
    solved = sum(1 for r in rows if r["error"] < 1e-3)
    print(f"solved to 1e-3: {solved}/{len(rows)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
