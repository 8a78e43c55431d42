"""FEM sweep scaling curve in the bench configuration — the repo's
equivalent of the reference's unit-cube scaling bench
(math-fem/benches/helmholtz_3d_scaling.rs:42-70, n = 4..12, 6n^3 tets),
extended to the TPU bench sizes and used to diagnose the n=24 per-DoF
cliff (VERDICT r1 weak item 3).

Runs the exact bench.py MG-GMRES workload per mesh size and prints
DoF-solves/s; `--levels` exposes the multigrid depth (at n>=24 the
3-level coarse inverse is a (2*729)^2 dense matmul — past the axon
~432^2 per-op cliff — and a 4th level restores the per-DoF rate).

    python examples/fem_scaling_curve.py --ns 8 12 16 20 24 --freqs 1024
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (bench.py)

from bench import run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*", default=[8, 12, 16, 20, 24])
    ap.add_argument("--freqs", type=int, default=1024)
    ap.add_argument("--anchors", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="*", default=None,
                    help="per-n multigrid levels (default: 3, except 4 when n%8==0 and "
                         "n>=24 — a 4th level needs n divisible by 8; n=28 stays at 3 "
                         "and sits on the >=512^2 coarse-matmul cliff, see bench.py)")
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--sweep", default="nm", choices=["vmapped", "nm"],
                    help="sweep layout (nm = the node-major bench default)")
    ap.add_argument("--freq-chunk", type=int, default=2048,
                    help="node-major frequency streaming chunk (matches the "
                         "bench.py CLI default; bounds HBM so wide bands "
                         "can't OOM; 0 = unchunked; ignored for --sweep "
                         "vmapped, which has no chunked path)")
    ap.add_argument("--json", default=None,
                    help="write the curve as a JSON artifact (list of rows)")
    args = ap.parse_args()

    levels = args.levels or [4 if (n >= 24 and n % 8 == 0) else 3 for n in args.ns]
    rows = []
    for n, lv in zip(args.ns, levels):
        # orth/freq_chunk only exist on the node-major path; the vmapped
        # branch of bench.run builds model.sweep_fn without either knob.
        nm_kwargs = (
            {"orth": "cgs1", "freq_chunk": args.freq_chunk}
            if args.sweep == "nm"
            else {}
        )
        out = run(args.device, n, args.freqs, args.repeats, calibrate=False,
                  anchors=args.anchors, levels=lv, sweep_layout=args.sweep,
                  **nm_kwargs)
        rows.append((n, lv, out["value"]))
    print(f"\n{'n':>4} {'levels':>7} {'DoF-solves/s':>14}  (freqs={args.freqs}, "
          f"sweep={args.sweep})")
    for n, lv, v in rows:
        print(f"{n:>4} {lv:>7} {v:>14.3e}")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(
                {
                    "harness": "examples/fem_scaling_curve.py",
                    "reference_analog": "math-fem/benches/helmholtz_3d_scaling.rs:42-70",
                    "device": args.device,
                    "sweep_layout": args.sweep,
                    "freqs": args.freqs,
                    "anchors": args.anchors,
                    "rows": [
                        {"n": n, "tets": 6 * n**3, "nodes": (n + 1) ** 3,
                         "levels": lv, "dof_solves_per_s": v}
                        for n, lv, v in rows
                    ],
                },
                f,
                indent=1,
            )
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
