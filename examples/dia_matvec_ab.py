"""DIA matvec A/B: XLA shifted-slice form vs the halo-tiled Pallas kernel.

Times `fem.dia.dia_matvec` (D=15 dynamic slices over the padded (N,F)
buffer) against `dia_matvec_pallas` (one DMA of tile+halo into VMEM,
all diagonals applied in-VMEM) on the headline sweep shape — the
reproducible artifact behind the kernel-choice notes in fem/dia.py.

Axon-tunnel rules (CLAUDE.md): complex inputs are built inside jit from
real planes, timing fetches a real scalar from a K-iteration in-jit loop
(block_until_ready does not sync on the remote backend), correctness is
compared through the interleaved float view.

    python examples/dia_matvec_ab.py                 # chip, n=20, F=2048
    python examples/dia_matvec_ab.py --tiles 256x512 512x256
"""

import argparse
import os as _os, sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--freqs", type=int, default=2048)
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--iters", type=int, default=50, help="matvecs per timed jit loop")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--tiles", nargs="*", default=["256x512"],
                    help="tile_nxlane_tile pairs for the Pallas variant")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mathaudio_tpu.fem.assembly import HelmholtzAssembler
    from mathaudio_tpu.fem.dia import dia_matvec, dia_matvec_pallas, dia_tables_of
    from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra

    mesh = unit_cube_tetrahedra(args.n)
    asm = HelmholtzAssembler(mesh)
    offsets, tables = dia_tables_of(asm, jnp.zeros_like(asm.k_vals))
    tables = jax.tree.map(lambda t: jnp.asarray(np.asarray(t), jnp.float32), tables)
    n = int(tables.k.shape[1])
    f = args.freqs
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    cmr = jnp.asarray(rng.uniform(1.0, 4.0, f), jnp.float32)
    cbi = jnp.asarray(rng.uniform(0.1, 0.5, f), jnp.float32)
    gbytes = (2 * n * f * 8) / 1e9  # x read + y write, c64

    def make(mv):
        def once(xr, xi, cmr, cbi):
            x = jax.lax.complex(xr, xi)
            cm = jax.lax.complex(cmr, jnp.zeros_like(cmr))
            cb = jax.lax.complex(jnp.zeros_like(cbi), cbi)
            return mv(offsets, tables, cm, cb, x).view(jnp.float32)

        def loop(xr, xi, cmr, cbi):
            x = jax.lax.complex(xr, xi)
            cm = jax.lax.complex(cmr, jnp.zeros_like(cmr))
            cb = jax.lax.complex(jnp.zeros_like(cbi), cbi)

            def body(i, acc):
                s = (1.0 + 1e-6 * i).astype(jnp.complex64)
                y = mv(offsets, tables, cm, cb, x * s)
                return acc + jnp.sum(jnp.abs(y) ** 2) * (1e-12 / (1.0 + i))

            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        return jax.jit(once), jax.jit(loop)

    def timed(mv, label, y_ref=None):
        once, loop = make(mv)
        try:
            y = np.asarray(once(xr, xi, cmr, cbi))
            float(loop(xr, xi, cmr, cbi))  # compile + warm
        except Exception as e:  # noqa: BLE001 — report compile failures in the table
            print(f"{label:>24}: FAILED {type(e).__name__}: {str(e)[:140]}")
            return None
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(loop(xr, xi, cmr, cbi))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3 / args.iters
        line = f"{label:>24}: {ms:7.3f} ms/matvec   {gbytes/ms*1e3:6.0f} GB/s (x+y only)"
        if y_ref is not None:
            rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
            line += f"   rel vs xla {rel:.2e}"
        print(line)
        return ms, y

    res = timed(dia_matvec, "xla shifted-slice")
    if res is None:
        return 1
    ms_x, y_ref = res
    for spec in args.tiles:
        tn, lt = (int(s) for s in spec.split("x"))

        def mv_p(offs, tabs, cm, cb, x, tn=tn, lt=lt):
            return dia_matvec_pallas(offs, tabs, cm, cb, x, tile_n=tn, lane_tile=lt)

        r = timed(mv_p, f"pallas {spec}", y_ref)
        if r is not None:
            print(f"{'':>24}  speedup {ms_x / r[0]:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
