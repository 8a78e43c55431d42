"""Headline benchmark: FEM Helmholtz room frequency sweep (assembly +
preconditioned GMRES), DoF-solves per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (matches BASELINE.md north-star "Helmholtz FEM assembly DoF/s +
GMRES solve wall-clock"): unit-cube tet mesh, absorbing walls, Gaussian
source, batch of wavenumbers swept in one jit (fused per-frequency
assembly K - k^2 M + ik alpha B + Jacobi-GMRES), f32/c64 on TPU.

vs_baseline: ratio against the same harness on this host's CPU in f64
(the reference implementation is Rust+rayon+OpenBLAS on CPU; jax-CPU f64
on all cores is the closest runnable stand-in — measured once with
`python bench.py --device cpu --calibrate`, value recorded below).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Measured on this host: `python bench.py --device cpu --calibrate`
# (n=20, f64 all cores, identical final algorithm incl. nu=1/restart=7
# and the explicit-inverse coarse solve; the CPU runs BEST at
# 16-frequency batches and the baseline uses the CPU's best
# configuration, not the matched batch). TPU milestones on the same
# workload: 3.1M (128 freqs, restart=8, nu=2) -> 5.6M (1024-freq batch,
# one-cycle restart) -> 9.6M (explicit-inverse coarse solve) -> 11.0M
# (omega=1, nu=1 smoothing) -> 11.75M (2048-freq batch; 4096 exceeds the
# 16G HBM at 26G, n=24 mesh is slower per DoF) -> 21.4M (64 anchored
# coarse inverses shared across the batch; the batched per-frequency
# 432^2 inverse was 48% of sweep time) -> 29.5M (GMRES reuses M*b as the
# initial residual, cutting a V-cycle + matvec per solve; per-frequency system/
# level values built by one fused combine of frequency-shared ELL
# tables instead of batched scatters; anchor inverses via a
# Newton-Schulz chain instead of latency-bound batched LU inversion;
# convergence decided on the Givens residual so no marginal lane drags
# the whole vmapped batch through a second restart cycle) -> 30.8M
# (16 anchors = 128-frequency chunks: nested anchor x chunk vmap keeps
# the chunk in whole 128-lane tiles and turns the coarse apply into an
# MXU matmul against one shared inverse) -> 39.1M (first GMRES restart
# cycle unrolled out of the while loop, so the restart residual — one
# matvec + one V-cycle — is only computed when a second cycle actually
# runs, which the bench band never needs) -> 51.9M (node-major layout:
# (N, F) arrays with the frequency axis in lanes, DIA streaming matvecs
# instead of per-frequency gathers — 716 vs 142 GB/s effective on the
# SpMV, models/room_sweep_nm.py; now the default --sweep layout). The
# CPU baseline runs the same harness at the CPU's best configuration,
# re-measured after each algorithm change since the improvements apply
# to the CPU too (currently 16-freq batches with 4 Schulz-chained anchor
# inverses; --device cpu --calibrate --freqs 16 --anchors 4 reproduces
# it; the old per-frequency-inverse best was 1.035e5). The node-major
# layout was calibrated on CPU too and does NOT beat the vmapped CPU
# best (6.5e4 at 16 freqs, 1.539e5 — a tie — at 128), so the baseline
# value is layout-independent.
#
# Knob scans that did NOT raise the headline (recorded so they are not
# re-tried): nu_post=0 removes 1 of the 3 big gather-matvec passes per
# iteration but the lockstep max iteration count rises 6 -> 10 (measured
# on the bench band, n=16/128 freqs) — net zero; shifted-Laplacian beta2
# in {0.2..0.5}, omega in {0.9, 1.0, 1.1}, and nu=2/nu_post=0 all leave
# the lockstep max at 6 (means improve, max does not — and vmapped
# while_loop cost is set by the max). W/F-cycles with nu_post=0 (2 big
# passes/iter instead of 3) converge at max 8 -> 16 big passes vs 18,
# but the doubled coarse visits + the 8-dim CGS2 basis give the ~11%
# back: every measured knob setting lands at ~19 big-pass equivalents.
# The sweep is address-bound on the VPU gather
# (examples/fem_roofline_breakdown.py quantifies this). Round-4 scans
# on the node-major sweep (all at the 4096-freq default band, 9.12e7
# with the production config): V(0,1) cycles (--nu 0 --nu-post 1) drop
# one fine matvec per cycle but the indefinite system needs the
# pre-smooth (iters avg 5.5 -> 9.2, 5.5e7); W and F cycles at nu=1/1
# cut iterations (5.5 -> 4.9 avg) but the doubled level-1 visits cost
# more than the saved iteration (both 8.67e7); stream transfers still
# lose in context (8.72e7) despite winning isolation (3.84+2.47 vs
# 5.11+3.88 ms — the gather fuses with the surrounding elementwise ops,
# the reshape pipelines don't); n=24/levels=4 posts 8.35e7 per DoF —
# levels=4 avoids the coarse-matmul cliff but n=20 stays the per-DoF
# optimum; single-accumulator dia_matvec (isolated 2.55 vs 3.97 ms)
# nets only +0.3% end-to-end (XLA already fused the combine
# contextually). The Galerkin-fused RA/AP transfer operators lose
# outright ((rows, K, F) gather materialization; vcycle_breakdown.py).
# Per-level smoothing --nu 1,2 (double level-1 smooth) also cuts the
# iteration AVERAGE to 4.9 but the batched first cycle is trace-unrolled
# at the restart length, so runtime is set by the lockstep MAX — which
# stays 6 (8.55e7); with --restart 5 the marginal lanes force a second
# cycle (avg 6.9, 5.24e7). restart=6 = the max WAS the floor of the cold
# formulation — round 5 broke it with the different formulation the
# round-4 ladder pointed at: anchor-interpolated warm starts
# (--warm-stride; models/room_sweep_nm.py warm_stride). Two phases per
# chunk: cold-solve the stride-subsampled band (full 6-step cycle on
# 1/stride of the lanes), interpolate the anchor solutions across the
# band, and re-solve warm with a 3-step cycle. Round-5 scan on the chip
# (all at the 4096-freq two-chunk default): linear interp stride 8/16/32
# at warm restart 3 -> 1.097e8 / 1.133e8 / 1.171e8; cubic Catmull-Rom
# stride 32/64 restart 3 -> 1.196e8 / 1.201e8 (DEFAULT). Losers, so they
# are not re-tried: every restart-2 variant forces a second cycle on the
# marginal lanes (s16r2 1.067e8, s8r2 1.050e8, cubic s32r2 9.14e7 — even
# an O(h^4) interpolant cannot push the hard lanes below 3 MG-GMRES
# steps at 1e-5; cubic s64r2 with stronger --nu 1,2 level-1 smoothing
# posts 8.68e7 — the hard lanes are smoothing-insensitive too, matching
# the round-4 cold finding that nu knobs move the mean, not the max),
# and the unchunked 4096 band with warm starts posts
# 1.117e8 (the smaller 4-vector basis does not pay back the lost
# chunk-level anchor sharing). The warm phase's fixed overhead is one
# extra preconditioned matvec for the initial residual, so the cost
# model is ~(6/stride + 3) + 1 big passes vs 6 cold.
#
# The CPU baseline was re-measured with the warm-start formulation too
# (the improvement applies to the CPU as well, keeping the ratio
# apples-to-apples like every previous algorithm change): CPU best is
# now 128-freq node-major with stride-8 cubic warm starts, 2.111e5
# (--device cpu --metric fem --calibrate --sweep nm --freqs 128
# --anchors 4 --warm-stride 8 --warm-restart 3 --warm-interp cubic
# --freq-chunk 0; the scan: stride 4 1.055e5, stride 16 1.447e5,
# 256-freq 1.589e5, warm-restart 2 1.028e5, old cold best 1.539e5).
BASELINE_CPU_DOF_PER_S = 2.111e5


def run(device: str, n: int, n_freq: int, repeats: int, calibrate: bool, anchors: int = 64,
        cycle: str = "v", restart: int = 6, levels: int = 3, sweep_layout: str = "vmapped",
        orth: str = "cgs1", transfers: str = "gather", freq_chunk: int = 0,
        nu: int = 1, nu_post=None, warm_stride: int = 0, warm_restart: int = 0,
        warm_interp: str = "linear"):
    import os

    import jax

    # Persistent compilation cache: the MG-GMRES sweep program is large and
    # the remote-TPU compile is slow (~9 min cold); cached reruns are fast.
    try:
        cache_dir = os.environ.get(
            "MATHAUDIO_JAX_CACHE", os.path.expanduser("~/.cache/jax_mathaudio")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is best-effort
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
    from mathaudio_tpu.models import RoomSweepModel
    from mathaudio_tpu.solvers import KrylovConfig

    from mathaudio_tpu.fem.multigrid import GeometricMultigrid, box_hierarchy

    t0 = time.perf_counter()
    # n -> n/2 -> ... (levels), coarsest solved via explicit inverse.
    # levels=4 matters at n>=24: with 3 levels the coarse inverse is a
    # (2*729)^2 matmul, past the axon backend's ~432^2 dense per-op
    # cliff (ARCHITECTURE.md §10) — one more level keeps it small.
    meshes = box_hierarchy(n, levels)
    mesh = meshes[0]
    mg = GeometricMultigrid(meshes, robin_tags=(1, 2, 3, 4, 5, 6))
    model = RoomSweepModel(
        mesh,
        wall_tags=(1, 2, 3, 4, 5, 6),
        absorption=0.15,
        listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
        assembler=mg.assemblers[0],  # fine level assembled once, shared
    )
    params = model.params()
    t_build = time.perf_counter() - t0
    print(
        f"# mesh n={n}: {mesh.num_elements} tets, {mesh.num_nodes} nodes, "
        f"build {t_build:.1f}s, device={jax.devices()[0]}",
        file=sys.stderr,
    )

    # Tuned preconditioner: undamped (omega=1) single-smoothing V-cycles
    # converge the whole 0.55-2.2 band in <=6 MG-GMRES iterations
    # (measured max over a 1024-freq sweep), so one 6-step cycle
    # suffices. The library default stays the robust omega=2/3, nu=2.
    config = KrylovConfig(max_iterations=500, tolerance=1e-5, restart=restart)
    if sweep_layout == "nm":
        # Node-major batched sweep (models/room_sweep_nm.py): DIA
        # streaming matvecs + batched GMRES/MG, frequency axis in lanes.
        from mathaudio_tpu.models.room_sweep_nm import NodeMajorRoomSweep

        chunk = freq_chunk if 0 < freq_chunk < n_freq else n_freq
        if warm_stride > 1 and chunk % warm_stride:
            print(f"# warm_stride {warm_stride} does not divide the "
                  f"{chunk}-frequency chunk; running the cold sweep",
                  file=sys.stderr)
            warm_stride = 0
        nm = NodeMajorRoomSweep(model, mg)
        params = nm.params()
        sweep = nm.sweep_fn(config, mg_nu=nu, mg_omega=1.0,
                            mg_coarse_anchors=min(anchors, n_freq),
                            mg_cycle_type=cycle, gmres_orth=orth,
                            mg_transfers=transfers, freq_chunk=freq_chunk,
                            mg_nu_post=nu_post, warm_stride=warm_stride,
                            warm_restart=warm_restart, warm_interp=warm_interp)
    else:
        sweep = model.sweep_fn(config, mg_builder=mg.builder, mg_nu=nu, mg_omega=1.0,
                               mg_coarse_anchors=min(anchors, n_freq),
                               mg_cycle_type=cycle, mg_nu_post=nu_post)
    ks = jnp.linspace(0.55, 2.2, n_freq, dtype=model.dtype)

    fn = jax.jit(sweep)
    t0 = time.perf_counter()
    p, its, conv = fn(params, ks)
    p.block_until_ready()
    t_compile_and_first = time.perf_counter() - t0
    n_conv = int(jnp.sum(conv))
    print(
        f"# first run (incl. compile): {t_compile_and_first:.2f}s; "
        f"converged {n_conv}/{n_freq}, iters avg {float(jnp.mean(its)):.1f}",
        file=sys.stderr,
    )
    assert n_conv == n_freq, "sweep did not converge on all frequencies"

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        p, its, conv = fn(params, ks)
        p.block_until_ready()
        times.append(time.perf_counter() - t0)
    t_sweep = min(times)
    dof_solves = mesh.num_nodes * n_freq
    value = dof_solves / t_sweep
    print(
        f"# steady-state sweep: {t_sweep*1e3:.1f} ms for {n_freq} freqs x "
        f"{mesh.num_nodes} DoF -> {value:.3e} DoF/s",
        file=sys.stderr,
    )

    if calibrate:
        print(f"# calibration value: BASELINE_CPU_DOF_PER_S = {value:.3e}", file=sys.stderr)
        return None

    return {
        "metric": "helmholtz_room_sweep_dof_per_s",
        "value": round(value, 1),
        "unit": "DoF-solves/s",
        "vs_baseline": round(value / BASELINE_CPU_DOF_PER_S, 3),
    }


# Measured once with `python bench.py --metric iir --device cpu --calibrate`
# CPU-best configuration (the CPU peaks at 64 channels: 17.6 Msamples/s
# and degrades with wider batches; the TPU scales with the channel batch:
# 64 -> 342, 1024 -> 1381, 4096 -> 2249, 8192 -> 2521 Msamples/s;
# 16384 exceeds HBM). Baseline = CPU best.
BASELINE_CPU_IIR_MSAMPLES = 17.6

# Measured: `python bench.py --device cpu --metric bem --calibrate`
# per (mesh size, solver). Icosphere subdiv: 3 = 1280 elements, 4 = 5120;
# f64, batched assembly; the 5120 tier uses row-chunked assembly. The
# default solver follows the reference's size table (qa_suite.rs:9-14):
# direct LU below N=1000, iterative above — Jacobi-GMRES here (the
# second-kind collocation system converges in 4-8 iterations at 1e-5;
# see bem/sweep.sweep_apply). LU rows kept for the --bem-solver lu path.
BASELINE_CPU_BEM_SOLVES_PER_S = {
    (1280, "lu"): 0.98,
    (5120, "lu"): 0.0922,
    (1280, "gmres"): 3.2854,
    # gmres@5120 recalibrated after the round-4 early-exit Arnoldi
    # (solvers/krylov.py) — the change speeds the CPU harness too
    # (0.1877 -> 0.3017), so the ratio stays apples-to-apples.
    (5120, "gmres"): 0.3017,
    # 20480 recalibrated with the early-exit Arnoldi too (0.0066 -> 0.0166)
    (20480, "gmres"): 0.0166,
}


def run_iir(device: str, repeats: int, calibrate: bool):
    """Secondary metric (BASELINE.md): biquad-cascade Msamples/s/chip.
    64 channels x 10-stage PEQ cascade over a 48000-sample block via the
    associative-scan kernel (vs the reference's criterion biquad bench,
    math-iir-fir/benches/biquad_bench.rs)."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mathaudio_tpu.dsp import Biquad, BiquadFilterType, biquad_cascade_block, peq_coeff_matrix

    channels, stages, t = (64 if device == "cpu" else 8192), 10, 48000
    peq = [
        (1.0, Biquad(BiquadFilterType.PEAK, 100.0 * (i + 1), 48000.0, 1.0, (-1.0) ** i * 3.0))
        for i in range(stages)
    ]
    cm = peq_coeff_matrix(peq, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((channels, t)), jnp.float32)
    fn = jax.jit(jax.vmap(lambda xi: biquad_cascade_block(xi, cm)))
    y = fn(x)
    y.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = fn(x)
        y.block_until_ready()
        times.append(time.perf_counter() - t0)
    msamp = channels * stages * t / min(times) / 1e6
    print(
        f"# iir cascade: {min(times)*1e3:.2f} ms for {channels}ch x {stages}stages "
        f"x {t} samples -> {msamp:.1f} Msamples/s",
        file=sys.stderr,
    )
    if calibrate:
        print(f"# BASELINE_CPU_IIR_MSAMPLES = {msamp:.1f}", file=sys.stderr)
        return None
    return {
        "metric": "iir_biquad_cascade_msamples_per_s",
        "value": round(msamp, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msamp / BASELINE_CPU_IIR_MSAMPLES, 3),
    }


def run_bem(device: str, repeats: int, calibrate: bool, subdiv: int = 4,
            solver: str = "auto", ab_pallas: bool = False):
    """Third metric: dense BEM solves/s — a band of scattering problems
    (collocation assembly + solve) batched in one jit (bem/sweep.py; the
    reference's audio_frequency_sweep.rs loop). Default mesh is the
    reference's FMM-tier size N=5120 (icosphere subdiv 4; VERDICT r1
    item 3 — row-chunked assembly keeps the kernel buffers bounded).
    ``solver='auto'`` follows the reference's size-based table
    (qa_suite.rs:9-14): direct LU below N=1000, iterative above (here
    Jacobi-GMRES on the dense matrix — 4-8 iterations, rel err ~1e-6 vs
    LU; tests/test_bem.py gates the equivalence). Complex values never
    cross the host boundary (the tunneled TPU transport has no complex
    serialization): the jit takes real wavenumbers and returns |p|."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from mathaudio_tpu.bem import plane_wave
    from mathaudio_tpu.bem.mesh import icosphere
    from mathaudio_tpu.bem.sweep import sweep_apply, sweep_statics

    surf = icosphere(1.0, subdiv)
    n = surf.num_elements
    if solver == "auto":
        solver = "lu" if n < 1000 else "gmres"
    inc = plane_wave((0.0, 0.0, 1.0))
    statics = sweep_statics(surf)
    cdt = jnp.complex128 if device == "cpu" else jnp.complex64

    # Large N: sweep in chunks of vmapped frequencies, sized from the
    # memory model instead of a per-mesh table (VERDICT r2 weak #7) so
    # any subdivision gets a valid setting. LU: the batched panel is
    # f32[B,~1.45N,128]; B >= 4 concurrent 5k-dof factorizations exceed
    # the 16 MB scoped-VMEM limit, and at N=20480 even two concurrent
    # 3.1 GiB complex64 matrices crowd HBM during LU. GMRES holds the
    # (B, N, N) matrices plus a restart-deep Krylov basis — HBM-bounded
    # by the matrices alone (budget ~5 GB of concurrent matrices; the
    # assembly planes transiently need comparable room).
    bytes_per_matrix = n * n * (16 if device == "cpu" else 8)
    if solver == "gmres":
        max_conc = max(1, (5 * 1024**3) // bytes_per_matrix)
    else:
        # LU: VMEM panel bound dominates; 2 concurrent 5k factorizations
        # fit under the raised scoped-VMEM ceiling, 1 above
        max_conc = 64 if n <= 1280 else (2 if n <= 5120 else 1)
    fchunk = 0 if max_conc >= 8 else max_conc

    def run_abs(s, ks):
        betas = jnp.zeros_like(ks).astype(cdt)
        rhs = jax.vmap(lambda k: inc.pressure(s.centers, k))(ks)
        return jnp.abs(sweep_apply(s, ks, betas, rhs, freq_chunk=fchunk,
                                   solver=solver))

    # Large N under LU needs a raised scoped-VMEM ceiling for the
    # f32[B,2N,128] double-buffered panel (~2*B*2N*128*4 bytes; the 16 MB
    # default caps N*B ~ 8k; v5e has 128 MB VMEM). Scale with the panel.
    panel_kib = max(1, fchunk) * 2 * 2 * n * 128 * 4 // 1024
    copts = None if (device == "cpu" or solver == "gmres" or panel_kib <= 8192) else {
        "xla_tpu_scoped_vmem_limit_kib": str(max(32768, 1 << panel_kib.bit_length()))
    }
    fn = jax.jit(run_abs, compiler_options=copts)
    if device == "cpu":
        nf = 4 if n <= 1280 else 2
    else:
        nf = 64 if n <= 1280 else (8 if n <= 5120 else 2)
    ks = jnp.linspace(0.5, 3.0, nf)
    np.asarray(fn(statics, ks))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(statics, ks))
        times.append(time.perf_counter() - t0)
    rate = nf / min(times)
    print(
        f"# bem sweep: {min(times)*1e3:.0f} ms for {nf} x {n}-element "
        f"assembly+{solver} -> {rate:.2f} solves/s",
        file=sys.stderr,
    )
    ab = None
    if ab_pallas and device != "cpu":
        # A/B artifact (VERDICT r2 item 8): the same sweep with the Pallas
        # assembly kernels ENABLED (since round 4 the default is the
        # row-chunked XLA assembly — the A/B that justified the flip:
        # N=5120 XLA 89.5 vs Pallas 103.3 ms, N=20480 254.3 vs 274.7).
        # The env flag is read at TRACE time by the dispatch, so the
        # inner assembly jit cache is cleared and a fresh outer function
        # forces a re-trace.
        import os

        from mathaudio_tpu.bem import assembly as _asm

        os.environ["MATHAUDIO_PALLAS"] = "1"
        _asm._assemble_jit.clear_cache()
        try:
            def run_abs_xla(s, ks):  # distinct callable -> fresh outer trace
                return run_abs(s, ks)

            fn_x = jax.jit(run_abs_xla, compiler_options=copts)
            np.asarray(fn_x(statics, ks))  # compile
            times_x = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                np.asarray(fn_x(statics, ks))
                times_x.append(time.perf_counter() - t0)
            ab = {
                "xla_ms": round(min(times) * 1e3, 1),
                "pallas_ms": round(min(times_x) * 1e3, 1),
                "pallas_speedup": round(min(times) / min(times_x), 3),
            }
            print(
                f"# bem A/B at N={n}: xla (default) {ab['xla_ms']} ms vs "
                f"pallas {ab['pallas_ms']} ms -> pallas {ab['pallas_speedup']}x",
                file=sys.stderr,
            )
        finally:
            os.environ.pop("MATHAUDIO_PALLAS", None)
            _asm._assemble_jit.clear_cache()
    if calibrate:
        print(f"# BASELINE_CPU_BEM_SOLVES_PER_S[({n}, '{solver}')] = {rate:.4f}",
              file=sys.stderr)
        return None
    base = BASELINE_CPU_BEM_SOLVES_PER_S.get((n, solver))
    out = {
        "metric": "bem_dense_solves_per_s",
        "value": round(rate, 2),
        "unit": "solves/s",
        "n_elements": n,
        "solver": solver,
        "vs_baseline": round(rate / base, 3) if base else None,
    }
    if ab is not None:
        out["ab_pallas"] = ab
    return out


# Measured: `python bench.py --metric fmm --device cpu --calibrate`
# (f64 planes, identical operators/algorithm on this host's CPU; the
# reference tier is "FMM + GMRES + ILU, N < 20000 / FMM + batched,
# N > 20000", qa_suite.rs:9-14). Keys: (n_elements, tier).
BASELINE_CPU_FMM_SOLVES_PER_S = {
    # recalibrated twice in round 4 — each matvec optimization applies
    # to the CPU harness too, so the ratio stays apples-to-apples:
    # early-exit Arnoldi (slfmm 0.0334 -> 0.04004, mlfmm 0.0255 ->
    # 0.03152), then the xa row-gather + _bmv multiply-reduce forms
    # (slfmm -> 0.143 — the scalar-gather fix helps the CPU 3.6x —
    # mlfmm -> 0.02892). The chip-only cluster-major solve was also
    # measured on CPU (slfmm 0.1465, mlfmm 0.02614) — mixed, so the CPU
    # keeps the element-order path and these values.
    (5120, "slfmm"): 0.143,
    (20480, "mlfmm"): 0.02892,
}


def run_fmm(device: str, repeats: int, calibrate: bool, tier: str = "mlfmm"):
    """Fourth metric (VERDICT r2 item 1): FMM GMRES solves/s ON THE CHIP.

    The FMM tensors are host-built complex arrays; the tunneled TPU
    transport cannot ship complex values, so every tensor crosses as
    re/im REAL planes and is recombined in-trace (bem/fmm_chip.py) — the
    dense sweep's trick applied to SlfmmData/MlfmmTreeData. The builds
    run on the in-process CPU backend in f64 with the f32 stability
    screen (stability_tau=1e4, bem/fmm._stable_far_orders), so the c64
    on-chip matvec matches the f64 build to ~1e-5 (gated in
    tests/test_fmm_chip.py; rel-err also printed here).

    Tiers (reference solver-selection table, qa_suite.rs:9-14 +
    batched_blas.rs:237): slfmm = N=5120 icosphere at ka=8;
    mlfmm = hierarchical tree, N=20480 at ka=16 (the "FMM + batched,
    N > 20000" production tier). Burton-Miller beta = i/k throughout
    (resonance-safe)."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mathaudio_tpu.bem import plane_wave
    from mathaudio_tpu.bem.fmm import (
        ClusterBlockPreconditioner,
        build_mlfmm_tree_system,
        build_slfmm_system,
        gather_form,
        sel_form,
    )
    from mathaudio_tpu.bem.fmm_chip import (
        fmm_chip_matvec_fn,
        fmm_chip_solve_cm_fn,
        fmm_chip_solve_fn,
        split_planes,
    )
    from mathaudio_tpu.bem.mesh import icosphere
    from mathaudio_tpu.solvers import KrylovConfig

    subdiv, k = (4, 8.0) if tier == "slfmm" else (5, 16.0)
    # slfmm exercises Burton-Miller on the chip (beta = i/k, 46 iters);
    # the mlfmm HEADLINE runs plain CBIE like the reference's own MLFMM
    # (mlfmm.rs is rigid-only), and a separate BM robustness solve below
    # proves beta=i/k at the production tier. (The round-4 "beta=i/k
    # diverges under the cluster-block preconditioner" was the CB LU
    # actively hurting BM — 170 iters vs 75 UNPRECONDITIONED — plus a
    # 200-iteration budget; rescan 2026-08-21.)
    beta = 1j / k if tier == "slfmm" else 0.0
    plane_dtype = np.float64 if device == "cpu" else np.float32

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    x64_was = bool(jax.config.jax_enable_x64)
    jax.config.update("jax_enable_x64", True)  # f64 host build
    import os as _os

    if device != "cpu":
        # O(N^2) static row-sum + near-block passes on the chip (all-real, tunnel-safe;
        # ~7 s host f32 at N=20480 vs sub-second on device)
        _os.environ["MATHAUDIO_FMM_BUILD_DEVICE"] = "default"
    try:
        with jax.default_device(cpu):
            _t = time.perf_counter()

            def _lap(name):
                nonlocal _t
                now = time.perf_counter()
                print(f"#   build step {name}: {now - _t:.1f}s", file=sys.stderr)
                _t = now

            surf = icosphere(1.0, subdiv)
            n = surf.num_elements
            # agg_phase_f32: f32 aggregation phases are safe at the f32
            # screening level tau=1e4 (the all-f32 chip matvec gates at
            # 2.2e-6 rel) and halve the largest exp pass of the build
            if tier == "slfmm":
                op = build_slfmm_system(surf, k, beta=beta, stability_tau=1e4,
                                        agg_phase_f32=True)
            else:
                # max_per_leaf=32: 5x faster host build than the default
                # 16 at N=20480 (112s vs 560s measured) at equal accuracy
                op = build_mlfmm_tree_system(surf, k, beta=beta,
                                             stability_tau=1e4, max_per_leaf=32,
                                             agg_phase_f32=True)
            jax.block_until_ready(op.data)
            _lap("operator")
            pre = ClusterBlockPreconditioner.from_operator(op)
            jax.block_until_ready(pre)
            _lap("preconditioner")
            # scatter-free accumulation tables: TPU scatter-adds serialize
            # per row (the per-level translation scatter alone measured
            # ~12 s per N=20480 matvec); the gather form streams instead.
            # On the chip the tree's per-level pair reductions further
            # lower to 0/1-selection MXU matmuls (sel_form — 9.5 ms of
            # the 13.6 ms matvec was the (C, K, Q) take+sum); on CPU the
            # dense GEMMs would dominate, so calibration keeps gather.
            op_host = op  # pre-lowering handle for the validation matvec
            op = gather_form(op) if device == "cpu" else sel_form(op)
            jax.block_until_ready(op.data)
            t_build = time.perf_counter() - t0  # operator ready for shipping
            _lap("gather/sel form")
            # reference matvec for the chip-accuracy gate (f64, CPU) —
            # computed on the pre-lowering operator (identical values;
            # the sel_form dense GEMMs cost 16 s on the 1-core host).
            # Validation, not build: excluded from build_s.
            rng = np.random.default_rng(0)
            x_chk = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            y_ref = np.asarray(op_host.matvec(jnp.asarray(x_chk)))
            del op_host
            _lap("reference matvec")
            inc = plane_wave((0.0, 0.0, 1.0))
            rhs = np.asarray(inc.pressure(jnp.asarray(surf.centers), k)) - beta * (
                np.asarray(
                    inc.normal_derivative(
                        jnp.asarray(surf.centers), jnp.asarray(surf.normals), k
                    )
                )
            )
            _lap("rhs")
            # Mie reference (f64 series — overflows in f32; eager complex,
            # so it must run on the CPU backend inside this x64 block)
            from mathaudio_tpu.wave.analytical.solutions_3d import (
                sphere_scattering_3d,
            )

            c = surf.centers
            r_mie = float(np.linalg.norm(c, axis=1).mean())
            th = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
            ex = np.asarray(
                sphere_scattering_3d(
                    k, 1.0, max(60, int(2 * k) + 20), [r_mie], th
                ).pressure
            ).reshape(-1)
            _lap("mie reference")
    finally:
        jax.config.update("jax_enable_x64", x64_was or device == "cpu")
        _os.environ.pop("MATHAUDIO_FMM_BUILD_DEVICE", None)
    t_total = time.perf_counter() - t0
    print(f"# fmm {tier} build N={n} ka={k}: {t_build:.1f}s operator "
          f"(+{t_total - t_build:.1f}s reference/Mie validation; host, f64)",
          file=sys.stderr)

    # Ship the real planes to the device ONCE: without this every solve
    # re-transfers the whole operator (GBs) over the tunnel per call.
    planes = jax.device_put(split_planes(op, dtype=plane_dtype))
    pre_planes = jax.device_put(split_planes(pre, dtype=plane_dtype))
    jax.block_until_ready(planes)

    mv = jax.jit(fmm_chip_matvec_fn())
    yr, yi = mv(planes, jnp.asarray(x_chk.real.astype(plane_dtype)),
                jnp.asarray(x_chk.imag.astype(plane_dtype)))
    y_chip = np.asarray(yr) + 1j * np.asarray(yi)
    rel_mv = float(np.linalg.norm(y_chip - y_ref) / np.linalg.norm(y_ref))
    print(f"# fmm {tier} chip matvec vs CPU f64 build: rel={rel_mv:.2e} "
          f"(gate 1e-3)", file=sys.stderr)
    assert rel_mv < 1e-3, f"chip FMM matvec off: {rel_mv:.2e}"

    # restart sized just above the measured iteration counts (46 / 32 on
    # these tiers). Since round 4 the Arnoldi loop exits early once the
    # Givens residual clears tolerance (solvers/krylov.py), so an
    # oversized restart no longer burns post-convergence matvecs — the
    # size now only affects basis memory and compile time.
    config = KrylovConfig(max_iterations=200, tolerance=1e-5,
                          restart=48 if tier == "slfmm" else 36)
    # Chip: cluster-major Krylov space (fmm_chip_solve_cm_fn) — no
    # per-iteration element-order gathers; identical iteration counts
    # and solutions (tests/test_fmm_chip.py). Chip wins: mlfmm 396 ->
    # 349 ms, slfmm 83 -> 66 ms. CPU keeps the element-order solve (its
    # best: cm measured 0.02614 vs 0.02892 solves/s on the mlfmm tier).
    solve = jax.jit((fmm_chip_solve_cm_fn if device != "cpu"
                     else fmm_chip_solve_fn)(config))
    rr = jnp.asarray(rhs.real.astype(plane_dtype))
    ri = jnp.asarray(rhs.imag.astype(plane_dtype))
    t0 = time.perf_counter()
    xr, xi, it, conv = solve(planes, pre_planes, rr, ri)
    x_sol = np.asarray(xr) + 1j * np.asarray(xi)  # materialize = sync
    t_first = time.perf_counter() - t0
    print(f"# fmm {tier} first solve (incl. compile): {t_first:.1f}s, "
          f"iters={int(it)}, converged={bool(conv)}", file=sys.stderr)
    assert bool(conv), "FMM GMRES did not converge"

    rel_mie = float(np.linalg.norm(x_sol - ex) / np.linalg.norm(ex))
    print(f"# fmm {tier} surface pressure vs Mie: rel={rel_mie:.2e}",
          file=sys.stderr)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        xr, xi, it, conv = solve(planes, pre_planes, rr, ri)
        np.asarray(xr)
        times.append(time.perf_counter() - t0)
    rate = 1.0 / min(times)
    print(f"# fmm {tier}: {min(times)*1e3:.0f} ms per N={n} solve "
          f"({int(it)} iters) -> {rate:.3f} solves/s", file=sys.stderr)

    bm_info = None
    if tier == "mlfmm":
        # Burton-Miller robustness at the production tier (VERDICT r4
        # #2): beta=i/k, ka=16, N=20480 on the chip, UNPRECONDITIONED
        # (Jacobi ties at 74 iters; the cluster-block LU hurts BM — 170;
        # near-field ILU(0) converges in 55 at N=5120 but crashes the
        # tunneled TPU worker at this size). Gated: converged with
        # Mie rel <= 1e-2 (measured 9.78e-3, 75 iters).
        beta_bm = 1j / k
        t0 = time.perf_counter()
        jax.config.update("jax_enable_x64", True)
        _os.environ["MATHAUDIO_FMM_BUILD_DEVICE"] = "default"
        try:
            with jax.default_device(cpu):
                op_bm = build_mlfmm_tree_system(
                    surf, k, beta=beta_bm, stability_tau=1e4,
                    max_per_leaf=32, agg_phase_f32=True,
                )
                op_bm = sel_form(op_bm)
                rhs_bm = np.asarray(
                    inc.pressure(jnp.asarray(surf.centers), k)
                ) - beta_bm * np.asarray(
                    inc.normal_derivative(
                        jnp.asarray(surf.centers), jnp.asarray(surf.normals), k
                    )
                )
        finally:
            jax.config.update("jax_enable_x64", x64_was or device == "cpu")
            _os.environ.pop("MATHAUDIO_FMM_BUILD_DEVICE", None)
        t_bm_build = time.perf_counter() - t0
        planes_bm = jax.device_put(split_planes(op_bm, dtype=plane_dtype))
        jax.block_until_ready(planes_bm)
        cfg_bm = KrylovConfig(max_iterations=400, tolerance=1e-5, restart=80)
        solve_bm = jax.jit(
            lambda p, r1, r2: fmm_chip_solve_fn(cfg_bm)(p, None, r1, r2)
        )
        rr_bm = jnp.asarray(rhs_bm.real.astype(plane_dtype))
        ri_bm = jnp.asarray(rhs_bm.imag.astype(plane_dtype))
        t0 = time.perf_counter()
        xr_bm, xi_bm, it_bm, conv_bm = solve_bm(planes_bm, rr_bm, ri_bm)
        x_bm = np.asarray(xr_bm) + 1j * np.asarray(xi_bm)
        t_bm = time.perf_counter() - t0
        rel_bm = float(np.linalg.norm(x_bm - ex) / np.linalg.norm(ex))
        print(f"# fmm mlfmm BURTON-MILLER beta=i/k: converged="
              f"{bool(conv_bm)} iters={int(it_bm)} mie_rel={rel_bm:.2e} "
              f"(build {t_bm_build:.1f}s, solve+compile {t_bm:.1f}s)",
              file=sys.stderr)
        assert bool(conv_bm), "BM tree solve did not converge"
        assert rel_bm <= 1e-2, f"BM Mie accuracy gate: {rel_bm:.2e}"
        bm_info = {
            "converged": bool(conv_bm),
            "iters": int(it_bm),
            "mie_rel_err": round(rel_bm, 6),
            "build_s": round(t_bm_build, 1),
        }
    if calibrate:
        print(f"# BASELINE_CPU_FMM_SOLVES_PER_S[({n}, '{tier}')] = {rate:.4g}",
              file=sys.stderr)
        return None
    base = BASELINE_CPU_FMM_SOLVES_PER_S.get((n, tier))
    return {
        "metric": "bem_fmm_solves_per_s",
        "value": round(rate, 3),
        "unit": "solves/s",
        "n_elements": n,
        "tier": tier,
        "ka": k,
        "build_s": round(t_build, 1),
        "matvec_rel_err_vs_f64": round(rel_mv, 8),
        "mie_rel_err": round(rel_mie, 6),
        "burton_miller": bm_info,
        "vs_baseline": round(rate / base, 3) if base else None,
    }


def _check_tpu_reachable(timeout_s: float = 0.0) -> None:
    """Fail fast when the remote-TPU tunnel is down.

    jax.devices() on the axon backend blocks *forever* during a tunnel
    outage (observed during round 2), which would hang the whole bench
    run. Probe device init in a subprocess with a hard timeout and exit
    with a diagnostic instead. Default timeout 420 s (cold tunnel spin-up
    can be slow); override with MATHAUDIO_TPU_PROBE_TIMEOUT for
    interactive use (VERDICT r2 weak #7)."""
    import os
    import subprocess

    if timeout_s <= 0:
        timeout_s = float(os.environ.get("MATHAUDIO_TPU_PROBE_TIMEOUT", 420.0))

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        ok = proc.returncode == 0
        detail = proc.stderr[-500:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"device init still blocked after {timeout_s:.0f}s"
    if not ok:
        print(f"# TPU backend unreachable (tunnel outage?): {detail}", file=sys.stderr)
        sys.exit(1)


def _parse_nu(v: str):
    if "," in v:
        return tuple(int(x) for x in v.split(","))
    return int(v)


def _parse_nu_post(v: str):
    if "," in v:
        return tuple(int(x) for x in v.split(","))
    return None if int(v) < 0 else int(v)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--metric", default="all", choices=["all", "fem", "iir", "bem", "fmm"])
    ap.add_argument("--fmm-tier", default="mlfmm", choices=["mlfmm", "slfmm"],
                    help="FMM metric tier: mlfmm = hierarchical tree N=20480 ka=16 "
                         "(the reference's 'FMM + batched, N > 20000' row), "
                         "slfmm = single-level N=5120 ka=8")
    ap.add_argument("--n", type=int, default=20, help="mesh cells per axis")
    ap.add_argument("--freqs", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--anchors", type=int, default=16,
                    help="coarse-inverse anchors shared across the frequency batch "
                         "(freqs/anchors a multiple of 128 enables the nested "
                         "anchor-chunk vmap fast path)")
    ap.add_argument("--cycle", default="v", choices=["v", "w", "f"])
    ap.add_argument("--sweep", default="nm", choices=["vmapped", "nm"],
                    help="sweep layout: nm node-major (DIA + batched GMRES/MG, "
                         "default — 5.19e7 DoF-solves/s) or vmapped "
                         "frequency-major (3.94e7)")
    ap.add_argument("--restart", type=int, default=6)
    ap.add_argument("--orth", default="cgs1", choices=["cgs2", "cgs1"],
                    help="node-major Arnoldi orthogonalization (cgs1 default: "
                         "halves the basis traffic — 228 ms vs 252 ms back-to-"
                         "back at bench shape, identical iteration counts; safe "
                         "only because the MG-preconditioned band converges in "
                         "~6 short-cycle iterations and the recomputed true "
                         "residuals match CGS2 to tolerance — see "
                         "solvers/krylov_batched.py and tests/test_nodemajor.py)")
    ap.add_argument("--transfers", default="gather",
                    choices=["gather", "tp", "stream", "stream16"],
                    help="node-major multigrid transfer lowering: gather "
                         "stencil (default, 9.0e7 DoF-solves/s at the "
                         "default 4096-freq band), tp separable matmuls "
                         "(264 ms vs 224 at the 2048 band despite a 6x "
                         "microbench win), stream separable per-axis "
                         "slice/interleave (8.59e7 — the 1.44x isolated "
                         "win also loses in context), stream16 = stream "
                         "with bf16-plane traffic (2.68e7: the ~4e-3 "
                         "preconditioner rounding triples the band's "
                         "iteration count). All four are the same "
                         "operator; see models/room_sweep_nm.py "
                         "sweep_fn docstring for the measured record")
    ap.add_argument("--levels", type=int, default=3, help="multigrid levels")
    ap.add_argument("--nu", type=str, default="1",
                    help="multigrid pre-smoothing steps; an int, 0 (= "
                         "V(0,nu_post)), or a comma list for per-level "
                         "counts (node-major only), e.g. 1,2")
    ap.add_argument("--nu-post", type=str, default="-1",
                    help="post-smoothing steps (-1 = same as --nu; comma "
                         "list for per-level counts)")
    ap.add_argument("--dia", default="xla", choices=["xla", "pallas"],
                    help="node-major DIA matvec lowering: xla (15 shifted "
                         "passes — the measured winner, 3.1 ms/matvec at "
                         "headline shape) or pallas (halo-tiled single "
                         "pass, 13.1 ms — kept for the record; "
                         "examples/dia_matvec_ab.py)")
    ap.add_argument("--freq-chunk", type=int, default=2048,
                    help="node-major sweep: stream the band in sequential "
                         "chunks of this many frequencies (0 = whole band). "
                         "Default 2048: the 4096-band streamed in two "
                         "chunks posts 9.0e7 DoF-solves/s vs 8.65e7 for the "
                         "2048 whole band and 8.16e7 for 4096 unchunked "
                         "(measured 2026-08-19); also bounds HBM so wide "
                         "bands can't OOM (VERDICT r2 item 9)")
    ap.add_argument("--warm-stride", type=int, default=64,
                    help="node-major sweep: > 1 solves the stride-"
                         "subsampled band cold, lane-interpolates the "
                         "solutions as warm starts, and re-solves the "
                         "full band with --warm-restart Arnoldi steps "
                         "(anchor-interpolated continuation; "
                         "models/room_sweep_nm.py warm_stride). Default "
                         "64: the round-5 scan record lives in the "
                         "comment block above run(); 0 = cold sweep")
    ap.add_argument("--warm-restart", type=int, default=3,
                    help="restart length of the warm phase (0 = --restart)")
    ap.add_argument("--warm-interp", default="cubic",
                    choices=["linear", "cubic"],
                    help="anchor interpolant: linear (O(h^2)) or cubic "
                         "Catmull-Rom (O(h^4), same anchor cost)")
    ap.add_argument("--bem-subdiv", type=int, default=4,
                    help="icosphere subdivision for the BEM metric (3=1280, 4=5120, 5=20480)")
    ap.add_argument("--bem-solver", default="auto", choices=["auto", "lu", "gmres"],
                    help="auto = the reference's size table: LU below N=1000, GMRES above")
    ap.add_argument("--ab-pallas", action="store_true",
                    help="also time the BEM sweep with the Pallas assembly "
                         "kernels enabled (MATHAUDIO_PALLAS=1; the default "
                         "is the row-chunked XLA assembly since round 4) and "
                         "report both timings (reproducible A/B artifact)")
    ap.add_argument("--calibrate", action="store_true")
    args = ap.parse_args()
    if args.sweep != "nm" and ("," in args.nu or "," in args.nu_post):
        # per-level nu tuples are a node-major (mg_cycle_batched)
        # feature; the vmapped fem/multigrid.mg_cycle takes a scalar
        ap.error("--nu/--nu-post comma lists require --sweep nm")
    if args.sweep != "nm" and args.warm_stride > 1:
        # warm starts are a node-major feature (gmres_batched x0); the
        # vmapped layout falls back to its classic cold configuration
        args.warm_stride = 0
    if args.sweep == "vmapped" and args.freq_chunk:
        # the vmapped layout has its own HBM profile (2048 max) and no
        # chunked path; fall back to the classic configuration
        args.freq_chunk = 0
        args.freqs = min(args.freqs, 2048)
    if args.dia == "pallas":
        import os as _os

        _os.environ["MATHAUDIO_DIA_PALLAS"] = "1"
    if args.device == "tpu":
        _check_tpu_reachable()
    try:  # persistent compile cache for every metric (see run())
        from mathaudio_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception as e:
        print(f"# compile cache unavailable: {e}", file=sys.stderr)
    if args.metric == "iir":
        out = run_iir(args.device, args.repeats, args.calibrate)
    elif args.metric == "bem":
        out = run_bem(args.device, args.repeats, args.calibrate, args.bem_subdiv, args.bem_solver, args.ab_pallas)
    elif args.metric == "fmm":
        out = run_fmm(args.device, args.repeats, args.calibrate, args.fmm_tier)
    elif args.metric == "fem":
        out = run(args.device, args.n, args.freqs, args.repeats, args.calibrate,
                  args.anchors, args.cycle, args.restart, args.levels, args.sweep,
                  args.orth, args.transfers, args.freq_chunk,
                  _parse_nu(args.nu), _parse_nu_post(args.nu_post),
                  args.warm_stride, args.warm_restart, args.warm_interp)
    else:
        # all metrics (VERDICT r1 item 4 + r2 item 1): secondary metrics
        # first, headline FEM last; ONE combined JSON line (headline
        # fields at top level so existing parsers see the FEM number,
        # secondaries nested). The FMM tier runs guarded: its host build
        # is the longest stage (~10 min at N=20480), so a failure there
        # must not cost the other recorded metrics.
        iir = run_iir(args.device, args.repeats, args.calibrate)
        bem = run_bem(args.device, args.repeats, args.calibrate, args.bem_subdiv, args.bem_solver, args.ab_pallas)
        fmms = []
        for tier in ("slfmm", "mlfmm"):
            try:
                fmms.append(run_fmm(args.device, args.repeats, args.calibrate, tier))
            except Exception as e:  # noqa: BLE001 — record, don't lose the run
                print(f"# fmm {tier} metric failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                fmms.append({"metric": "bem_fmm_solves_per_s", "tier": tier,
                             "error": str(e)[:300]})
        fem = run(args.device, args.n, args.freqs, args.repeats, args.calibrate,
                  args.anchors, args.cycle, args.restart, args.levels, args.sweep,
                  args.orth, args.transfers, args.freq_chunk,
                  _parse_nu(args.nu), _parse_nu_post(args.nu_post),
                  args.warm_stride, args.warm_restart, args.warm_interp)
        secondary = [iir, bem] + [f for f in fmms if f]
        out = dict(fem, secondary=secondary) if fem else None
    if out is not None:
        print(json.dumps(out))
