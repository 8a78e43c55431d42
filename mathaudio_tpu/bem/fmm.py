"""Single-level fast multipole method for the Helmholtz double layer
(math-bem/src/core/assembly/slfmm.rs: A = N + S.D.T decomposition;
batched GEMM form per core/solver/batched_blas.rs).

High-frequency diagonal (Rokhlin) form on a unit-sphere direction
quadrature: for |x - c_b|, |y - c_a| < |D|/sep, D = c_b - c_a,

  G(x, y) = (ik / 16 pi^2) int_{S^2} e^{ik s.(x - c_b)}
            M_L(s, D) e^{-ik s.(y - c_a)} ds,
  M_L(s, D) = sum_{l<=L} (2l+1) i^l h_l^(1)(k|D|) P_l(s.D_hat).

TPU shaping: leaf clusters padded to one uniform size; T (aggregation),
D (diagonal translation) and S (disaggregation) are dense padded tensors
so the matvec is three einsums (MXU) plus one batched near-field GEMM —
the reference's SlfmmMatvecWorkspace turned into static-shape algebra.

Deployment note: the operator pytrees hold complex device arrays built
on the host. Transports without complex serialization (e.g. tunneled
dev TPUs) ship them as re/im REAL planes via bem/fmm_chip.py
(split_planes -> device, join_planes in-trace); chip execution also
wants ``gather_form`` (scatter-free accumulation — TPU scatter-adds
serialize per row) and the f32 stability screen (stability_tau=1e4).
Measured on one v5e: SLFMM N=5120 solve 205 ms (146x CPU f64), MLFMM
tree N=20480 solve 998 ms (39x) — `bench.py --metric fmm`.
Kernel variants: double layer (CBIE) and Burton-Miller combination via
direction-space factors (-ik s.n_y) and (ik s.n_x).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mathaudio_tpu.bem.assembly import _pair_kernels, _self_angular_rule, _static_pair_kernels
from mathaudio_tpu.bem.mesh import SurfaceMesh
from mathaudio_tpu.bem.octree import Octree
from mathaudio_tpu.solvers.operators import LinearOperator
from mathaudio_tpu.wave.special.spherical import spherical_jn_yn_all
from mathaudio_tpu.xtypes import complex_dtype_for, default_float


def unit_sphere_quadrature(order: int):
    """(directions (Q, 3), weights (Q,)): Gauss-Legendre in cos(theta) x
    uniform in phi (core/integration 'unit-sphere quadrature for FMM')."""
    n_t = order + 1
    n_p = 2 * order + 2
    xt, wt = np.polynomial.legendre.leggauss(n_t)
    phi = 2 * np.pi * np.arange(n_p) / n_p
    wp = 2 * np.pi / n_p
    ct = xt[:, None] * np.ones(n_p)[None, :]
    st = np.sqrt(1 - ct**2)
    dirs = np.stack(
        [st * np.cos(phi)[None, :], st * np.sin(phi)[None, :], ct], axis=-1
    ).reshape(-1, 3)
    w = (wt[:, None] * wp * np.ones(n_p)[None, :]).reshape(-1)
    return dirs, w


def _bmv(blocks, vecs):
    """Batched (B, I, J) x (B, J) -> (B, I) as broadcast-multiply +
    reduce. einsum/dot_general lowers this contraction to B tiny MXU
    matmuls whose per-op dispatch dominates at small I, J — the
    N=20480 near-field blocks (28k pairs of 31x31) measured 12.3 ms as
    an einsum vs streaming the blocks once on the VPU
    (examples/fmm_phase_profile.py; same lowering rule as
    solvers/krylov_batched._dotc)."""
    return jnp.sum(blocks * vecs[:, None, :], axis=-1)


def _bucket(n: int, minimum: int = 64) -> int:
    """Next power of two >= n: pads data-dependent batch sizes to a few
    static shapes so the jitted build kernels compile O(log N) times per
    process instead of once per interaction list / frequency."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _translation_sum_body(lmax: int, kd, cos_g, orders):
    """sum_{l<=orders[p]} (2l+1) i^l h_l(kd[p]) P_l(cos_g[p, q]) -> (P, Q).

    Fused build kernel: the Legendre recurrence accumulates the series
    in-place (lax.scan), never materializing the (L+1, P, Q) tensor the
    old host einsum needed — XLA fuses and multithreads the (P, Q) work.
    Orders above ``orders[p]`` are masked with ``where`` so overflowed
    high-l Hankel tails (inf) cannot poison the sum."""
    j_all, y_all = spherical_jn_yn_all(lmax, kd)  # (L+1, P)
    h = jax.lax.complex(j_all, y_all)
    l = jnp.arange(lmax + 1)
    i_pow = jnp.stack(
        [jnp.array(v, h.dtype) for v in (1.0, 1.0j, -1.0, -1.0j)]
    )[l % 4]  # exact i^l (pow() drifts at high l)
    coef = ((2 * l + 1).astype(h.dtype) * i_pow)[:, None]
    a = jnp.where(l[:, None] <= orders[None, :], coef * h, 0.0)  # (L+1, P)
    acc = a[0][:, None] * jnp.ones_like(cos_g)
    if lmax == 0:
        return acc
    p0 = jnp.ones_like(cos_g)
    p1 = cos_g
    acc = acc + a[1][:, None] * p1

    def step(carry, inp):
        p_nm1, p_n, acc = carry
        n, a_n = inp
        p_np1 = ((2.0 * n + 1.0) * cos_g * p_n - n * p_nm1) / (n + 1.0)
        return (p_n, p_np1, acc + a_n[:, None] * p_np1), None

    ns = jnp.arange(1, lmax, dtype=cos_g.dtype)
    (_, _, acc), _ = jax.lax.scan(step, (p0, p1, acc), (ns, a[2:]))
    return acc


_translation_sum = partial(jax.jit, static_argnums=0)(_translation_sum_body)


@partial(jax.jit, static_argnums=0)
def _translation_sum_dirs(lmax: int, kd, d_hat, dirs, orders):
    """_translation_sum with cos_g = clip(d_hat @ dirs^T) computed
    IN-TRACE: the host never materializes the (P, Q) angle matrix (a
    cold-page numpy allocation measured at ~7 s of the N=5120 SLFMM
    build on this host — see the module build-profile note).

    The pair axis is tiled with lax.map so each Legendre-recurrence
    step's working set (~5 arrays of (pc, Q)) stays cache-resident: the
    full-P scan streams ~270 MB per l-step at the N=20480 tier, turning
    a compute problem into a memory-bandwidth one (measured ~6 s of the
    tree build; tiled ~2.5 s)."""
    p, q = kd.shape[0], dirs.shape[0]
    # ~200 KB per (pc, Q) f64 array; p is _bucket()-padded (power of two
    # >= 64), so any power-of-two pc <= p divides it evenly.
    pc = 64
    while pc * 2 <= p and pc * 2 * q * 8 <= 400_000:
        pc *= 2

    def chunk_fn(args):
        kd_c, dh_c, od_c = args
        cos_g = jnp.clip(dh_c @ dirs.T, -1.0, 1.0)
        return _translation_sum_body(lmax, kd_c, cos_g, od_c)

    out = jax.lax.map(
        chunk_fn,
        (kd.reshape(-1, pc), d_hat.reshape(-1, pc, 3), orders.reshape(-1, pc)),
    )
    return out.reshape(p, q)


@partial(jax.jit, static_argnums=0)
def _stab_screen_jit(lmax: int, kd, tau):
    """Stable series order per pair, fully in-trace: largest l whose
    cumulative amplitude (2l+1)|h_l(kd)| stays <= tau (lmax when none
    exceeds). The (L+1, P) Hankel magnitudes never reach the host — at
    production pair counts the numpy hypot/asarray round-trip of that
    table cost seconds of cold-page bandwidth (build profile 2026-08-21)."""
    j_all, y_all = spherical_jn_yn_all(lmax, kd)  # (L+1, P)
    coef = (2.0 * jnp.arange(lmax + 1) + 1.0)[:, None]
    amp = coef * jnp.hypot(j_all, y_all)
    exceed = jax.lax.cummax(amp, axis=0) > tau
    return jnp.where(exceed.any(axis=0), jnp.argmax(exceed, axis=0) - 1, lmax)


def _translation_padded(k, d_vecs, dirs, lmax: int, orders, as_jax: bool = False):
    """Shared padded driver for both translation-operator forms.

    Host work is kept to O(P) small arrays: the (P, Q) angle matrix and
    the series accumulate entirely inside the jit (cold-page numpy
    allocations on this host run at ~30 MB/s, so every avoided (P, Q)
    materialization saves seconds at production sizes). ``as_jax``
    returns the (P, Q) result as a device (CPU-jax) array so callers
    that scatter it into a jnp tensor skip the numpy copy too."""
    p = len(d_vecs)
    d_len = np.linalg.norm(d_vecs, axis=1)
    d_hat = d_vecs / np.maximum(d_len, 1e-300)[:, None]
    pb = _bucket(p)
    lb = 4 * ((lmax + 3) // 4)  # bucket the static order too
    kd = np.full(pb, 1.0)
    kd[:p] = k * d_len
    dh = np.zeros((pb, 3))
    dh[:p] = d_hat  # pad rows: cos_g = 0, masked anyway by orders = -1
    od = np.full(pb, -1, np.int32)
    od[:p] = orders
    out = _translation_sum_dirs(
        lb, jnp.asarray(kd), jnp.asarray(dh), jnp.asarray(dirs), jnp.asarray(od)
    )[:p]
    return out if as_jax else np.asarray(out)


def translation_operator(k: float, d_vecs: np.ndarray, dirs: np.ndarray, order: int):
    """M_L(s, D) for a batch of translation vectors: (P, Q) complex."""
    return _translation_padded(
        k, d_vecs, dirs, order, np.full(len(d_vecs), order, np.int32)
    )


def _stable_far_orders(k, c_centers, radii, far, order: int, tau: float):
    """Per-pair stability screen of the diagonal translation form.

    The high-frequency (Rokhlin) translation series carries terms
    (2l+1) h_l(kD) P_l that blow up when l outruns kD (low-frequency
    breakdown); the unit-sphere quadrature only cancels them back down
    to O(1) with ~log10(amp) digits of precision — amplitudes beyond the
    arithmetic's headroom (tau) turn into O(1) noise (f64: tau ~ 1e8;
    f32 chip execution: tau ~ 1e4, see bem/fmm_chip.py).

    For each far pair this caps the series order at the largest l whose
    cumulative amplitude stays <= tau (truncation above the signature
    bandwidth is exact for band-limited aggregates, so capping costs
    only the accuracy margin, not correctness); pairs whose stable order
    falls below the bare propagation bandwidth ceil(k(r_a+r_b)) + 2 are
    DEMOTED to the exact near field. Returns (far_mask_updated,
    orders_per_remaining_far_pair) with pairs ordered by np.where(far).
    """
    fb, fa = np.where(far)
    if not len(fb):
        return far, np.zeros(0, np.int32)
    d_len = np.linalg.norm(c_centers[fb] - c_centers[fa], axis=1)
    krp = k * (radii[fb] + radii[fa])
    l_acc = np.minimum(
        np.ceil(krp + 4 * np.log(krp + np.pi) + 4).astype(int), order
    )
    p = len(d_len)
    pb = _bucket(p)
    lb = 4 * ((order + 3) // 4)  # bucket the static order (compile reuse)
    kd_p = np.full(pb, 1.0)
    kd_p[:p] = k * d_len
    # pad rows (kd=1) blow up at high l -> finite l_stab; sliced off.
    # When no amplitude exceeds tau the jit returns lb (>= order), which
    # the min with l_acc below clamps exactly as the old `order` did.
    l_stab = np.asarray(_stab_screen_jit(lb, jnp.asarray(kd_p), tau))[:p]
    l_min = np.ceil(krp).astype(int) + 2
    keep = l_stab >= np.minimum(l_min, l_acc)
    far = far.copy()
    far[fb[~keep], fa[~keep]] = False
    return far, np.minimum(l_acc, l_stab)[keep].astype(np.int32)


class SlfmmData(NamedTuple):
    """Pytree of the padded FMM tensors (device).

    The two trailing optional fields are the SCATTER-FREE accumulation
    tables (see ``gather_form``): TPU scatter-adds serialize per row
    (measured: the per-level translation scatter alone cost ~12 s per
    N=20480 matvec on the chip), so the chip path inverts every scatter
    into a padded target-side gather + reduction. ``None`` keeps the
    original scatter matvec (fine on CPU)."""

    clusters: jnp.ndarray  # (C, m) element ids (pad -> 0)
    cluster_mask: jnp.ndarray  # (C, m) 1/0
    t_tensor: jnp.ndarray  # (C, Q, m) aggregation
    s_tensor: jnp.ndarray  # (C, Q, m) disaggregation (to collocation pts)
    d_tensor: jnp.ndarray  # (C, C, Q) diagonal translations (0 for near)
    quad_w: jnp.ndarray  # (Q,)
    near_a: jnp.ndarray  # (P,) source cluster of each near pair
    near_b: jnp.ndarray  # (P,) target cluster
    near_blocks: jnp.ndarray  # (P, m, m) dense near-field blocks
    diag_add: jnp.ndarray  # (N,) identity/jump + self terms
    prefactor: jnp.ndarray  # scalar ik/(16 pi^2)
    near_of_tgt: Optional[jnp.ndarray] = None  # (C, Kn) pair ids, pad = P
    elem_pos: Optional[jnp.ndarray] = None  # (N,) flat index into (C*m)


def _pad_by_target(tgt: np.ndarray, n_targets: int, pad_value: int):
    """(C, K) table of item indices grouped by target (stable order),
    padded with ``pad_value`` — the scatter-to-gather inversion."""
    tgt = np.asarray(tgt, np.int64)
    counts = np.bincount(tgt, minlength=n_targets)
    kmax = max(int(counts.max(initial=0)), 1)
    table = np.full((n_targets, kmax), pad_value, np.int32)
    srt = np.argsort(tgt, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(len(tgt)) - starts[tgt[srt]]
    table[tgt[srt], rank] = srt.astype(np.int32)
    return table


def _elem_positions(clusters: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(N,) flat (cluster*m + slot) position of every element — valid
    because octree leaves partition the elements (each appears once)."""
    clusters = np.asarray(clusters)
    mask = np.asarray(mask)
    m = clusters.shape[1]
    cidx, sidx = np.nonzero(mask > 0)
    n = int(clusters[cidx, sidx].max()) + 1
    pos = np.zeros(n, np.int32)
    pos[clusters[cidx, sidx]] = (cidx * m + sidx).astype(np.int32)
    return pos


def gather_form(op):
    """Return a copy of an FMM operator whose matvec accumulates through
    padded target-side GATHER tables instead of scatter-adds — the
    TPU-native form (scatters serialize per row on the chip; gathers +
    lane reductions stream). Accepts SlfmmOperator / MlfmmTreeOperator /
    MlfmmOperator; numerics are identical (summation order within a
    target follows pair order)."""
    if isinstance(op, MlfmmTreeOperator):
        return MlfmmTreeOperator(_tree_gather_form(op.data), op.n)
    if isinstance(op, MlfmmOperator):
        d = op.data
        leaf = _slfmm_gather_form(d.leaf)
        coarse_pos = jnp.asarray(
            _elem_positions(np.asarray(d.coarse_clusters), np.asarray(d.coarse_mask))
        )
        return MlfmmOperator(
            d._replace(leaf=leaf, coarse_elem_pos=coarse_pos), op.n
        )
    if isinstance(op, SlfmmOperator):
        return SlfmmOperator(_slfmm_gather_form(op.data), op.n)
    raise TypeError(f"unsupported operator {type(op).__name__}")


def sel_form(op):
    """gather_form PLUS per-level 0/1 pair->target selection matrices so
    the hierarchical translation reduction runs as one MXU matmul per
    level (MlfmmLevel.sel). CHIP lowering: the dense (C, P) GEMMs would
    dominate a CPU matvec, so CPU execution keeps plain gather_form;
    numerics are identical up to sum reassociation (f32 matmul
    accumulation vs sequential pair order). Memory: sum_l C_l*P_l f32 —
    ~600 MB at the N=20480 bench tier."""
    if not isinstance(op, MlfmmTreeOperator):
        return gather_form(op)  # only the tree has per-level reductions
    d = _tree_gather_form(op.data)
    new_levels = []
    for lv in d.levels:
        n_pairs = int(lv.trans_tgt.shape[0])
        if n_pairs:
            c_here = int(lv.parent.shape[0])
            sel = np.zeros((c_here, n_pairs), np.float32)
            sel[np.asarray(lv.trans_tgt), np.arange(n_pairs)] = 1.0
            lv = lv._replace(sel=jnp.asarray(sel))
        new_levels.append(lv)
    return MlfmmTreeOperator(d._replace(levels=tuple(new_levels)), op.n)


def _slfmm_gather_form(d: SlfmmData) -> SlfmmData:
    near_of_tgt = _pad_by_target(
        np.asarray(d.near_b), d.clusters.shape[0], pad_value=d.near_b.shape[0]
    )
    elem_pos = _elem_positions(np.asarray(d.clusters), np.asarray(d.cluster_mask))
    return d._replace(
        near_of_tgt=jnp.asarray(near_of_tgt), elem_pos=jnp.asarray(elem_pos)
    )


@jax.tree_util.register_pytree_node_class
class SlfmmOperator(LinearOperator):
    """Matrix-free A x = (c I + near + S D T) x (slfmm.rs:150 matvec)."""

    def __init__(self, data: SlfmmData, n: int):
        self.data = data
        self.n = n

    def matvec(self, x):
        d = self.data
        xc = x[d.clusters] * d.cluster_mask.astype(x.dtype)  # (C, m)
        mu = _bmv(d.t_tensor, xc)  # up (see _bmv: no tiny batched matmuls)
        lam = jnp.sum(d.d_tensor * mu[None, :, :], axis=1)  # translate
        far = d.prefactor * jnp.sum(
            d.s_tensor * (d.quad_w.astype(x.dtype)[None, :, None] * lam[:, :, None]),
            axis=1,
        )
        # xa via the already-gathered (C, m) cluster values: x[clusters
        # [near_a]] is P*m SCALAR gathers from the (N,) vector — measured
        # 12.1 ms of the 25 ms N=20480 matvec (fmm_phase_profile n1);
        # xc[near_a] row-gathers the same masked values instead.
        xa = xc[d.near_a]
        near = _bmv(d.near_blocks, xa)
        if d.elem_pos is not None:  # scatter-free form (gather_form)
            nearp = jnp.concatenate(
                [near, jnp.zeros((1, near.shape[1]), near.dtype)]
            )
            near_t = jnp.sum(jnp.take(nearp, d.near_of_tgt, axis=0), axis=1)
            tot = (far + near_t) * d.cluster_mask.astype(x.dtype)
            return tot.reshape(-1)[d.elem_pos] + d.diag_add * x
        out = jnp.zeros(self.n, x.dtype)
        out = out.at[d.clusters.reshape(-1)].add((far * d.cluster_mask.astype(x.dtype)).reshape(-1))
        tgt = d.clusters[d.near_b]
        out = out.at[tgt.reshape(-1)].add(
            (near * d.cluster_mask[d.near_b].astype(x.dtype)).reshape(-1)
        )
        return out + d.diag_add * x

    def tree_flatten(self):
        return (self.data,), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def build_slfmm_system(
    mesh: SurfaceMesh,
    k: float,
    beta: complex = 0.0,
    max_per_leaf: int = 32,
    separation_ratio: float = 1.5,
    expansion_order: Optional[int] = None,
    dtype=None,
    stability_tau: float = 1.0e8,
    agg_phase_f32: bool = False,
) -> SlfmmOperator:
    """Assemble the SLFMM operator for the exterior CBIE
    (A = (1/2)I - D [- beta T_hyper off-diagonal approximation]).

    beta != 0 adds the Burton-Miller coupling using direction-space
    factors for the far field and exact near-field blocks.

    ``stability_tau``: translation-series amplitude headroom (see
    _stable_far_orders); 1e8 suits f64 execution, pass ~1e4 when the
    matvec will run in f32/c64 on the chip (bem/fmm_chip.py).
    """
    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements
    centers = mesh.centers
    normals = mesh.normals

    tree = Octree.build(centers, max_per_leaf=max_per_leaf)
    clusters, mask, c_centers, radii = _pack_clusters(tree.leaves, centers)

    # expansion order: L ~ k r_max + c log(k r_max + pi) (standard rule)
    if expansion_order is None:
        kr = k * radii.max()
        expansion_order = int(np.ceil(kr + 4 * np.log(kr + np.pi) + 4))
    dirs, w = unit_sphere_quadrature(expansion_order)

    # near/far classification + stability screen (unstable pairs demoted
    # to exact near blocks, remaining pairs' series stability-capped)
    dist = np.linalg.norm(c_centers[:, None] - c_centers[None, :], axis=-1)
    far = dist > separation_ratio * (radii[:, None] + radii[None, :])
    far, orders_pair = _stable_far_orders(
        k, c_centers, radii, far, expansion_order, stability_tau
    )

    # T: sum_g w_g e^{-ik s.(y_g - c_a)} * (-ik s.n_j) (double layer);
    # S: e^{+ik s.(x_i - c_b)}; D on far pairs — the shared level build.
    t_tensor, s_tensor, d_tensor = _level_tensors(
        mesh, clusters, mask, c_centers, far, k, dirs, w, expansion_order, dtype,
        orders_pair=orders_pair, phase_f32=agg_phase_f32,
    )
    if beta != 0.0:
        # Burton-Miller row factor: d/dn_x -> (ik s.n_x) in direction
        # space. The global prefactor already carries the CBIE minus
        # (S.D.T = -D), so +beta T needs the NEGATIVE factor here:
        # (1 - beta ik s.n_x) * (-D-form) = -D + beta T.
        s_tensor = _apply_bm_row_factor(
            s_tensor, jnp.asarray(dirs), jnp.asarray(normals[clusters]),
            jnp.asarray(beta * 1j * k),
        )

    # near-field: exact kernel blocks (regularized like the dense path)
    nb, na = np.where(~far)
    near_blocks = _near_blocks(
        mesh, clusters, mask, nb, na, k, beta, dtype
    )

    # Diagonal: jump term + the dense path's exact static row-sum
    # regularization of the double layer. The dense CBIE sets
    # D0_ii = -1/2 - row_sum_i (half-solid-angle identity), so
    # diag(A) = 1/2 - D0_ii = 1 + row_sum_i; the naive flat 1/2 left a
    # ~5e-3 matvec gap vs dense that was entirely diagonal. BM self
    # contributions stay inside the near blocks.
    diag_add = 1.0 + _static_dlp_row_sums(mesh, dtype).astype(complex)

    # S.D.T expands +D (the double layer); the CBIE is A = (1/2)I - D, so
    # the far field enters with a minus sign (near blocks carry their own).
    prefactor = -1j * k / (16.0 * np.pi**2)
    data = SlfmmData(
        clusters=jnp.asarray(clusters),
        cluster_mask=jnp.asarray(mask, dtype),
        t_tensor=jnp.asarray(t_tensor),  # build dtype (c64 when phase_f32)
        s_tensor=jnp.asarray(s_tensor),
        d_tensor=jnp.asarray(d_tensor, cdtype),
        quad_w=jnp.asarray(w, dtype),
        near_a=jnp.asarray(na.astype(np.int32)),
        near_b=jnp.asarray(nb.astype(np.int32)),
        near_blocks=near_blocks,
        diag_add=jnp.asarray(diag_add, cdtype),
        prefactor=jnp.asarray(prefactor, cdtype),
    )
    return SlfmmOperator(data, n)


def _static_hyper_row_sums(mesh, quad_order: int = 3, chunk: int = 256):
    """s0_i = sum_{j != i} T0_ij with the same quadrature the near blocks
    use. On a closed surface the exact row sum of the static hypersingular
    operator is zero, so the BM diagonal uses -s0 in place of the analytic
    finite-part self term — absorbing the poorly-converging near-singular
    quadrature error exactly as the dense path's row-sum correction
    (tbem.rs:526) does. Chunked over rows; O(N^2) elementwise on device."""
    dtype = default_float()
    qp, qw = mesh.quad_points(quad_order)
    centers = jnp.asarray(mesh.centers, dtype)
    normals = jnp.asarray(mesh.normals, dtype)
    qp = jnp.asarray(qp, dtype)
    qw = jnp.asarray(qw, dtype)
    n = mesh.num_elements

    @jax.jit
    def rows(centers, normals, qp, qw, i0):
        idx = i0 + jnp.arange(chunk)
        x = centers[idx][:, None, None, :]
        nx = normals[idx][:, None, None, :]
        y = qp[None, :, :, :]
        ny = normals[None, :, None, :]
        _, hyp0 = _static_pair_kernels(x, nx, y, ny)  # (chunk, N, nq)
        s = jnp.sum(hyp0 * qw[None, :, :], axis=(-1, -2))
        diag_term = jnp.sum(
            jnp.where(idx[:, None, None] == jnp.arange(n)[None, :, None],
                      hyp0 * qw[None, :, :], 0.0),
            axis=(-1, -2),
        )
        return s - diag_term

    out = np.zeros(n)
    for i0 in range(0, n, chunk):
        vals = np.asarray(rows(centers, normals, qp, qw, jnp.int32(i0)))
        take = min(chunk, n - i0)
        out[i0 : i0 + take] = vals[:take]
    return out


def _build_accel_device():
    """Optional accelerator for the heavy all-real / f32-plane build
    passes (static row sums, near-block quadrature). Enabled with
    MATHAUDIO_FMM_BUILD_DEVICE=default; returns None on CPU-only hosts.
    Only computations whose inputs/outputs cross the tunneled backend as
    REAL arrays are eligible (complex transport is unimplemented there);
    the cancellation-sensitive translation series stays on the host in
    f64 regardless."""
    import os

    if os.environ.get("MATHAUDIO_FMM_BUILD_DEVICE") != "default":
        return None
    try:
        d0 = jax.devices()[0]
        return d0 if d0.platform != "cpu" else None
    except Exception:
        return None


def _near_blocks(mesh, clusters, mask, nb, na, k, beta, dtype, quad_order: int = 3):
    """Exact near-field blocks (P, m, m): minus double layer (+ BM),
    with the same static regularization self terms as the dense path.

    The O(P m^2 nq) kernel quadrature runs in f32 (measured deviation at
    the N=20480/28k-pair tier: 2e-7 relative on the matvec — noise vs
    the 1e-4 dense-agreement gate). Always host-side: a chip A/B
    (2026-08-21) ran the quadrature in 0.2 s but shipping the (P, m, m)
    planes back through the tunnel into a cold host arena cost ~14 s on
    the one-shot build path (warm-arena reruns would win, but builds run
    once per process) — only tiny-output passes (_static_dlp_row_sums)
    go through _build_accel_device(). Diagonal self terms are a separate
    host jit in the build precision ``dtype``."""
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    kdtype = np.float32  # kernel-quadrature compute precision (see above)
    qp, qw = mesh.quad_points(quad_order)

    centers = jnp.asarray(mesh.centers, kdtype)
    normals = jnp.asarray(mesh.normals, kdtype)
    qp = jnp.asarray(qp, kdtype)
    qw = jnp.asarray(qw, kdtype)
    cl = jnp.asarray(clusters)
    mkf = jnp.asarray(mask, kdtype)
    nb_d = jnp.asarray(nb.astype(np.int32))
    na_d = jnp.asarray(na.astype(np.int32))

    # All device arrays enter the jit as ARGUMENTS (CLAUDE.md: tunneled
    # backends cannot constant-fold captured device arrays); only python
    # scalars (k, beta) and shapes are closed over.
    @partial(jax.jit, static_argnums=0)
    def base_blocks(pc, centers, normals, qp, qw, cl, mkf, nb_d, na_d):
        # Pair axis tiled with lax.map: the broadcast intermediates
        # ((pc, m, m, nq, 3) displacement vectors etc.) would stream
        # ~5 GB through memory at the 28k-pair tier if built whole; at
        # pc=64 each tile's working set is ~10 MB and the kernel chain
        # stays cache-resident on the host (measured 5.8 s -> ~2.5 s).
        def tile(args):
            nb_c, na_c = args
            bi = cl[nb_c]  # (pc, m) target element ids
            ai = cl[na_c]  # (pc, m) source
            x = centers[bi][:, :, None, None, :]
            nx = normals[bi][:, :, None, None, :]
            y = qp[ai][:, None, :, :, :]
            ny = normals[ai][:, None, :, None, :]
            dg, hyp = _pair_kernels(x, nx, y, ny, k)  # (pc, mi, mj, nq) c64
            w = qw[ai][:, None, :, :]  # REAL weights: complex*real multiply
            blk = -jnp.sum(dg * w, axis=-1)
            if beta != 0.0:
                blk = blk + jnp.asarray(beta, dg.dtype) * jnp.sum(hyp * w, axis=-1)
            # mask: zero padded rows/cols and the i == j entries (self
            # handled by the host-side analytic radial terms)
            same = bi[:, :, None] == ai[:, None, :]
            mask3 = (jnp.where(same, 0.0, 1.0)
                     * mkf[nb_c][:, :, None]
                     * mkf[na_c][:, None, :])
            return blk * mask3

        p = nb_d.shape[0]
        pad = (-p) % pc
        nb_p = jnp.concatenate([nb_d, jnp.zeros(pad, nb_d.dtype)])
        na_p = jnp.concatenate([na_d, jnp.zeros(pad, na_d.dtype)])
        m = cl.shape[1]
        blk = jax.lax.map(
            tile, (nb_p.reshape(-1, pc), na_p.reshape(-1, pc))
        ).reshape(p + pad, m, m)[:p]
        return blk.astype(cdtype)
        # ^ stored in the build precision: the f64-planes exactness
        # contract (tests/test_fmm_chip.py solve-matches-complex) needs
        # the complex path and the re/im planes to read identical-dtype
        # tensors; the values are f32-accurate either way.

    blk = base_blocks(64, centers, normals, qp, qw, cl, mkf, nb_d, na_d)

    if beta != 0.0:
        # self terms on diagonal pairs: analytic radial (T_k - T_0) self
        # plus -s0 (global static row-sum correction) in place of the
        # analytic static finite part — the dense path's exact-row-sum
        # regularization (tbem.rs:526) carried over to the FMM near
        # field. Host-side, O(P m) work in the build precision.
        self_r, self_w = _self_angular_rule(mesh)
        s0 = _static_hyper_row_sums(mesh, quad_order)

        @jax.jit
        def add_self(blk, diag_pair, rr, ww, s0_cl, mk_b):
            ik = jnp.asarray(1j * k, cdtype)
            rr = rr.astype(cdtype)
            t_diff = jnp.sum(
                ww.astype(cdtype) * (ik - (jnp.exp(ik * rr) - 1.0) / rr),
                axis=-1,
            ) / (4 * jnp.pi)
            t_self = (t_diff - s0_cl.astype(cdtype)) * mk_b.astype(cdtype)
            eye = jnp.eye(blk.shape[1], dtype=cdtype)
            return blk + jnp.where(
                diag_pair[:, None, None],
                eye[None] * (jnp.asarray(beta, cdtype) * t_self)[:, :, None],
                0.0,
            )

        cl_nb = clusters[nb]  # (P, m) host gather, small
        blk = add_self(
            blk,
            jnp.asarray(nb == na),
            jnp.asarray(self_r[cl_nb], dtype),
            jnp.asarray(self_w[cl_nb], dtype),
            jnp.asarray(s0[cl_nb], dtype),
            jnp.asarray(mask[nb], dtype),
        )
    return blk


def _near_blocks_mixed(mesh, clusters, mask, nb, na, k, beta, m_elem, adm_elem,
                       dtype, quad_order: int = 3):
    """Near-field blocks for the mixed-BC SLFMM: per-column combination of
    the off-diagonal Ap = -D + beta T and Aq = S - beta K' entries
    (assembly._mixed_rows off-diagonal math restricted to near cluster
    pairs). Returns (blk_main, blk_comp): main applies Ap to unknown-p
    columns (plus the -ik adm single-layer coupling) and Aq to unknown-q
    columns; comp swaps the roles (prescribed values -> RHS). Same-element
    entries are zeroed — ALL self/jump terms live in the operator
    diagonal."""
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    qp, qw = mesh.quad_points(quad_order)
    centers = jnp.asarray(mesh.centers, dtype)
    normals = jnp.asarray(mesh.normals, dtype)
    qp = jnp.asarray(qp, dtype)
    qw = jnp.asarray(qw, dtype)
    cl = jnp.asarray(clusters)
    mk = jnp.asarray(mask, dtype)
    m_d = jnp.asarray(m_elem, dtype)
    adm_d = jnp.asarray(adm_elem, cdtype)

    @jax.jit
    def blocks(centers, normals, qp, qw, cl, mk, m_d, adm_d, nb_d, na_d):
        bi = cl[nb_d]  # (P, mi) target element ids (rows)
        ai = cl[na_d]  # (P, mj) source element ids (columns)
        x = centers[bi][:, :, None, None, :]
        nx = normals[bi][:, :, None, None, :]
        y = qp[ai][:, None, :, :, :]
        ny = normals[ai][:, None, :, None, :]
        dg, hyp = _pair_kernels(x, nx, y, ny, k)  # (P, mi, mj, nq)
        w = qw[ai][:, None, :, :].astype(cdtype)
        bconst = jnp.asarray(beta, cdtype)
        ap_off = -jnp.sum(dg * w, axis=-1)
        if beta != 0.0:
            ap_off = ap_off + bconst * jnp.sum(hyp * w, axis=-1)
        # single layer + adjoint double layer (kernels as _mixed_rows)
        rv = y - x
        r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
        rs = jnp.where(r < 1e-15, 1.0, r)
        g = jnp.exp(1j * (k * rs).astype(cdtype)) / (4.0 * jnp.pi * rs)
        aq_off = jnp.sum(g * w, axis=-1)
        if beta != 0.0:
            ik = jnp.asarray(1j * k, cdtype)
            kp = -(ik - 1.0 / rs) * g * jnp.sum(rv * nx, axis=-1) / rs
            aq_off = aq_off - bconst * jnp.sum(kp * w, axis=-1)
        mc = m_d[ai][:, None, :].astype(cdtype)  # (P, 1, mj)
        ikadm = (-1j * jnp.asarray(k, cdtype)) * adm_d[ai][:, None, :]
        blk_main = ap_off * mc + aq_off * (ikadm * mc + (1.0 - mc))
        blk_comp = ap_off * (1.0 - mc) + aq_off * mc
        same = bi[:, :, None] == ai[:, None, :]
        pair_mask = (
            mk[nb_d][:, :, None].astype(cdtype) * mk[na_d][:, None, :].astype(cdtype)
        )
        zero = jnp.asarray(0.0, cdtype)
        blk_main = jnp.where(same, zero, blk_main) * pair_mask
        blk_comp = jnp.where(same, zero, blk_comp) * pair_mask
        return blk_main, blk_comp

    return blocks(centers, normals, qp, qw, cl, mk, m_d, adm_d,
                  jnp.asarray(nb.astype(np.int32)), jnp.asarray(na.astype(np.int32)))


def build_slfmm_mixed_system(
    mesh: SurfaceMesh,
    k: float,
    bc,
    beta: complex = 0.0,
    incident=None,
    density: float = 1.204,
    speed_of_sound: float = 343.0,
    max_per_leaf: int = 64,
    separation_ratio: float = 2.0,
    expansion_order: Optional[int] = None,
    quad_order: int = 3,
    dtype=None,
    stability_tau: float = 1.0e8,
):
    """Matrix-free SLFMM system for per-element velocity/pressure BCs —
    the FMM analog of assembly.assemble_mixed_system (tbem.rs:323
    BC-dependent columns; the reference's own SLFMM only switches the
    free term, slfmm.rs:524-531 — this build also routes prescribed
    values to the RHS, so inhomogeneous BCs work at FMM scale).

    System convention (matches the dense mixed path exactly):
        Ap = 1/2 I - D + beta T       (columns where p is the unknown)
        Aq = S - beta (1/2 I + K')    (columns where q = dp/dn is unknown)

    TPU mapping: the far field selects the layer PER COLUMN through the
    direction-space aggregation factor f_j = m_j (-ik s.n_j + ik adm_j)
    - (1 - m_j) under the CBIE-minus prefactor; the Burton-Miller
    disaggregation factor (1 - beta ik s.n_x) then produces -D + beta T
    and S - beta K' simultaneously (d/dn_x is diagonal in direction
    space for both layers). Prescribed values enter the RHS through a
    complementary-column operator sharing the same translations and
    disaggregation.

    Returns (operator, rhs, unknown_p) with the same solution-vector
    semantics as the dense path: u holds p on velocity elements and
    dp/dn on pressure elements."""
    from mathaudio_tpu.bem.assembly import single_layer_self_terms

    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements
    centers = mesh.centers
    normals = mesh.normals

    bc_types = np.asarray(bc.types, np.int32)
    bc_values = np.asarray(bc.values, complex)
    assert bc_types.shape == (n,) and bc_values.shape == (n,)
    m = (bc_types == 0).astype(float)  # 1 where p is the unknown (velocity BC)
    omega = k * speed_of_sound
    q_known = np.where(bc_types == 0, 1j * omega * density * bc_values, 0.0)
    p_known = np.where(bc_types == 1, bc_values, 0.0)
    adm = getattr(bc, "admittance", None)
    adm_arr = (
        np.zeros(n, complex) if adm is None
        else np.broadcast_to(np.asarray(adm, complex), (n,)).astype(complex)
    )

    tree = Octree.build(centers, max_per_leaf=max_per_leaf)
    clusters, mask, c_centers, radii = _pack_clusters(tree.leaves, centers)

    if expansion_order is None:
        kr = k * radii.max()
        expansion_order = int(np.ceil(kr + 4 * np.log(kr + np.pi) + 4))
    dirs, w = unit_sphere_quadrature(expansion_order)

    dist = np.linalg.norm(c_centers[:, None] - c_centers[None, :], axis=-1)
    far = dist > separation_ratio * (radii[:, None] + radii[None, :])
    far, orders_pair = _stable_far_orders(
        k, c_centers, radii, far, expansion_order, stability_tau
    )

    # Far-field column factors under the CBIE-minus prefactor: +S needs
    # sigma = -1 (the global minus flips it), and the admittance coupling
    # (-ik adm) * (+S) lands as sigma = +ik adm on unknown-p columns.
    alpha_main = m.astype(complex)
    sigma_main = 1j * k * adm_arr * m - (1.0 - m)
    alpha_comp = (1.0 - m).astype(complex)
    sigma_comp = -m.astype(complex)
    t_main, s_tensor = _agg_disagg_tensors(
        mesh, clusters, mask, c_centers, k, dirs,
        agg_alpha=alpha_main, agg_sigma=sigma_main,
    )
    t_comp, _ = _agg_disagg_tensors(
        mesh, clusters, mask, c_centers, k, dirs,
        agg_alpha=alpha_comp, agg_sigma=sigma_comp,
    )
    if beta != 0.0:
        # shared Burton-Miller row factor (see build_slfmm_system)
        s_tensor = _apply_bm_row_factor(
            s_tensor, jnp.asarray(dirs), jnp.asarray(normals[clusters]),
            jnp.asarray(beta * 1j * k),
        )

    c_count, q_dirs = len(c_centers), len(dirs)
    fb, fa = np.where(far)
    if len(fb):
        vals = _translation_padded(
            k, c_centers[fb] - c_centers[fa], dirs, expansion_order,
            np.asarray(orders_pair, np.int32), as_jax=True,
        )
        d_tensor = (
            jnp.zeros((c_count, c_count, q_dirs), vals.dtype)
            .at[jnp.asarray(fb), jnp.asarray(fa)]
            .set(vals)
        )
    else:
        d_tensor = np.zeros((c_count, c_count, q_dirs), complex)

    nb, na = np.where(~far)
    blk_main, blk_comp = _near_blocks_mixed(
        mesh, clusters, mask, nb, na, k, beta, m, adm_arr, dtype,
        quad_order=quad_order,
    )

    # Diagonals (dense-path formulas, assembly._mixed_rows):
    #   ap_diag = 1/2 - D0_ii (+ beta t_self) = 1 + rowsum0 + beta t_self
    #   aq_diag = S_ii - beta/2                       (flat-element K'_ii = 0)
    rowsum0 = _static_dlp_row_sums(mesh, dtype)
    ap_diag = (1.0 + rowsum0).astype(complex)
    if beta != 0.0:
        self_r, self_w = _self_angular_rule(mesh)
        ikc = 1j * k
        t_diff_self = np.sum(
            self_w * (ikc - (np.exp(ikc * self_r) - 1.0) / self_r), axis=1
        ) / (4.0 * np.pi)
        s0 = _static_hyper_row_sums(mesh, quad_order)
        ap_diag = ap_diag + beta * (t_diff_self - s0)
    s_self = np.asarray(single_layer_self_terms(mesh, k, dtype=dtype))
    aq_diag = s_self - (beta / 2.0 if beta != 0.0 else 0.0)
    diag_main = m * (ap_diag + (-1j * k * adm_arr) * aq_diag) + (1.0 - m) * aq_diag
    diag_comp = m * aq_diag + (1.0 - m) * ap_diag

    prefactor = -1j * k / (16.0 * np.pi**2)

    def _data(t_tensor, near_b, diag):
        return SlfmmData(
            clusters=jnp.asarray(clusters),
            cluster_mask=jnp.asarray(mask, dtype),
            t_tensor=jnp.asarray(t_tensor, cdtype),
            s_tensor=jnp.asarray(s_tensor, cdtype),
            d_tensor=jnp.asarray(d_tensor, cdtype),
            quad_w=jnp.asarray(w, dtype),
            near_a=jnp.asarray(na.astype(np.int32)),
            near_b=jnp.asarray(nb.astype(np.int32)),
            near_blocks=near_b,
            diag_add=jnp.asarray(diag, cdtype),
            prefactor=jnp.asarray(prefactor, cdtype),
        )

    op = SlfmmOperator(_data(t_main, blk_main, diag_main), n)
    comp_op = SlfmmOperator(_data(t_comp, blk_comp, diag_comp), n)

    centers_j = jnp.asarray(centers, dtype)
    if incident is not None:
        rhs_inc = incident.pressure(centers_j, k).astype(cdtype)
        if beta != 0.0:
            rhs_inc = rhs_inc - jnp.asarray(beta, cdtype) * incident.normal_derivative(
                centers_j, jnp.asarray(normals, dtype), k
            ).astype(cdtype)
    else:
        rhs_inc = jnp.zeros(n, cdtype)
    known = jnp.asarray(q_known * m + p_known * (1.0 - m), cdtype)
    rhs = rhs_inc - comp_op.matvec(known)
    return op, rhs, bc_types == 0


class MlfmmData(NamedTuple):
    """Two-level FMM pytree: leaf level (near blocks + leaf-far
    translations) plus a coarse level handling pairs that are far at the
    parent scale (mlfmm.rs upward/downward passes flattened into direct
    per-level aggregation — exact, static-shape)."""

    leaf: SlfmmData  # near blocks + leaf-level far pairs (parents near)
    coarse_clusters: jnp.ndarray  # (Cc, mc) element ids
    coarse_mask: jnp.ndarray  # (Cc, mc)
    coarse_t: jnp.ndarray  # (Cc, Qc, mc)
    coarse_s: jnp.ndarray  # (Cc, Qc, mc)
    coarse_d: jnp.ndarray  # (Cc, Cc, Qc)
    coarse_w: jnp.ndarray  # (Qc,)
    coarse_prefactor: jnp.ndarray
    coarse_elem_pos: Optional[jnp.ndarray] = None  # (N,) gather_form


@jax.tree_util.register_pytree_node_class
class MlfmmOperator(LinearOperator):
    """Matrix-free multi-level matvec (mlfmm.rs:954 MlfmmSystem::matvec)."""

    def __init__(self, data: MlfmmData, n: int):
        self.data = data
        self.n = n

    def matvec(self, x):
        out = SlfmmOperator(self.data.leaf, self.n).matvec(x)
        d = self.data
        xc = x[d.coarse_clusters] * d.coarse_mask.astype(x.dtype)
        mu = _bmv(d.coarse_t, xc)
        lam = jnp.sum(d.coarse_d * mu[None, :, :], axis=1)
        far = d.coarse_prefactor * jnp.sum(
            d.coarse_s
            * (d.coarse_w.astype(x.dtype)[None, :, None] * lam[:, :, None]),
            axis=1,
        )
        far = far * d.coarse_mask.astype(x.dtype)
        if d.coarse_elem_pos is not None:  # scatter-free (gather_form)
            return out + far.reshape(-1)[d.coarse_elem_pos]
        out = out.at[d.coarse_clusters.reshape(-1)].add(far.reshape(-1))
        return out

    def tree_flatten(self):
        return (self.data,), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def _pack_clusters(nodes, centers):
    """Pad octree nodes to one uniform cluster size: (element-id table,
    mask, cluster centers, radii). Shared by every FMM build."""
    c = len(nodes)
    m = max(len(nd.indices) for nd in nodes)
    cl = np.zeros((c, m), np.int32)
    mk = np.zeros((c, m))
    cc = np.zeros((c, 3))
    rr = np.zeros(c)
    for i, nd in enumerate(nodes):
        idx = nd.indices
        cl[i, : len(idx)] = idx
        mk[i, : len(idx)] = 1.0
        cc[i] = centers[idx].mean(axis=0)
        rr[i] = np.linalg.norm(centers[idx] - cc[i], axis=1).max() + 1e-12
    return cl, mk, cc, rr


@jax.jit
def _agg_disagg_jit(yg_rel, qw_cl, n_cl, y_rel, dirs, mask, k, alpha_cl, sigma_cl):
    """Jitted core of `_agg_disagg_tensors` (k and the per-element factor
    coefficients are traced so a frequency sweep reuses one compilation
    per level geometry). The per-source direction-space factor is
    ``alpha_j * (-ik s.n_j) + sigma_j`` — alpha=1/sigma=0 is the plain
    double layer; per-element (alpha, sigma) select the layer per column
    for mixed boundary conditions."""
    phase_g = jnp.einsum("qd,cmgd->cqmg", dirs, yg_rel)
    s_dot_ny = jnp.einsum("qd,cmd->cqm", dirs, n_cl)
    ik = jax.lax.complex(jnp.zeros_like(k), k)
    factor = alpha_cl[:, None, :] * (-ik * s_dot_ny) + sigma_cl[:, None, :]
    t_tensor = (
        jnp.einsum("cqmg,cmg->cqm", jnp.exp(-ik * phase_g), qw_cl.astype(ik.dtype))
        * factor
        * mask[:, None, :]
    )
    phase_y = jnp.einsum("qd,cmd->cqm", dirs, y_rel)
    s_tensor = jnp.exp(ik * phase_y) * mask[:, None, :].astype(ik.dtype)
    return t_tensor, s_tensor


def _agg_disagg_tensors(mesh, clusters, mask, c_centers, k, dirs, agg_offset=0.0,
                        single_layer=False, agg_alpha=None, agg_sigma=None,
                        phase_f32=False):
    """(T, S) padded aggregation/disaggregation tensors for one level.

    ``agg_offset``: extra additive term in the per-source direction-space
    factor (-ik s.n_y + agg_offset) — the interior room system merges its
    admittance single layer into the aggregation as offset -ik beta.

    ``single_layer``: drop the double-layer normal factor entirely so the
    aggregation expands the plain single layer G (factor 1 per source
    point) — used by the radiating-field evaluator for the -G q term of
    the Kirchhoff-Helmholtz formula (pressure.rs field sweep with
    dp/dn != 0).

    ``agg_alpha`` / ``agg_sigma``: per-element (N,) complex coefficients
    of the factor alpha_j * (-ik s.n_j) + sigma_j, overriding the scalar
    forms above — the mixed-BC builder selects double layer (alpha=1) or
    single layer (sigma=+-1) per column with these."""
    centers = mesh.centers
    normals = mesh.normals
    qp_e, qw_e = mesh.quad_points(2)
    yg_rel = qp_e[clusters] - c_centers[:, None, None, :]
    y_rel = centers[clusters] - c_centers[:, None, :]
    cdt = np.complex128 if jax.config.jax_enable_x64 else np.complex64
    n = len(centers)
    if agg_alpha is None and agg_sigma is None:
        if single_layer:
            alpha = np.zeros(n, cdt)
            sigma = np.ones(n, cdt)
        else:
            alpha = np.ones(n, cdt)
            sigma = np.full(n, complex(agg_offset), cdt)
    else:
        alpha = np.zeros(n, cdt) if agg_alpha is None else np.asarray(agg_alpha, cdt)
        sigma = np.zeros(n, cdt) if agg_sigma is None else np.asarray(agg_sigma, cdt)
    # Aggregation precision is coupled to the build's translation
    # stability screen. At the default tau=1e8 the phases MUST stay f64:
    # an f32 experiment (2026-08-21) regressed the dense-agreement gate
    # 4e-6 -> 1e-3 — f32 rounding noise in the signature is not
    # band-limited, and the screened translation series (terms up to
    # tau) amplifies exactly the out-of-band content the screen assumes
    # absent. At tau<=1e5 (the f32/chip-execution builds) the same
    # argument caps the amplified noise near 1e-6 — empirically the
    # all-f32 chip matvec gates at 2.2e-6 — so ``phase_f32`` lets those
    # builds halve the exp cost. Near blocks / static row sums have no
    # such amplification and always run in f32.
    pdt = np.float32 if phase_f32 else None
    cdt_p = np.complex64 if phase_f32 else None
    t_tensor, s_tensor = _agg_disagg_jit(
        jnp.asarray(yg_rel, pdt),
        jnp.asarray(qw_e[clusters], pdt),
        jnp.asarray(normals[clusters], pdt),
        jnp.asarray(y_rel, pdt),
        jnp.asarray(dirs, pdt),
        jnp.asarray(mask, pdt),
        jnp.asarray(float(k), pdt),
        jnp.asarray(alpha[clusters], cdt_p),
        jnp.asarray(sigma[clusters], cdt_p),
    )
    # Returned as CPU-jax arrays: the (C, Q, m) tensors are the largest
    # build products (260 MB at the N=20480 tier) and a numpy round-trip
    # costs ~9 s of cold-page bandwidth on this host (build profile
    # 2026-08-21); every consumer jnp.asarray()s them anyway.
    return t_tensor, s_tensor


@jax.jit
def _apply_bm_row_factor(s_tensor, dirs, n_cl, beta_ik):
    """Burton-Miller row factor (1 - beta ik s.n_x) applied in-trace —
    the host never materializes the (C, Q, m) factor (cold-page numpy)."""
    s_nx = jnp.einsum("qd,cmd->cqm", dirs, n_cl)
    return s_tensor * (1.0 - beta_ik * s_nx)


def _level_tensors(mesh, clusters, mask, c_centers, far, k, dirs, w, order, dtype,
                   agg_offset=0.0, orders_pair=None, phase_f32=False):
    """(T, S, D) padded tensors for one level (shared by SL and ML).
    ``orders_pair``: per-far-pair series truncation (np.where(far) order)
    from the stability screen; None = uniform level order."""
    t_tensor, s_tensor = _agg_disagg_tensors(mesh, clusters, mask, c_centers, k, dirs,
                                             agg_offset, phase_f32=phase_f32)
    c_count, q = len(c_centers), len(dirs)
    fb, fa = np.where(far)
    if not len(fb):
        return t_tensor, s_tensor, np.zeros((c_count, c_count, q), complex)
    d_vecs = c_centers[fb] - c_centers[fa]
    if orders_pair is None:
        orders_pair = np.full(len(fb), order, np.int32)
    # build + scatter stay on the CPU-jax side: no (P, Q) numpy copy and
    # no (C, C, Q) numpy zeros cold-touch (see _translation_padded)
    vals = _translation_padded(k, d_vecs, dirs, order, orders_pair, as_jax=True)
    d_tensor = (
        jnp.zeros((c_count, c_count, q), vals.dtype)
        .at[jnp.asarray(fb), jnp.asarray(fa)]
        .set(vals)
    )
    return t_tensor, s_tensor, d_tensor


def build_mlfmm_system(
    mesh: SurfaceMesh,
    k: float,
    max_per_leaf: int = 32,
    separation_ratio: float = 1.5,
    dtype=None,
    stability_tau: float = 1.0e8,
    agg_phase_f32: bool = False,
) -> MlfmmOperator:
    """Two-level FMM (mlfmm.rs:979 build_mlfmm_system): pairs that are
    far at the coarse (parent) scale translate between coarse clusters
    with the coarse expansion order; remaining far pairs translate at the
    leaf level; neighbors stay dense. Aggregation goes element->level
    directly (no M2M interpolation), keeping shapes static and exact."""
    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements
    centers = mesh.centers

    tree = Octree.build(centers, max_per_leaf=max_per_leaf)
    leaves = tree.leaves
    parents = Octree.build(centers, max_per_leaf=max_per_leaf * 8).leaves

    cl_f, mk_f, cc_f, r_f = _pack_clusters(leaves, centers)
    cl_c, mk_c, cc_c, r_c = _pack_clusters(parents, centers)

    # parent of each leaf: the coarse cluster containing its first element
    elem_to_coarse = np.zeros(n, np.int32)
    for ci, nd in enumerate(parents):
        elem_to_coarse[nd.indices] = ci
    leaf_parent = elem_to_coarse[cl_f[:, 0]]

    d_f = np.linalg.norm(cc_f[:, None] - cc_f[None, :], axis=-1)
    far_leaf = d_f > separation_ratio * (r_f[:, None] + r_f[None, :])
    d_c = np.linalg.norm(cc_c[:, None] - cc_c[None, :], axis=-1)
    far_coarse = d_c > separation_ratio * (r_c[:, None] + r_c[None, :])

    kr_f = k * r_f.max()
    order_f = int(np.ceil(kr_f + 4 * np.log(kr_f + np.pi) + 4))
    kr_c = k * r_c.max()
    order_c = int(np.ceil(kr_c + 4 * np.log(kr_c + np.pi) + 4))

    # Stability screen first at the coarse level (demoted pairs fall to
    # the leaf level), then at the leaf level (demoted pairs fall to
    # exact near blocks) — graceful wideband degradation.
    far_coarse, orders_c = _stable_far_orders(
        k, cc_c, r_c, far_coarse, order_c, stability_tau
    )
    # leaf pairs whose parents are far are handled at the coarse level
    parents_far = far_coarse[leaf_parent[:, None], leaf_parent[None, :]]
    far_leaf_only = far_leaf & ~parents_far
    far_leaf_only, orders_f = _stable_far_orders(
        k, cc_f, r_f, far_leaf_only, order_f, stability_tau
    )
    near_leaf = ~far_leaf_only & ~parents_far

    dirs_f, w_f = unit_sphere_quadrature(order_f)
    dirs_c, w_c = unit_sphere_quadrature(order_c)

    t_f, s_f, d_tf = _level_tensors(mesh, cl_f, mk_f, cc_f, far_leaf_only, k,
                                    dirs_f, w_f, order_f, dtype,
                                    orders_pair=orders_f,
                                    phase_f32=agg_phase_f32)
    t_c, s_c, d_tc = _level_tensors(mesh, cl_c, mk_c, cc_c, far_coarse, k,
                                    dirs_c, w_c, order_c, dtype,
                                    orders_pair=orders_c,
                                    phase_f32=agg_phase_f32)

    nb, na = np.where(near_leaf)
    near_blocks = _near_blocks(mesh, cl_f, mk_f, nb, na, k, 0.0, dtype)
    # same exact static row-sum diagonal as build_slfmm_system
    diag_add = 1.0 + _static_dlp_row_sums(mesh, dtype).astype(complex)
    pref = -1j * k / (16.0 * np.pi**2)

    leaf_data = SlfmmData(
        clusters=jnp.asarray(cl_f),
        cluster_mask=jnp.asarray(mk_f, dtype),
        t_tensor=jnp.asarray(t_f),
        s_tensor=jnp.asarray(s_f),
        d_tensor=jnp.asarray(d_tf, cdtype),
        quad_w=jnp.asarray(w_f, dtype),
        near_a=jnp.asarray(na.astype(np.int32)),
        near_b=jnp.asarray(nb.astype(np.int32)),
        near_blocks=near_blocks,
        diag_add=jnp.asarray(diag_add, cdtype),
        prefactor=jnp.asarray(pref, cdtype),
    )
    data = MlfmmData(
        leaf=leaf_data,
        coarse_clusters=jnp.asarray(cl_c),
        coarse_mask=jnp.asarray(mk_c, dtype),
        coarse_t=jnp.asarray(t_c),
        coarse_s=jnp.asarray(s_c),
        coarse_d=jnp.asarray(d_tc, cdtype),
        coarse_w=jnp.asarray(w_c, dtype),
        coarse_prefactor=jnp.asarray(pref, cdtype),
    )
    return MlfmmOperator(data, n)


def estimate_num_levels(n_elements: int, max_per_leaf: int = 32) -> int:
    """mlfmm.rs estimate_num_levels analog."""
    import math

    return max(2, int(math.ceil(math.log(max(n_elements / max_per_leaf, 1), 8))) + 1)


def build_room_fmm_system(
    mesh: SurfaceMesh,
    k: float,
    admittance: float = 0.0,
    max_per_leaf: int = 32,
    separation_ratio: float = 2.0,
    expansion_order: Optional[int] = None,
    dtype=None,
    stability_tau: float = 1.0e8,
) -> SlfmmOperator:
    """FMM operator for the *interior* room system
    A = (1/2)I + D - ik beta S  (room_acoustics/solver.rs:909
    build_fmm_system + solve_bem_fmm_gmres_ilu path).

    The double layer and the admittance-scaled single layer share the
    same translations/disaggregation, so they merge into one aggregation
    factor (-ik s.n_j - ik beta) per source element.
    """
    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements
    centers = mesh.centers
    normals = mesh.normals

    tree = Octree.build(centers, max_per_leaf=max_per_leaf)
    clusters, mask, c_centers, radii = _pack_clusters(tree.leaves, centers)

    if expansion_order is None:
        kr = k * radii.max()
        expansion_order = int(np.ceil(kr + 4 * np.log(kr + np.pi) + 4))
    dirs, w = unit_sphere_quadrature(expansion_order)
    dist = np.linalg.norm(c_centers[:, None] - c_centers[None, :], axis=-1)
    far = dist > separation_ratio * (radii[:, None] + radii[None, :])
    far, orders_pair = _stable_far_orders(
        k, c_centers, radii, far, expansion_order, stability_tau
    )

    # +D and -ik*beta*S merged into the aggregation factor
    # (-ik s.n) + (-ik beta) — the shared level build with agg_offset.
    t_tensor, s_tensor, d_tensor = _level_tensors(
        mesh, clusters, mask, c_centers, far, k, dirs, w, expansion_order, dtype,
        agg_offset=-1j * k * admittance, orders_pair=orders_pair,
    )

    nb, na = np.where(~far)
    near_blocks = _room_near_blocks(mesh, clusters, mask, nb, na, k, admittance, dtype)

    # Self terms: jump + static-D0 solid-angle diagonal - ik beta S_ii.
    # The dense path (room_acoustics._room_matrix) forces each static
    # double-layer row to sum to -1/2, i.e. D0_ii = -1/2 - row_sum_i, so
    # diag(A) = 1/2 + D0_ii - ik beta S_ii = -row_sum_i - ik beta S_ii.
    # This absorbs both quadrature error and the mesh's normal
    # orientation (room meshes carry into-the-fluid normals, where the
    # naive +1/2 diagonal is wrong by exactly 1 — see
    # tests/test_fmm.py::TestRoomFmm::test_room_mesh_matvec_vs_dense).
    from mathaudio_tpu.bem.assembly import single_layer_self_terms

    s_self = np.asarray(single_layer_self_terms(mesh, k, dtype=dtype))
    row0 = _static_dlp_row_sums(mesh, dtype)
    diag_add = -row0 - 1j * k * admittance * s_self

    data = SlfmmData(
        clusters=jnp.asarray(clusters),
        cluster_mask=jnp.asarray(mask, dtype),
        t_tensor=jnp.asarray(t_tensor),  # build dtype (c64 when phase_f32)
        s_tensor=jnp.asarray(s_tensor),
        d_tensor=jnp.asarray(d_tensor, cdtype),
        quad_w=jnp.asarray(w, dtype),
        near_a=jnp.asarray(na.astype(np.int32)),
        near_b=jnp.asarray(nb.astype(np.int32)),
        near_blocks=near_blocks,
        diag_add=jnp.asarray(diag_add, cdtype),
        # interior system adds +D (and the merged -ik beta S): positive sign
        prefactor=jnp.asarray(1j * k / (16.0 * np.pi**2), cdtype),
    )
    return SlfmmOperator(data, n)


def _static_dlp_row_sums(mesh: SurfaceMesh, dtype, chunk: int = 512) -> np.ndarray:
    """sum_{j != i} int_elem_j dG0/dn_y(x_i, y) dS — the static
    double-layer row sums the dense interior path folds into its
    solid-angle diagonal (room_acoustics._room_matrix: d0 diagonal is
    set to -1/2 - row_sum so each D0 row sums to the half-solid-angle
    value regardless of mesh normal orientation or quadrature error).

    One-time O(N^2 nq) pass: f32 compute (measured deviation vs f64 at
    N=5120: 1.5e-6 relative on 1+rowsum — far inside every consumer's
    1e-4 gate, and 2x the single-core SIMD width of this host), a single
    jit with lax.scan over row chunks (one compile, persistent-cached).
    ``MATHAUDIO_FMM_BUILD_DEVICE=default`` runs the pass on the default
    accelerator instead — the kernel is all-real, so it crosses the
    tunneled TPU backend (sub-second vs ~7 s host at N=20480)."""
    qp, qw = mesh.quad_points(3)
    n = mesh.num_elements
    nc = -(-n // chunk)
    idx = (np.arange(nc * chunk) % n).astype(np.int32)  # wrapped pad rows

    dev = _build_accel_device()

    f32 = np.float32
    args = (mesh.centers.astype(f32), mesh.normals.astype(f32),
            qp.astype(f32), qw.astype(f32), idx.reshape(nc, chunk))
    if dev is not None:
        args = jax.device_put(args, dev)

    @jax.jit
    def all_rows(centers_, normals_, qp_, qw_, idx_2d):
        def body(carry, idx_c):
            x = centers_[idx_c][:, None, None, :]
            nx = jnp.zeros_like(x)  # unused by the double layer
            y = qp_[None, :, :, :]
            ny = normals_[None, :, None, :]
            dg0, _ = _static_pair_kernels(x, nx, y, ny)
            s = jnp.sum(dg0 * qw_[None, :, :], axis=-1)  # (chunk, N)
            cols = jnp.arange(n, dtype=idx_c.dtype)[None, :]
            s = jnp.where(cols == idx_c[:, None], 0.0, s)  # drop self col
            return carry, jnp.sum(s, axis=1)

        _, out = jax.lax.scan(body, 0, idx_2d)
        return out.reshape(-1)

    return np.asarray(all_rows(*args))[:n].astype(np.float64)


def _room_near_blocks(mesh, clusters, mask, nb, na, k, admittance, dtype):
    """Near blocks of +D - ik beta S (off-diagonal entries)."""
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    qp, qw = mesh.quad_points(3)
    centers = jnp.asarray(mesh.centers, dtype)
    normals = jnp.asarray(mesh.normals, dtype)
    qp = jnp.asarray(qp, dtype)
    qw = jnp.asarray(qw, dtype)
    cl = jnp.asarray(clusters)
    mk = jnp.asarray(mask, dtype)

    @jax.jit
    def blocks(centers, normals, qp, qw, cl, mk, nb_d, na_d):
        bi = cl[nb_d]
        ai = cl[na_d]
        x = centers[bi][:, :, None, None, :]
        nx = normals[bi][:, :, None, None, :]
        y = qp[ai][:, None, :, :, :]
        ny = normals[ai][:, None, :, None, :]
        dg, _ = _pair_kernels(x, nx, y, ny, k)
        rv = y - x
        r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
        rs = jnp.where(r < 1e-15, 1.0, r)
        g = jnp.exp(1j * (k * rs).astype(cdtype)) / (4.0 * jnp.pi * rs)
        w = qw[ai][:, None, :, :].astype(cdtype)
        blk = jnp.sum((dg - 1j * k * admittance * g) * w, axis=-1)
        same = bi[:, :, None] == ai[:, None, :]
        blk = jnp.where(same, 0.0, blk)
        return blk * mk[nb_d][:, :, None].astype(cdtype) * mk[na_d][:, None, :].astype(cdtype)

    return blocks(centers, normals, qp, qw, cl, mk,
                  jnp.asarray(nb.astype(np.int32)), jnp.asarray(na.astype(np.int32)))


# ---------------------------------------------------------------------------
# True multilevel FMM: octree hierarchy with upward (M2M) / downward (L2L)
# passes (mlfmm.rs:128 build_cluster_tree, :483 upward/downward passes).
#
# TPU-first design: every level keeps its own unit-sphere grid sized to
# that level's cluster radius; re-gridding between levels is a dense
# spherical-harmonic interpolation matrix (one GEMM on the MXU), and
# re-centering is a diagonal phase shift — both exact for band-limited
# signatures, so the hierarchy loses nothing over the flattened two-level
# build while doing O(N log N) work.
# ---------------------------------------------------------------------------


_SPH_HARM_CACHE: dict = {}


def _sph_harm_matrix(dirs: np.ndarray, lmax: int) -> np.ndarray:
    """Y[q, (l, m)] for l <= lmax on unit directions (host-side).

    Memoized on (grid bytes, lmax): the tree build requests the same
    level grids repeatedly (interp_up/interp_down share both endpoint
    grids, and consecutive equal-order depths share the grid itself)."""
    key = (dirs.tobytes(), int(lmax))
    hit = _SPH_HARM_CACHE.get(key)
    if hit is not None:
        return hit
    from scipy.special import sph_harm_y

    theta = np.arccos(np.clip(dirs[:, 2], -1.0, 1.0))
    phi = np.arctan2(dirs[:, 1], dirs[:, 0])
    cols = []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            cols.append(sph_harm_y(l, m, theta, phi))
    out = np.stack(cols, axis=1)
    if len(_SPH_HARM_CACHE) > 32:  # bound the per-process footprint
        _SPH_HARM_CACHE.clear()
    _SPH_HARM_CACHE[key] = out
    return out


def sphere_interp_matrix(dirs_from, w_from, dirs_to, l_band: int) -> np.ndarray:
    """(Q_to, Q_from) matrix interpolating band-limited (l <= l_band)
    functions between two unit-sphere quadrature grids: spherical-harmonic
    analysis on the source grid (exact — Gauss x uniform rule integrates
    the needed products) followed by synthesis on the target grid."""
    yf = _sph_harm_matrix(dirs_from, l_band)
    yt = _sph_harm_matrix(dirs_to, l_band)
    return yt @ (yf.conj() * w_from[:, None]).T


def translation_operator_pairwise(k, d_vecs, dirs, lmax: int, orders) -> np.ndarray:
    """M_L(s, D) with a per-pair truncation order (P, Q): terms with
    l > orders[p] are dropped so small cluster pairs never see the
    divergent high-l h_l(kD) tail of a level-wide order."""
    return _translation_padded(k, d_vecs, dirs, lmax, np.asarray(orders, np.int32))


class MlfmmLevel(NamedTuple):
    """One tree level (device arrays). M2M/L2L fields tie this level to
    the previous (coarser) one; they are empty at the top level. The
    four trailing optional fields are the scatter-free (gather_form)
    accumulation tables — see SlfmmData."""

    parent: jnp.ndarray  # (C,) index into the coarser level's nodes
    shift_up: jnp.ndarray  # (C, Q_coarse) e^{-ik s.(c_child - c_parent)}
    shift_down: jnp.ndarray  # (C, Q_coarse) conjugate shift for L2L
    interp_up: jnp.ndarray  # (Q_coarse, Q) fine -> coarse grid
    interp_down: jnp.ndarray  # (Q, Q_coarse) coarse -> fine grid
    trans_tgt: jnp.ndarray  # (P,) target node of each far pair here
    trans_src: jnp.ndarray  # (P,)
    trans_op: jnp.ndarray  # (P, Q) diagonal translation values
    trans_of_tgt: Optional[jnp.ndarray] = None  # (C, K) pair ids, pad = P
    children_idx: Optional[jnp.ndarray] = None  # (C_coarse, Kc) node ids here
    children_mask: Optional[jnp.ndarray] = None  # (C_coarse, Kc) 1/0
    # (C, P) 0/1 f32 pair->target selection matrix: the target-side pair
    # reduction as ONE MXU matmul per level instead of the (C, Kmax, Q)
    # take+sum (9.5 of the 13.6 ms N=20480 chip matvec was that take —
    # fmm_phase_profile). Chip-only lowering (sel_form); on CPU the
    # dense (C, P) GEMM would dominate, so the take form stays there.
    sel: Optional[jnp.ndarray] = None


class MlfmmTreeData(NamedTuple):
    clusters: jnp.ndarray  # (C_leaf, m) element ids
    cluster_mask: jnp.ndarray  # (C_leaf, m)
    t_tensor: jnp.ndarray  # (C_leaf, Q_leaf, m)
    s_tensor: jnp.ndarray  # (C_leaf, Q_leaf, m)
    quad_w: jnp.ndarray  # (Q_leaf,)
    near_a: jnp.ndarray
    near_b: jnp.ndarray
    near_blocks: jnp.ndarray
    diag_add: jnp.ndarray
    prefactor: jnp.ndarray
    levels: Tuple[MlfmmLevel, ...]  # coarsest ... leaf
    near_of_tgt: Optional[jnp.ndarray] = None  # (C_leaf, Kn) gather_form
    elem_pos: Optional[jnp.ndarray] = None  # (N,) gather_form


def _tree_gather_form(d: MlfmmTreeData) -> MlfmmTreeData:
    """Scatter-free tables for the hierarchical matvec: per-level
    translation pairs grouped by target, M2M parent reductions inverted
    into per-parent children tables, near pairs grouped by target leaf,
    and the leaf-output scatter inverted into the element-position
    gather."""
    levels = list(d.levels)
    new_levels = []
    for i, lv in enumerate(levels):
        # parent is stored per node, so its length IS this level's count
        c_here = int(lv.parent.shape[0])
        n_pairs = int(lv.trans_tgt.shape[0])
        tot = (
            jnp.asarray(_pad_by_target(np.asarray(lv.trans_tgt), c_here, n_pairs))
            if n_pairs
            else jnp.zeros((c_here, 1), jnp.int32)
        )
        kw = {"trans_of_tgt": tot}
        if i > 0:  # children table lives on the level whose parents it maps
            par = np.asarray(lv.parent)
            n_coarse = (
                levels[i - 1].parent.shape[0]
            )
            tbl = _pad_by_target(par, n_coarse, pad_value=0)
            counts = np.bincount(par, minlength=n_coarse)
            kc = tbl.shape[1]
            mask = (np.arange(kc)[None, :] < counts[:, None]).astype(np.float32)
            kw["children_idx"] = jnp.asarray(tbl)
            kw["children_mask"] = jnp.asarray(mask)
        new_levels.append(lv._replace(**kw))
    near_of_tgt = _pad_by_target(
        np.asarray(d.near_b), d.clusters.shape[0], pad_value=int(d.near_b.shape[0])
    )
    elem_pos = _elem_positions(np.asarray(d.clusters), np.asarray(d.cluster_mask))
    return d._replace(
        levels=tuple(new_levels),
        near_of_tgt=jnp.asarray(near_of_tgt),
        elem_pos=jnp.asarray(elem_pos),
    )


@jax.tree_util.register_pytree_node_class
class MlfmmTreeOperator(LinearOperator):
    """Matrix-free hierarchical matvec: aggregate at leaves, M2M upward,
    translate per level, L2L downward, disaggregate at leaves
    (mlfmm.rs:954 MlfmmSystem::matvec upward/downward passes)."""

    def __init__(self, data: MlfmmTreeData, n: int):
        self.data = data
        self.n = n

    def matvec(self, x):
        d = self.data
        nlev = len(d.levels)
        gather = d.elem_pos is not None  # scatter-free form (gather_form)
        xc = x[d.clusters] * d.cluster_mask.astype(x.dtype)
        mu = [None] * nlev
        mu[-1] = _bmv(d.t_tensor, xc)
        for i in range(nlev - 1, 0, -1):  # upward: M2M (interp then shift)
            lv = d.levels[i]
            up = (mu[i] @ lv.interp_up.T.astype(mu[i].dtype)) * lv.shift_up
            n_coarse = d.levels[i - 1].parent.shape[0]  # parent stored per node
            if gather:
                mu[i - 1] = jnp.sum(
                    jnp.take(up, lv.children_idx, axis=0)
                    * lv.children_mask[:, :, None].astype(up.dtype),
                    axis=1,
                )
            else:
                mu[i - 1] = jnp.zeros((n_coarse, up.shape[1]), up.dtype).at[lv.parent].add(up)
        loc = None
        for i in range(nlev):  # downward: translate + L2L
            lv = d.levels[i]
            if lv.trans_op.shape[0]:
                contrib = lv.trans_op.astype(mu[i].dtype) * mu[i][lv.trans_src]
                if lv.sel is not None:
                    # pair->target reduction as one MXU matmul on re/im
                    # planes (see MlfmmLevel.sel)
                    sel = lv.sel
                    lam = jax.lax.complex(
                        sel @ jnp.real(contrib), sel @ jnp.imag(contrib)
                    ).astype(contrib.dtype)
                elif gather:
                    cp = jnp.concatenate(
                        [contrib, jnp.zeros((1, contrib.shape[1]), contrib.dtype)]
                    )
                    lam = jnp.sum(jnp.take(cp, lv.trans_of_tgt, axis=0), axis=1)
                else:
                    lam = jnp.zeros_like(mu[i]).at[lv.trans_tgt].add(contrib)
            else:
                lam = jnp.zeros_like(mu[i])
            if loc is not None:
                lam = lam + (loc[lv.parent] * lv.shift_down) @ lv.interp_down.T.astype(
                    lam.dtype
                )
            loc = lam
        far = d.prefactor * jnp.sum(
            d.s_tensor * (d.quad_w.astype(x.dtype)[None, :, None] * loc[:, :, None]),
            axis=1,
        )
        # xa via the already-gathered (C, m) cluster values: x[clusters
        # [near_a]] is P*m SCALAR gathers from the (N,) vector — measured
        # 12.1 ms of the 25 ms N=20480 matvec (fmm_phase_profile n1);
        # xc[near_a] row-gathers the same masked values instead.
        xa = xc[d.near_a]
        near = _bmv(d.near_blocks, xa)
        if gather:
            nearp = jnp.concatenate(
                [near, jnp.zeros((1, near.shape[1]), near.dtype)]
            )
            near_t = jnp.sum(jnp.take(nearp, d.near_of_tgt, axis=0), axis=1)
            tot = (far + near_t) * d.cluster_mask.astype(x.dtype)
            return tot.reshape(-1)[d.elem_pos] + d.diag_add * x
        out = jnp.zeros(self.n, x.dtype)
        out = out.at[d.clusters.reshape(-1)].add(
            (far * d.cluster_mask.astype(x.dtype)).reshape(-1)
        )
        tgt = d.clusters[d.near_b]
        out = out.at[tgt.reshape(-1)].add(
            (near * d.cluster_mask[d.near_b].astype(x.dtype)).reshape(-1)
        )
        return out + d.diag_add * x

    def tree_flatten(self):
        return (self.data,), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


# Max tolerated magnitude of a translation-series term (2l+1)|h_l(kD)|:
# beyond this the finite sphere quadrature amplifies band-limit leakage
# into O(1) errors (see tests/test_fmm.py low-frequency cases).
_MLFMM_STABILITY_TAU = 1.0e8


def build_mlfmm_tree_system(
    mesh: SurfaceMesh,
    k: float,
    beta: complex = 0.0,
    max_per_leaf: int = 16,
    separation_ratio: float = 2.0,
    dtype=None,
    stability_tau: float = _MLFMM_STABILITY_TAU,
    agg_phase_f32: bool = False,
) -> MlfmmTreeOperator:
    """Hierarchical MLFMM for the exterior CBIE A = (1/2)I - D
    (+ beta T Burton-Miller when beta != 0: the direction-space row
    factor applies at leaf disaggregation, covering every level's
    translations; near blocks get the exact hypersingular kernel with
    the static row-sum self correction).

    Levels follow the octree depths; shallow leaves continue virtually
    (a leaf is its own child at every deeper depth, with zero-shift M2M)
    so every depth partitions all elements. Each far pair is translated
    exactly once: at the coarsest depth where the pair's ancestors are
    well separated (mlfmm.rs interaction lists)."""
    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements

    clusters, mask, cc_leaf, dirs_leaf, w_leaf, levels, nb, na = _tree_skeleton(
        mesh, k, max_per_leaf, separation_ratio, stability_tau, cdtype
    )
    t_tensor, s_tensor = _agg_disagg_tensors(
        mesh, clusters, mask, cc_leaf, k, dirs_leaf,
        phase_f32=agg_phase_f32,
    )
    if beta != 0.0:
        # (1 - beta ik s.n_x): the prefactor carries the CBIE minus, so
        # this yields -D + beta T (see build_slfmm_system)
        s_tensor = _apply_bm_row_factor(
            s_tensor, jnp.asarray(dirs_leaf), jnp.asarray(mesh.normals[clusters]),
            jnp.asarray(beta * 1j * k),
        )

    near_blocks = _near_blocks(mesh, clusters, mask, nb, na, k, beta, dtype)
    data = MlfmmTreeData(
        clusters=jnp.asarray(clusters),
        cluster_mask=jnp.asarray(mask, dtype),
        t_tensor=jnp.asarray(t_tensor),  # build dtype (c64 when phase_f32)
        s_tensor=jnp.asarray(s_tensor),
        quad_w=jnp.asarray(w_leaf, dtype),
        near_a=jnp.asarray(na.astype(np.int32)),
        near_b=jnp.asarray(nb.astype(np.int32)),
        near_blocks=near_blocks,
        # same exact static row-sum diagonal as build_slfmm_system
        diag_add=jnp.asarray(1.0 + _static_dlp_row_sums(mesh, dtype), cdtype),
        prefactor=jnp.asarray(-1j * k / (16.0 * np.pi**2), cdtype),
        levels=levels,
    )
    return MlfmmTreeOperator(data, n)


def _tree_skeleton(mesh, k, max_per_leaf, separation_ratio, stability_tau,
                   cdtype):
    """Shared octree/interaction-list/level construction of the
    hierarchical MLFMM (rigid and mixed builds): returns
    (clusters, mask, cc_leaf, dirs_leaf, w_leaf, levels, near_b, near_a)
    with ``levels`` the tuple of MlfmmLevel pytrees (translation ops,
    M2M/L2L shifts + grid interpolations) and near pairs at leaf depth."""
    centers = mesh.centers

    tree = Octree.build(centers, max_per_leaf=max_per_leaf)
    depth_max = max(lf.depth for lf in tree.leaves)

    # effective node lists per depth (virtual continuation of leaves)
    nodes_at: list = [[] for _ in range(depth_max + 1)]
    par: list = [[] for _ in range(depth_max + 1)]
    seen: list = [dict() for _ in range(depth_max + 1)]

    def walk(node, d, parent_index):
        key = id(node)
        if key not in seen[d]:
            seen[d][key] = len(nodes_at[d])
            nodes_at[d].append(node)
            par[d].append(parent_index)
        i = seen[d][key]
        if node.children:
            for c in node.children:
                walk(c, d + 1, i)
        elif d < depth_max:
            walk(node, d + 1, i)

    walk(tree.root, 0, -1)

    cc = []  # per depth: (C, 3) centers
    rr = []  # per depth: (C,) radii
    for d in range(depth_max + 1):
        # vectorized nd.indices_center / nd.radius: one reduceat pass per
        # depth instead of ~3k small numpy calls (1.6 s of the N=20480
        # build went to per-node np.linalg.norm alone)
        lens = np.array([len(nd.indices) for nd in nodes_at[d]], np.intp)
        idx_cat = np.concatenate([nd.indices for nd in nodes_at[d]])
        offs = np.zeros(len(lens), np.intp)
        np.cumsum(lens[:-1], out=offs[1:])
        pts = centers[idx_cat]
        c = np.add.reduceat(pts, offs, axis=0) / lens[:, None]
        owner = np.repeat(np.arange(len(lens)), lens)
        d2 = np.sum((pts - c[owner]) ** 2, axis=1)
        r = np.sqrt(np.maximum.reduceat(d2, offs)) + 1e-12
        cc.append(c)
        rr.append(r)

    # interaction lists: handled at the coarsest depth whose ancestors are
    # far AND whose diagonal-form translation is numerically stable —
    # the high-frequency form breaks when the needed order L exceeds the
    # h_l(kD) blowup point (low-frequency breakdown), so unstable pairs
    # stay uncovered and fall through to deeper levels or, at the leaves,
    # to exact near blocks (graceful wideband degradation).
    handled = [np.zeros((len(nodes_at[d]),) * 2, bool) for d in range(depth_max + 1)]
    pair_orders = [np.zeros(0, np.int32) for _ in range(depth_max + 1)]
    covered_prev = np.zeros((len(nodes_at[0]),) * 2, bool)
    for d in range(1, depth_max + 1):
        dist = np.linalg.norm(cc[d][:, None] - cc[d][None, :], axis=-1)
        far = dist > separation_ratio * (rr[d][:, None] + rr[d][None, :])
        pidx = np.asarray(par[d])
        cov_parent = covered_prev[np.ix_(pidx, pidx)]
        cand = far & ~cov_parent
        if cand.any():
            krm = float(k * 2 * rr[d].max())
            lmax_d = int(np.ceil(krm + 4 * np.log(krm + np.pi) + 4))
            cand, pair_orders[d] = _stable_far_orders(
                k, cc[d], rr[d], cand, lmax_d, stability_tau
            )
        handled[d] = cand
        covered_prev = handled[d] | cov_parent
    near = ~covered_prev  # at leaf depth

    d_top_candidates = [d for d in range(1, depth_max + 1) if handled[d].any()]
    d_top = d_top_candidates[0] if d_top_candidates else depth_max

    # per-depth expansion orders (coarser levels never below finer ones)
    orders = {}
    for d in range(d_top, depth_max + 1):
        kr = k * rr[d].max()
        orders[d] = int(np.ceil(kr + 4 * np.log(kr + np.pi) + 4))
    for d in range(depth_max - 1, d_top - 1, -1):
        orders[d] = max(orders[d], orders[d + 1])
    grids = {d: unit_sphere_quadrature(orders[d]) for d in range(d_top, depth_max + 1)}

    # leaf-level packing + aggregation/disaggregation
    leaves = nodes_at[depth_max]
    c_leaf = len(leaves)
    m = max(len(nd.indices) for nd in leaves)
    clusters = np.zeros((c_leaf, m), np.int32)
    mask = np.zeros((c_leaf, m))
    for i, nd in enumerate(leaves):
        clusters[i, : len(nd.indices)] = nd.indices
        mask[i, : len(nd.indices)] = 1.0
    dirs_leaf, w_leaf = grids[depth_max]

    levels = []
    for d in range(d_top, depth_max + 1):
        dirs_d, w_d = grids[d]
        tb, ta = np.where(handled[d])
        if len(tb):
            d_vecs = cc[d][tb] - cc[d][ta]
            # stability-capped per-pair orders from the interaction-list
            # screen (aligned: np.where on the screened mask preserves
            # the row-major pair order the screen emitted)
            l_pair = np.minimum(pair_orders[d], orders[d])
            # as_jax: the (P, Q) per-level translation table never
            # round-trips through a cold-page numpy copy (MlfmmLevel
            # stores it as a device array anyway)
            t_op = _translation_padded(
                k, d_vecs, dirs_d, orders[d], np.asarray(l_pair, np.int32),
                as_jax=True,
            )
        else:
            t_op = np.zeros((0, len(dirs_d)), complex)
        if d == d_top:
            qc = 0
            parent = np.zeros(len(nodes_at[d]), np.int32)
            shift_up = np.zeros((len(nodes_at[d]), 0), complex)
            shift_down = np.zeros((len(nodes_at[d]), 0), complex)
            interp_up = np.zeros((0, len(dirs_d)))
            interp_down = np.zeros((len(dirs_d), 0))
        else:
            dirs_c, w_c = grids[d - 1]
            parent = np.asarray(par[d], np.int32)
            delta = cc[d] - cc[d - 1][parent]  # child - parent
            phase = np.einsum("qd,cd->cq", dirs_c, delta)
            shift_up = np.exp(-1j * k * phase)
            shift_down = np.exp(1j * k * phase)
            interp_up = sphere_interp_matrix(dirs_d, w_d, dirs_c, orders[d])
            interp_down = sphere_interp_matrix(dirs_c, w_c, dirs_d, orders[d])
        levels.append(
            MlfmmLevel(
                parent=jnp.asarray(parent),
                shift_up=jnp.asarray(shift_up, cdtype),
                shift_down=jnp.asarray(shift_down, cdtype),
                interp_up=jnp.asarray(interp_up, cdtype),
                interp_down=jnp.asarray(interp_down, cdtype),
                trans_tgt=jnp.asarray(tb.astype(np.int32)),
                trans_src=jnp.asarray(ta.astype(np.int32)),
                trans_op=jnp.asarray(t_op, cdtype),
            )
        )

    nb, na = np.where(near)
    return (clusters, mask, cc[depth_max], dirs_leaf, w_leaf, tuple(levels),
            nb, na)


def build_mlfmm_tree_mixed_system(
    mesh: SurfaceMesh,
    k: float,
    bc,
    beta: complex = 0.0,
    incident=None,
    density: float = 1.204,
    speed_of_sound: float = 343.0,
    max_per_leaf: int = 16,
    separation_ratio: float = 2.0,
    quad_order: int = 3,
    dtype=None,
    stability_tau: float = _MLFMM_STABILITY_TAU,
):
    """Mixed velocity/pressure BCs through the hierarchical MLFMM tree —
    the SLFMM mixed column combination (build_slfmm_mixed_system)
    extended to every tree level (VERDICT r2 item 7; mlfmm.rs:954-979
    upward/downward passes with tbem.rs:234-340's BC-dependent columns,
    which the reference itself never combined: its MLFMM is rigid-only).

    The per-column layer selection happens entirely in the LEAF
    aggregation factor f_j = m_j (-ik s.n_j + ik adm_j) - (1 - m_j);
    M2M translations and per-level diagonal operators act on direction
    signatures and are layer-agnostic, so the whole tree is shared by
    the main and complementary (RHS) operators — only the leaf T tensor,
    near blocks, and diagonal differ.

    Returns (operator, rhs, unknown_p) with dense-mixed-path solution
    semantics (u holds p on velocity elements, dp/dn on pressure ones)."""
    from mathaudio_tpu.bem.assembly import single_layer_self_terms

    dtype = dtype or default_float()
    cdtype = complex_dtype_for(jnp.dtype(dtype))
    n = mesh.num_elements
    normals = mesh.normals

    bc_types = np.asarray(bc.types, np.int32)
    bc_values = np.asarray(bc.values, complex)
    assert bc_types.shape == (n,) and bc_values.shape == (n,)
    m = (bc_types == 0).astype(float)
    omega = k * speed_of_sound
    q_known = np.where(bc_types == 0, 1j * omega * density * bc_values, 0.0)
    p_known = np.where(bc_types == 1, bc_values, 0.0)
    adm = getattr(bc, "admittance", None)
    adm_arr = (
        np.zeros(n, complex) if adm is None
        else np.broadcast_to(np.asarray(adm, complex), (n,)).astype(complex)
    )

    clusters, mask, cc_leaf, dirs_leaf, w_leaf, levels, nb, na = _tree_skeleton(
        mesh, k, max_per_leaf, separation_ratio, stability_tau, cdtype
    )

    # leaf aggregation factors (see build_slfmm_mixed_system)
    alpha_main = m.astype(complex)
    sigma_main = 1j * k * adm_arr * m - (1.0 - m)
    alpha_comp = (1.0 - m).astype(complex)
    sigma_comp = -m.astype(complex)
    t_main, s_tensor = _agg_disagg_tensors(
        mesh, clusters, mask, cc_leaf, k, dirs_leaf,
        agg_alpha=alpha_main, agg_sigma=sigma_main,
    )
    t_comp, _ = _agg_disagg_tensors(
        mesh, clusters, mask, cc_leaf, k, dirs_leaf,
        agg_alpha=alpha_comp, agg_sigma=sigma_comp,
    )
    if beta != 0.0:
        s_tensor = _apply_bm_row_factor(
            s_tensor, jnp.asarray(dirs_leaf), jnp.asarray(normals[clusters]),
            jnp.asarray(beta * 1j * k),
        )

    blk_main, blk_comp = _near_blocks_mixed(
        mesh, clusters, mask, nb, na, k, beta, m, adm_arr, dtype,
        quad_order=quad_order,
    )

    # diagonals: identical formulas to build_slfmm_mixed_system
    rowsum0 = _static_dlp_row_sums(mesh, dtype)
    ap_diag = (1.0 + rowsum0).astype(complex)
    if beta != 0.0:
        self_r, self_w = _self_angular_rule(mesh)
        ikc = 1j * k
        t_diff_self = np.sum(
            self_w * (ikc - (np.exp(ikc * self_r) - 1.0) / self_r), axis=1
        ) / (4.0 * np.pi)
        s0 = _static_hyper_row_sums(mesh, quad_order)
        ap_diag = ap_diag + beta * (t_diff_self - s0)
    s_self = np.asarray(single_layer_self_terms(mesh, k, dtype=dtype))
    aq_diag = s_self - (beta / 2.0 if beta != 0.0 else 0.0)
    diag_main = m * (ap_diag + (-1j * k * adm_arr) * aq_diag) + (1.0 - m) * aq_diag
    diag_comp = m * aq_diag + (1.0 - m) * ap_diag

    def _data(t_tensor, near_b, diag):
        return MlfmmTreeData(
            clusters=jnp.asarray(clusters),
            cluster_mask=jnp.asarray(mask, dtype),
            t_tensor=jnp.asarray(t_tensor, cdtype),
            s_tensor=jnp.asarray(s_tensor, cdtype),
            quad_w=jnp.asarray(w_leaf, dtype),
            near_a=jnp.asarray(na.astype(np.int32)),
            near_b=jnp.asarray(nb.astype(np.int32)),
            near_blocks=near_b,
            diag_add=jnp.asarray(diag, cdtype),
            prefactor=jnp.asarray(-1j * k / (16.0 * np.pi**2), cdtype),
            levels=levels,
        )

    op = MlfmmTreeOperator(_data(t_main, blk_main, diag_main), n)
    comp_op = MlfmmTreeOperator(_data(t_comp, blk_comp, diag_comp), n)

    centers_j = jnp.asarray(mesh.centers, dtype)
    if incident is not None:
        rhs_inc = incident.pressure(centers_j, k).astype(cdtype)
        if beta != 0.0:
            rhs_inc = rhs_inc - jnp.asarray(beta, cdtype) * incident.normal_derivative(
                centers_j, jnp.asarray(normals, dtype), k
            ).astype(cdtype)
    else:
        rhs_inc = jnp.zeros(n, cdtype)
    known = jnp.asarray(q_known * m + p_known * (1.0 - m), cdtype)
    rhs = rhs_inc - comp_op.matvec(known)
    return op, rhs, bc_types == 0


def near_field_csr(data: SlfmmData):
    """Sparse near-field matrix of an SLFMM system (host CSR): the exact
    near blocks plus the diagonal jump/self terms — the
    `nearfield_matrix` the reference hands to its ILU-preconditioned
    GMRES (room_acoustics/solver.rs:1015
    gmres_solve_with_ilu_operator)."""
    from mathaudio_tpu.solvers.sparse import CsrMatrix

    cl = np.asarray(data.clusters)
    mk = np.asarray(data.cluster_mask)
    nb = np.asarray(data.near_b)
    na = np.asarray(data.near_a)
    blocks = np.asarray(data.near_blocks)
    n = data.diag_add.shape[0]
    m = cl.shape[1]
    rows = np.repeat(cl[nb][:, :, None], m, axis=2).reshape(-1)
    cols = np.repeat(cl[na][:, None, :], m, axis=1).reshape(-1)
    valid = (
        np.repeat(mk[nb][:, :, None], m, axis=2)
        * np.repeat(mk[na][:, None, :], m, axis=1)
    ).reshape(-1) > 0
    vals = blocks.reshape(-1)
    tri_rows = np.concatenate([rows[valid], np.arange(n)])
    tri_cols = np.concatenate([cols[valid], np.arange(n)])
    tri_vals = np.concatenate([vals[valid], np.asarray(data.diag_add)])
    return CsrMatrix.from_triplets(tri_rows, tri_cols, tri_vals, (n, n))


def near_ilu_preconditioner(op, sweeps: int = 6):
    """ILU(0) of the near-field matrix as a preconditioner for the FMM
    GMRES (solver.rs:975 solve_bem_fmm_gmres_ilu)."""
    from mathaudio_tpu.solvers.preconditioners.ilu import IluFixedPoint

    # SlfmmData and MlfmmTreeData carry near-field arrays at top level;
    # only the flattened two-level MlfmmData nests them under .leaf.
    data = op.data.leaf if isinstance(op.data, MlfmmData) else op.data
    return IluFixedPoint.from_csr(near_field_csr(data), sweeps=sweeps)


@jax.tree_util.register_pytree_node_class
class ClusterBlockPreconditioner(LinearOperator):
    """Hierarchical block-diagonal preconditioner (solver.rs:1046
    solve_bem_fmm_gmres_hierarchical): the diagonal (self) near-field
    block of every leaf cluster, LU-factorized in one batch. O(N)
    setup, and the apply is a single batched triangular solve on the
    MXU (complex handled via the real 2m x 2m embedding)."""

    def __init__(self, inv, clusters, mask, elem_pos, n):
        self.inv = inv  # (C, 2m, 2m) explicit embedded inverses
        self.clusters = clusters
        self.mask = mask
        self.elem_pos = elem_pos  # (N,) flat gather positions (no scatter)
        self.n = n

    @classmethod
    def from_operator(cls, op) -> "ClusterBlockPreconditioner":
        data = op.data.leaf if isinstance(op.data, MlfmmData) else op.data
        cl = np.asarray(data.clusters)
        mk = np.asarray(data.cluster_mask)
        nb = np.asarray(data.near_b)
        na = np.asarray(data.near_a)
        blocks = np.asarray(data.near_blocks)
        diag_add = np.asarray(data.diag_add)
        c, m = cl.shape
        self_blocks = np.zeros((c, m, m), blocks.dtype)
        for p in np.where(nb == na)[0]:
            self_blocks[nb[p]] = blocks[p]
        ar = np.arange(m)
        self_blocks[:, ar, ar] += diag_add[cl] * mk
        # padded slots: identity row/col so the block stays invertible
        pad = mk == 0.0
        for ci in range(c):
            idx = np.where(pad[ci])[0]
            self_blocks[ci, idx, :] = 0.0
            self_blocks[ci, :, idx] = 0.0
            self_blocks[ci, idx, idx] = 1.0
        # real 2m x 2m embedding: [[Re, -Im], [Im, Re]]; explicit
        # inverses so the apply is one batched GEMM on the MXU
        re, im = self_blocks.real, self_blocks.imag
        emb = np.block([[re, -im], [im, re]])  # (c, 2m, 2m)
        inv = jnp.asarray(np.linalg.inv(emb))
        n = int(data.diag_add.shape[0])
        elem_pos = jnp.asarray(_elem_positions(cl, mk))
        return cls(inv, jnp.asarray(cl), jnp.asarray(mk), elem_pos, n)

    def matvec(self, r):
        rc = r[self.clusters] * self.mask.astype(r.dtype)
        b2 = jnp.concatenate([jnp.real(rc), jnp.imag(rc)], axis=1)  # (C, 2m)
        x2 = _bmv(self.inv.astype(b2.dtype), b2)
        m = self.clusters.shape[1]
        xc = jax.lax.complex(x2[:, :m], x2[:, m:]).astype(r.dtype)
        # leaves partition elements, so the scatter-set is a permutation:
        # apply it as the inverse GATHER (TPU scatters serialize per row)
        return (xc * self.mask.astype(r.dtype)).reshape(-1)[self.elem_pos]

    def tree_flatten(self):
        return (self.inv, self.clusters, self.mask, self.elem_pos), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)
