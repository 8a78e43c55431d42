"""Differential evolution (math-differential-evolution/src/mod.rs).

Semantics follow the reference: SciPy-style deferred updating, 14
strategies (mod.rs:139-168), binomial/exponential crossover, mutation
Factor/Range-dither/Adaptive (mod.rs:216), LHS/random init (mod.rs:260),
penalty constraints base + w*viol^2 (mod.rs:1052-1077), fixed-variable
elimination and npop = popsize * n_free (mod.rs:914-1000), convergence
std(E) <= atol + tol*|mean(E)| , JADE-style adaptation (mod.rs:479),
optional local polish (scipy Nelder-Mead replacing the reference's
NLopt, mod.rs:521).

The per-generation step is one jitted pure function with a vmapped
objective; ``jit_loop=True`` runs every generation inside a single
``lax.while_loop`` on device.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class Strategy(enum.Enum):
    BEST1BIN = "best1bin"
    BEST1EXP = "best1exp"
    RAND1BIN = "rand1bin"
    RAND1EXP = "rand1exp"
    RAND2BIN = "rand2bin"
    RAND2EXP = "rand2exp"
    CURRENTTOBEST1BIN = "currenttobest1bin"
    CURRENTTOBEST1EXP = "currenttobest1exp"
    BEST2BIN = "best2bin"
    BEST2EXP = "best2exp"
    RANDTOBEST1BIN = "randtobest1bin"
    RANDTOBEST1EXP = "randtobest1exp"
    ADAPTIVEBIN = "adaptivebin"
    ADAPTIVEEXP = "adaptiveexp"

    @classmethod
    def from_str(cls, s: str) -> "Strategy":
        t = s.lower().replace("_", "").replace("-", "")
        aliases = {"best1": "best1bin", "rand1": "rand1bin", "adaptive": "adaptivebin"}
        t = aliases.get(t, t)
        for m in cls:
            if m.value == t:
                return m
        raise ValueError(f"unknown strategy {s}")

    @property
    def is_exponential(self) -> bool:
        return self.value.endswith("exp")

    @property
    def is_adaptive(self) -> bool:
        return self.value.startswith("adaptive")


@dataclasses.dataclass
class Mutation:
    """Factor / dither Range / Adaptive (mod.rs:216)."""

    kind: str = "range"  # "factor" | "range" | "adaptive"
    factor: float = 0.8
    min: float = 0.0
    max: float = 2.0
    initial_f: float = 0.5

    @classmethod
    def factor_of(cls, f: float) -> "Mutation":
        return cls(kind="factor", factor=f)

    @classmethod
    def range_of(cls, lo: float, hi: float) -> "Mutation":
        return cls(kind="range", min=lo, max=hi)

    @classmethod
    def adaptive_of(cls, initial_f: float = 0.5) -> "Mutation":
        return cls(kind="adaptive", initial_f=initial_f)


class Init(enum.Enum):
    LATIN_HYPERCUBE = "latinhypercube"
    RANDOM = "random"


class Crossover(enum.Enum):
    BINOMIAL = "binomial"
    EXPONENTIAL = "exponential"


@dataclasses.dataclass
class LinearPenalty:
    """lb <= A x <= ub with quadratic penalty (mod.rs:278)."""

    a: np.ndarray
    lb: np.ndarray
    ub: np.ndarray
    weight: float = 1e6


@dataclasses.dataclass
class LinearConstraintHelper:
    a: np.ndarray
    lb: np.ndarray
    ub: np.ndarray

    def apply_to(self, cfg: "DEConfig", weight: float = 1e6):
        lp = LinearPenalty(np.asarray(self.a), np.asarray(self.lb), np.asarray(self.ub), weight)
        if cfg.linear_penalty is None:
            cfg.linear_penalty = lp
        else:
            ex = cfg.linear_penalty
            cfg.linear_penalty = LinearPenalty(
                np.vstack([ex.a, lp.a]),
                np.concatenate([ex.lb, lp.lb]),
                np.concatenate([ex.ub, lp.ub]),
                ex.weight,
            )


@dataclasses.dataclass
class NonlinearConstraintHelper:
    """lb <= fun(x) <= ub, applied as penalty closures (mod.rs:320)."""

    fun: Callable
    lb: np.ndarray
    ub: np.ndarray

    def apply_to(self, cfg: "DEConfig", weight_ineq: float = 1e6, weight_eq: float = 1e6):
        lb, ub = np.asarray(self.lb), np.asarray(self.ub)
        f = self.fun
        for i in range(min(len(lb), len(ub))):
            l, u = lb[i], ub[i]
            if l == u:
                cfg.penalty_eq.append((lambda x, i=i, l=l: f(x)[i] - l, weight_eq))
            else:
                if np.isfinite(u):
                    cfg.penalty_ineq.append((lambda x, i=i, u=u: f(x)[i] - u, weight_ineq))
                if np.isfinite(l):
                    cfg.penalty_ineq.append((lambda x, i=i, l=l: l - f(x)[i], weight_ineq))


@dataclasses.dataclass
class AdaptiveConfig:
    """JADE/SAM-style adaptation (mod.rs:479)."""

    adaptive_mutation: bool = False
    wls_enabled: bool = False
    w_max: float = 0.9
    w_min: float = 0.1
    w_f: float = 0.9
    w_cr: float = 0.9
    f_m: float = 0.5
    cr_m: float = 0.6
    wls_prob: float = 0.1
    wls_scale: float = 0.1


@dataclasses.dataclass
class PolishConfig:
    enabled: bool = True
    algo: str = "neldermead"
    maxeval: int = 0  # 0 -> 200 * n


@dataclasses.dataclass
class DEConfig:
    maxiter: int = 1000
    popsize: int = 15
    tol: float = 1e-2
    atol: float = 0.0
    mutation: Mutation = dataclasses.field(default_factory=Mutation)
    recombination: float = 0.7
    strategy: Strategy = Strategy.BEST1BIN
    init: Init = Init.LATIN_HYPERCUBE
    seed: Optional[int] = None
    integrality: Optional[Sequence[bool]] = None
    x0: Optional[Sequence[float]] = None
    disp: bool = False
    callback: Optional[Callable] = None
    penalty_ineq: List[Tuple[Callable, float]] = dataclasses.field(default_factory=list)
    penalty_eq: List[Tuple[Callable, float]] = dataclasses.field(default_factory=list)
    linear_penalty: Optional[LinearPenalty] = None
    polish: Optional[PolishConfig] = None
    adaptive: AdaptiveConfig = dataclasses.field(default_factory=AdaptiveConfig)


class DEConfigBuilder:
    """Fluent builder (mod.rs:624 DEConfigBuilder)."""

    def __init__(self):
        self.cfg = DEConfig()

    def __getattr__(self, name):
        # Reject unknown config fields at attribute access, not at call
        # time, so a typo like .maxitr(5) fails on the lookup itself.
        if not hasattr(self.cfg, name):
            raise AttributeError(name)

        def setter(value):
            setattr(self.cfg, name, value)
            return self

        return setter

    def build(self) -> DEConfig:
        return self.cfg


@dataclasses.dataclass
class DEReport:
    x: np.ndarray
    fun: float
    success: bool
    message: str
    nit: int
    nfev: int
    population: np.ndarray
    population_energies: np.ndarray


@dataclasses.dataclass
class DEIntermediate:
    x: np.ndarray
    fun: float
    convergence: float
    iter: int


class CallbackAction(enum.Enum):
    CONTINUE = 0
    STOP = 1


def _latin_hypercube(key, npop, n, lb, ub):
    keys = jax.random.split(key, n + 1)
    cols = []
    for j in range(n):
        kperm, kjit = jax.random.split(keys[j])
        perm = jax.random.permutation(kperm, npop)
        u = jax.random.uniform(kjit, (npop,))
        cols.append((perm + u) / npop)
    unit = jnp.stack(cols, axis=1)
    return lb + unit * (ub - lb)


def _distinct_indices(key, npop, k):
    keys = jax.random.split(key, npop)

    def one(kk, i):
        r = jax.random.choice(kk, npop - 1, shape=(k,), replace=False)
        return jnp.where(r >= i, r + 1, r)

    return jax.vmap(one)(keys, jnp.arange(npop))


def _crossover_mask_bin(key, npop, n, cr):
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (npop, n))
    j_rand = jax.random.randint(k2, (npop,), 0, n)
    mask = u < cr
    return mask.at[jnp.arange(npop), j_rand].set(True)


def _crossover_mask_exp(key, npop, n, cr):
    k1, k2 = jax.random.split(key)
    starts = jax.random.randint(k1, (npop,), 0, n)
    u = jax.random.uniform(k2, (npop, n))
    cr_arr = jnp.broadcast_to(jnp.asarray(cr), (npop,))
    cont = jnp.concatenate(
        [jnp.ones((npop, 1), bool), u[:, 1:] < cr_arr[:, None]], axis=1
    )
    keep = jnp.cumprod(cont.astype(jnp.int32), axis=1) > 0  # offsets kept
    dims = (starts[:, None] + jnp.arange(n)[None, :]) % n
    mask = jnp.zeros((npop, n), bool)
    return mask.at[jnp.arange(npop)[:, None], dims].set(keep)


def _mutant(strategy, pop, best, idx, f):
    r = lambda j: pop[idx[:, j]]
    s = strategy.value
    if s.startswith("best1"):
        return best[None] + f * (r(0) - r(1))
    if s.startswith("rand1"):
        return r(0) + f * (r(1) - r(2))
    if s.startswith("rand2"):
        return r(0) + f * (r(1) + r(2) - r(3) - r(4))
    if s.startswith("best2"):
        return best[None] + f * (r(0) + r(1) - r(2) - r(3))
    if s.startswith("currenttobest1") or s.startswith("adaptive"):
        return pop + f * (best[None] - pop) + f * (r(0) - r(1))
    if s.startswith("randtobest1"):
        return r(0) + f * (best[None] - r(0)) + f * (r(1) - r(2))
    raise ValueError(s)


def _make_energy(func, cfg: DEConfig):
    lp = cfg.linear_penalty
    lp_arrs = None
    if lp is not None:
        lp_arrs = (jnp.asarray(lp.a), jnp.asarray(lp.lb), jnp.asarray(lp.ub), lp.weight)
    ineq = list(cfg.penalty_ineq)
    eq = list(cfg.penalty_eq)

    def energy(x):
        e = func(x)
        for g, w in ineq:
            v = jnp.maximum(g(x), 0.0)
            e = e + w * v * v
        for h, w in eq:
            v = h(x)
            e = e + w * v * v
        if lp_arrs is not None:
            a, lb, ub, w = lp_arrs
            ax = a @ x
            lo = jnp.maximum(lb - ax, 0.0)
            hi = jnp.maximum(ax - ub, 0.0)
            e = e + w * jnp.sum(lo * lo + hi * hi)
        return e

    return energy


def differential_evolution(
    func: Callable,
    bounds: Sequence[Tuple[float, float]],
    config: Optional[DEConfig] = None,
    jit_loop: bool = False,
    **kwargs,
) -> DEReport:
    """SciPy-style DE on a jnp-traceable objective.

    ``jit_loop=True`` runs the full generation loop in one
    ``lax.while_loop`` (no callback/disp); otherwise a host loop drives a
    jitted generation step (callback/recording supported).
    """
    cfg = config or DEConfig()
    for k, v in kwargs.items():
        if not hasattr(cfg, k):
            raise TypeError(f"unknown config field {k}")
        setattr(cfg, k, v)
    if jit_loop and (cfg.callback is not None or cfg.disp):
        import warnings

        warnings.warn(
            "jit_loop=True runs inside lax.while_loop: callback/disp are "
            "ignored; use jit_loop=False for per-generation hooks",
            stacklevel=2,
        )
    if isinstance(cfg.strategy, str):
        cfg.strategy = Strategy.from_str(cfg.strategy)

    bounds = np.asarray(bounds, float)
    lb_full, ub_full = bounds[:, 0], bounds[:, 1]
    n_full = len(bounds)

    # Fixed-variable elimination (mod.rs:934-960)
    free = lb_full < ub_full
    n_free = int(free.sum())
    fixed_vals = lb_full.copy()
    free_idx = np.where(free)[0]

    def expand(xf):
        out = jnp.asarray(fixed_vals)
        return out.at[jnp.asarray(free_idx)].set(xf) if n_free else out

    raw_energy = _make_energy(func, cfg)
    energy = lambda xf: raw_energy(expand(xf))

    if n_free == 0:
        x = jnp.asarray(fixed_vals)
        f = float(raw_energy(x))
        return DEReport(np.asarray(x), f, True, "all variables fixed", 0, 1,
                        np.asarray(x)[None], np.asarray([f]))

    lb = jnp.asarray(lb_full[free])
    ub = jnp.asarray(ub_full[free])
    npop = max(cfg.popsize * n_free, 5)
    n = n_free

    integrality = None
    if cfg.integrality is not None:
        integrality = jnp.asarray(np.asarray(cfg.integrality)[free])

    key = jax.random.key(cfg.seed if cfg.seed is not None else 0)
    key, k_init = jax.random.split(key)
    if cfg.init == Init.LATIN_HYPERCUBE:
        pop = _latin_hypercube(k_init, npop, n, lb, ub)
    else:
        pop = lb + jax.random.uniform(k_init, (npop, n)) * (ub - lb)
    if cfg.x0 is not None:
        pop = pop.at[0].set(jnp.asarray(np.asarray(cfg.x0)[free]))
    if integrality is not None:
        pop = jnp.where(integrality[None, :], jnp.round(pop), pop)
        pop = jnp.clip(pop, lb, ub)

    venergy = jax.vmap(energy)
    energies = venergy(pop)
    nfev = npop

    strategy = cfg.strategy
    use_exp = strategy.is_exponential
    n_diff = {"best1": 2, "rand1": 3, "rand2": 5, "best2": 4,
              "currenttobest1": 2, "randtobest1": 3, "adaptive": 2}
    base = next(p for p in n_diff if strategy.value.startswith(p))
    k_idx = n_diff[base]

    mut = cfg.mutation
    adaptive_on = strategy.is_adaptive or mut.kind == "adaptive" or cfg.adaptive.adaptive_mutation
    ac = cfg.adaptive

    def gen_step(key, pop, energies, f_m, cr_m):
        key, k_f, k_cr, k_idxk, k_cross, k_extra = jax.random.split(key, 6)
        best_i = jnp.argmin(energies)
        best = pop[best_i]

        if adaptive_on:
            # per-individual F ~ Cauchy(f_m, 0.1), CR ~ N(cr_m, 0.1)
            u = jax.random.uniform(k_f, (npop, 1), minval=1e-6, maxval=1 - 1e-6)
            f = f_m + 0.1 * jnp.tan(jnp.pi * (u - 0.5))
            f = jnp.clip(f, 0.05, 1.5)
            cr_i = jnp.clip(cr_m + 0.1 * jax.random.normal(k_cr, (npop,)), 0.0, 1.0)
        elif mut.kind == "factor":
            f = jnp.asarray(mut.factor)
            cr_i = jnp.full((npop,), cfg.recombination)
        else:  # dither once per generation (scipy semantics)
            f = jax.random.uniform(k_f, (), minval=mut.min, maxval=mut.max)
            cr_i = jnp.full((npop,), cfg.recombination)

        idx = _distinct_indices(k_idxk, npop, k_idx)
        mutant = _mutant(strategy, pop, best, idx, f)
        mutant = jnp.clip(mutant, lb, ub)

        if use_exp:
            mask = _crossover_mask_exp(k_cross, npop, n, cr_i)
        else:
            mask = _crossover_mask_bin(k_cross, npop, n, cr_i[:, None])
        trial = jnp.where(mask, mutant, pop)
        if integrality is not None:
            trial = jnp.where(integrality[None, :], jnp.round(trial), trial)
            trial = jnp.clip(trial, lb, ub)

        trial_e = venergy(trial)
        improved = trial_e < energies
        pop_new = jnp.where(improved[:, None], trial, pop)
        e_new = jnp.where(improved, trial_e, energies)

        if ac.wls_enabled:
            # Wrapper Local Search (mod.rs:479 / apply_wls): Cauchy-perturb
            # the current best; replace the worst member on improvement.
            k_extra, k_u = jax.random.split(k_extra)
            best_new = pop_new[jnp.argmin(e_new)]
            u_w = jax.random.uniform(k_u, (n,), minval=1e-6, maxval=1 - 1e-6)
            step_w = ac.wls_scale * (ub - lb) * jnp.tan(jnp.pi * (u_w - 0.5))
            cand = jnp.clip(best_new + step_w, lb, ub)
            if integrality is not None:
                cand = jnp.clip(jnp.where(integrality, jnp.round(cand), cand), lb, ub)
            cand_e = energy(cand)
            do_wls = jax.random.uniform(k_extra, ()) < ac.wls_prob
            worst = jnp.argmax(e_new)
            accept = do_wls & (cand_e < e_new[worst])
            pop_new = jnp.where(accept, pop_new.at[worst].set(cand), pop_new)
            e_new = jnp.where(accept, e_new.at[worst].set(cand_e), e_new)

        if adaptive_on:
            # JADE-style location update from successful parameters
            sf = jnp.where(improved[:, None], f * jnp.ones((npop, 1)), 0.0).squeeze(-1)
            s_cnt = jnp.maximum(jnp.sum(improved), 1)
            lehmer = jnp.sum(sf * sf) / jnp.maximum(jnp.sum(sf), 1e-12)
            f_m_new = jnp.where(
                jnp.sum(improved) > 0, ac.w_f * f_m + (1 - ac.w_f) * lehmer, f_m
            )
            scr = jnp.sum(jnp.where(improved, cr_i, 0.0)) / s_cnt
            cr_m_new = jnp.where(
                jnp.sum(improved) > 0, ac.w_cr * cr_m + (1 - ac.w_cr) * scr, cr_m
            )
        else:
            f_m_new, cr_m_new = f_m, cr_m
        return key, pop_new, e_new, f_m_new, cr_m_new, trial, trial_e

    gen_step_jit = jax.jit(gen_step)

    f_m = jnp.asarray(ac.f_m if adaptive_on else (mut.initial_f if mut.kind == "adaptive" else 0.5))
    cr_m = jnp.asarray(ac.cr_m)

    message = "maximum iterations reached"
    success = False
    nit = 0

    if jit_loop:
        def cond(state):
            key, pop, e, f_m, cr_m, it = state
            std = jnp.std(e)
            conv = std <= cfg.atol + cfg.tol * jnp.abs(jnp.mean(e))
            return (~conv) & (it < cfg.maxiter)

        def body(state):
            key, pop, e, f_m, cr_m, it = state
            key, pop, e, f_m, cr_m, _, _ = gen_step(key, pop, e, f_m, cr_m)
            return (key, pop, e, f_m, cr_m, it + 1)

        key, pop, energies, f_m, cr_m, it = jax.lax.while_loop(
            cond, body, (key, pop, energies, f_m, cr_m, jnp.int32(0))
        )
        nit = int(it)
        nfev += nit * npop
        # Re-test the convergence predicate on the final population: a run
        # that converges exactly on its last allowed generation exits the
        # while_loop with it == maxiter and would read as failure if we
        # inferred success from the iteration count alone.
        e_np = np.asarray(energies)
        success = bool(e_np.std() <= cfg.atol + cfg.tol * abs(e_np.mean()))
        if success:
            message = "converged (population std within tolerance)"
    else:
        for it in range(1, cfg.maxiter + 1):
            key, pop, energies, f_m, cr_m, _, _ = gen_step_jit(key, pop, energies, f_m, cr_m)
            nfev += npop
            nit = it
            e_np = np.asarray(energies)
            best_i = int(e_np.argmin())
            conv = float(e_np.std())
            if cfg.disp:
                print(f"differential_evolution step {it}: f(x)= {e_np[best_i]:.6g}")
            if cfg.callback is not None:
                inter = DEIntermediate(
                    np.asarray(expand(pop[best_i])), float(e_np[best_i]), conv, it
                )
                if cfg.callback(inter) == CallbackAction.STOP:
                    message = "callback requested stop"
                    break
            if conv <= cfg.atol + cfg.tol * abs(float(e_np.mean())):
                success = True
                message = "converged (population std within tolerance)"
                break

    e_np = np.asarray(energies)
    best_i = int(e_np.argmin())
    x_best = np.asarray(expand(pop[best_i]))
    f_best = float(e_np[best_i])

    if cfg.polish is not None and cfg.polish.enabled:
        from scipy import optimize as sciopt

        maxeval = cfg.polish.maxeval or 200 * n_full
        res = sciopt.minimize(
            lambda x: float(raw_energy(jnp.asarray(x))),
            x_best,
            method="Nelder-Mead",
            bounds=[(lb_full[i], ub_full[i]) for i in range(n_full)],
            options={"maxfev": maxeval, "xatol": 1e-10, "fatol": 1e-12},
        )
        nfev += res.nfev
        if res.fun < f_best:
            x_best, f_best = np.asarray(res.x), float(res.fun)

    pop_full = np.asarray(jax.vmap(expand)(pop))
    return DEReport(
        x=x_best,
        fun=f_best,
        success=success,
        message=message,
        nit=nit,
        nfev=nfev,
        population=pop_full,
        population_energies=e_np,
    )
