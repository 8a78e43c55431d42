"""Benchmark objective functions, pure jnp.

Standard formulas (Jamil & Yang 2013 survey, al-Roomi archive, SciPy /
CEC conventions), matching the reference suite's function set
(math-test-functions/src/functions/*.rs). Signature: f(x: (n,)) -> scalar.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = jnp.pi


def _n(x):
    return x.shape[0]


def _i1(x):
    return jnp.arange(1, x.shape[0] + 1, dtype=x.dtype)


# ---------------------------------------------------------------- unimodal

def sphere(x):
    return jnp.sum(x**2)


def sum_squares(x):
    return jnp.sum(_i1(x) * x**2)


def rotated_hyper_ellipsoid(x):
    return jnp.sum(jnp.cumsum(x**2))


def schwefel2(x):
    """Schwefel 1.2: sum of squared prefix sums."""
    return jnp.sum(jnp.cumsum(x) ** 2)


def cigar(x):
    return x[0] ** 2 + 1e6 * jnp.sum(x[1:] ** 2)


def bent_cigar(x):
    return x[0] ** 2 + 1e6 * jnp.sum(x[1:] ** 2)


def bent_cigar_alt(x):
    return x[0] ** 2 + 1e6 * jnp.sum(x[1:] ** 2)


def tablet(x):
    return 1e6 * x[0] ** 2 + jnp.sum(x[1:] ** 2)


def discus(x):
    return 1e6 * x[0] ** 2 + jnp.sum(x[1:] ** 2)


def elliptic(x):
    n = _n(x)
    i = jnp.arange(n, dtype=x.dtype)
    expo = jnp.where(n > 1, 6.0 * i / (n - 1), 0.0)
    return jnp.sum(10.0**expo * x**2)


def ridge(x):
    return x[0] + 2.0 * jnp.sum(x[1:] ** 2) ** 0.5


def sharp_ridge(x):
    return x[0] ** 2 + 100.0 * jnp.sqrt(jnp.sum(x[1:] ** 2))


def brown(x):
    x2 = x**2
    a, b = x2[:-1], x2[1:]
    return jnp.sum(a ** (b + 1.0) + b ** (a + 1.0))


def chung_reynolds(x):
    return jnp.sum(x**2) ** 2


def quadratic(x):
    return jnp.sum(x**2)


def quartic(x):
    """De Jong F4 without noise."""
    return jnp.sum(_i1(x) * x**4)


def step(x):
    return jnp.sum(jnp.floor(x + 0.5) ** 2)


def de_jong_step2(x):
    return jnp.sum(jnp.floor(x + 0.5) ** 2)


def sum_of_different_pow(x):
    i = _i1(x)
    return jnp.sum(jnp.abs(x) ** (i + 1.0))


def different_pow(x):
    return sum_of_different_pow(x)


def zakharov(x):
    s1 = jnp.sum(x**2)
    s2 = jnp.sum(0.5 * _i1(x) * x)
    return s1 + s2**2 + s2**4


def zakharov2(x):
    return zakharov(x)


def trid(x):
    return jnp.sum((x - 1.0) ** 2) - jnp.sum(x[1:] * x[:-1])


def dixons_price(x):
    i = jnp.arange(2, x.shape[0] + 1, dtype=x.dtype)
    return (x[0] - 1.0) ** 2 + jnp.sum(i * (2.0 * x[1:] ** 2 - x[:-1]) ** 2)


def powell(x):
    """Powell singular function; dims multiple of 4."""
    x4 = x.reshape(-1, 4)
    a, b, c, d = x4[:, 0], x4[:, 1], x4[:, 2], x4[:, 3]
    return jnp.sum(
        (a + 10 * b) ** 2 + 5 * (c - d) ** 2 + (b - 2 * c) ** 4 + 10 * (a - d) ** 4
    )


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def booth(x):
    return (x[0] + 2 * x[1] - 7) ** 2 + (2 * x[0] + x[1] - 5) ** 2


def matyas(x):
    return 0.26 * (x[0] ** 2 + x[1] ** 2) - 0.48 * x[0] * x[1]


def beale(x):
    a, b = x[0], x[1]
    return (
        (1.5 - a + a * b) ** 2
        + (2.25 - a + a * b**2) ** 2
        + (2.625 - a + a * b**3) ** 2
    )


def colville(x):
    a, b, c, d = x[0], x[1], x[2], x[3]
    return (
        100 * (a**2 - b) ** 2
        + (a - 1) ** 2
        + (c - 1) ** 2
        + 90 * (c**2 - d) ** 2
        + 10.1 * ((b - 1) ** 2 + (d - 1) ** 2)
        + 19.8 * (b - 1) * (d - 1)
    )


def freudenstein_roth(x):
    a, b = x[0], x[1]
    t1 = -13 + a + ((5 - b) * b - 2) * b
    t2 = -29 + a + ((b + 1) * b - 14) * b
    return t1**2 + t2**2


def power_sum(x):
    """Power sum with b = (8, 18, 44, 114), 4-D."""
    b = jnp.asarray([8.0, 18.0, 44.0, 114.0], x.dtype)
    k = jnp.arange(1, 5, dtype=x.dtype)
    inner = jnp.sum(x[None, :] ** k[:, None], axis=1)
    return jnp.sum((inner - b) ** 2)


def perm_d_beta(x, beta=0.5):
    n = _n(x)
    i = _i1(x)
    j = _i1(x)
    inner = jnp.sum(
        (j[None, :] ** i[:, None] + beta) * ((x[None, :] / j[None, :]) ** i[:, None] - 1.0),
        axis=1,
    )
    return jnp.sum(inner**2)


def perm_0_d_beta(x, beta=10.0):
    i = _i1(x)
    j = _i1(x)
    inner = jnp.sum(
        (j[None, :] + beta) * (x[None, :] ** i[:, None] - (1.0 / j[None, :]) ** i[:, None]),
        axis=1,
    )
    return jnp.sum(inner**2)


# -------------------------------------------------------------- multimodal

def ackley(x):
    n = _n(x)
    s1 = jnp.sum(x**2) / n
    s2 = jnp.sum(jnp.cos(2 * PI * x)) / n
    return -20.0 * jnp.exp(-0.2 * jnp.sqrt(s1)) - jnp.exp(s2) + 20.0 + jnp.e


def ackley_n2(x):
    return -200.0 * jnp.exp(-0.02 * jnp.sqrt(x[0] ** 2 + x[1] ** 2))


def ackley_n3(x):
    r = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
    return -200.0 * jnp.exp(-0.02 * r) + 5.0 * jnp.exp(jnp.cos(3 * x[0]) + jnp.sin(3 * x[1]))


def alpine_n1(x):
    return jnp.sum(jnp.abs(x * jnp.sin(x) + 0.1 * x))


def alpine_n2(x):
    """Maximization form negated: min f = -prod sqrt(x) sin(x)."""
    return -jnp.prod(jnp.sqrt(x) * jnp.sin(x))


def rastrigin(x):
    return 10.0 * _n(x) + jnp.sum(x**2 - 10.0 * jnp.cos(2 * PI * x))


def griewank(x):
    i = _i1(x)
    return jnp.sum(x**2) / 4000.0 - jnp.prod(jnp.cos(x / jnp.sqrt(i))) + 1.0


def griewank2(x):
    return griewank(x)


def schwefel(x):
    """Schwefel 2.26: 418.9829 n - sum x sin(sqrt|x|)."""
    return 418.9829 * _n(x) - jnp.sum(x * jnp.sin(jnp.sqrt(jnp.abs(x))))


def levy(x):
    w = 1.0 + (x - 1.0) / 4.0
    t1 = jnp.sin(PI * w[0]) ** 2
    t2 = jnp.sum((w[:-1] - 1) ** 2 * (1 + 10 * jnp.sin(PI * w[:-1] + 1) ** 2))
    t3 = (w[-1] - 1) ** 2 * (1 + jnp.sin(2 * PI * w[-1]) ** 2)
    return t1 + t2 + t3


def levy_n13(x):
    a, b = x[0], x[1]
    return (
        jnp.sin(3 * PI * a) ** 2
        + (a - 1) ** 2 * (1 + jnp.sin(3 * PI * b) ** 2)
        + (b - 1) ** 2 * (1 + jnp.sin(2 * PI * b) ** 2)
    )


def levi13(x):
    return levy_n13(x)


def michalewicz(x, m=10.0):
    i = _i1(x)
    return -jnp.sum(jnp.sin(x) * jnp.sin(i * x**2 / PI) ** (2 * m))


def epistatic_michalewicz(x, m=10.0, theta=PI / 6):
    n = _n(x)
    idx = jnp.arange(n)
    x_next = jnp.concatenate([x[1:], x[:1]])
    y_odd = x * jnp.cos(theta) - x_next * jnp.sin(theta)
    y_even = x * jnp.sin(theta) + x_next * jnp.cos(theta)
    is_last = idx == n - 1
    is_odd_pos = (idx % 2 == 0) & ~is_last  # 1-based odd
    y = jnp.where(is_last, x, jnp.where(is_odd_pos, y_odd, y_even))
    i = _i1(x)
    return -jnp.sum(jnp.sin(y) * jnp.sin(i * y**2 / PI) ** (2 * m))


def branin(x):
    a, b = x[0], x[1]
    return (
        (b - 5.1 / (4 * PI**2) * a**2 + 5.0 / PI * a - 6.0) ** 2
        + 10.0 * (1 - 1 / (8 * PI)) * jnp.cos(a)
        + 10.0
    )


def goldstein_price(x):
    a, b = x[0], x[1]
    t1 = 1 + (a + b + 1) ** 2 * (19 - 14 * a + 3 * a**2 - 14 * b + 6 * a * b + 3 * b**2)
    t2 = 30 + (2 * a - 3 * b) ** 2 * (
        18 - 32 * a + 12 * a**2 + 48 * b - 36 * a * b + 27 * b**2
    )
    return t1 * t2


def six_hump_camel(x):
    a, b = x[0], x[1]
    return (4 - 2.1 * a**2 + a**4 / 3) * a**2 + a * b + (-4 + 4 * b**2) * b**2


def three_hump_camel(x):
    a, b = x[0], x[1]
    return 2 * a**2 - 1.05 * a**4 + a**6 / 6 + a * b + b**2


def easom(x):
    a, b = x[0], x[1]
    return -jnp.cos(a) * jnp.cos(b) * jnp.exp(-((a - PI) ** 2 + (b - PI) ** 2))


def eggholder(x):
    a, b = x[0], x[1]
    return -(b + 47) * jnp.sin(jnp.sqrt(jnp.abs(b + a / 2 + 47))) - a * jnp.sin(
        jnp.sqrt(jnp.abs(a - (b + 47)))
    )


def himmelblau(x):
    a, b = x[0], x[1]
    return (a**2 + b - 11) ** 2 + (a + b**2 - 7) ** 2


def holder_table(x):
    a, b = x[0], x[1]
    return -jnp.abs(
        jnp.sin(a) * jnp.cos(b) * jnp.exp(jnp.abs(1 - jnp.sqrt(a**2 + b**2) / PI))
    )


def cross_in_tray(x):
    a, b = x[0], x[1]
    t = jnp.abs(
        jnp.sin(a) * jnp.sin(b) * jnp.exp(jnp.abs(100 - jnp.sqrt(a**2 + b**2) / PI))
    )
    return -0.0001 * (t + 1) ** 0.1


def drop_wave(x):
    r2 = x[0] ** 2 + x[1] ** 2
    return -(1 + jnp.cos(12 * jnp.sqrt(r2))) / (0.5 * r2 + 2)


def bohachevsky1(x):
    a, b = x[0], x[1]
    return a**2 + 2 * b**2 - 0.3 * jnp.cos(3 * PI * a) - 0.4 * jnp.cos(4 * PI * b) + 0.7


def bohachevsky2(x):
    a, b = x[0], x[1]
    return a**2 + 2 * b**2 - 0.3 * jnp.cos(3 * PI * a) * jnp.cos(4 * PI * b) + 0.3


def bohachevsky3(x):
    a, b = x[0], x[1]
    return a**2 + 2 * b**2 - 0.3 * jnp.cos(3 * PI * a + 4 * PI * b) + 0.3


def schaffer_n2(x):
    a, b = x[0], x[1]
    num = jnp.sin(a**2 - b**2) ** 2 - 0.5
    den = (1 + 0.001 * (a**2 + b**2)) ** 2
    return 0.5 + num / den


def schaffer_n4(x):
    a, b = x[0], x[1]
    num = jnp.cos(jnp.sin(jnp.abs(a**2 - b**2))) ** 2 - 0.5
    den = (1 + 0.001 * (a**2 + b**2)) ** 2
    return 0.5 + num / den


def shubert(x):
    i = jnp.arange(1.0, 6.0)
    s1 = jnp.sum(i * jnp.cos((i + 1) * x[0] + i))
    s2 = jnp.sum(i * jnp.cos((i + 1) * x[1] + i))
    return s1 * s2


def styblinski_tang2(x):
    return 0.5 * jnp.sum(x**4 - 16 * x**2 + 5 * x)


def mccormick(x):
    a, b = x[0], x[1]
    return jnp.sin(a + b) + (a - b) ** 2 - 1.5 * a + 2.5 * b + 1.0


def bukin_n6(x):
    a, b = x[0], x[1]
    return 100 * jnp.sqrt(jnp.abs(b - 0.01 * a**2)) + 0.01 * jnp.abs(a + 10)


def bird(x):
    a, b = x[0], x[1]
    return (
        jnp.sin(a) * jnp.exp((1 - jnp.cos(b)) ** 2)
        + jnp.cos(b) * jnp.exp((1 - jnp.sin(a)) ** 2)
        + (a - b) ** 2
    )


def salomon(x):
    r = jnp.sqrt(jnp.sum(x**2))
    return 1.0 - jnp.cos(2 * PI * r) + 0.1 * r


def salomon_corrected(x):
    return salomon(x)


def periodic(x):
    s = jnp.sum(jnp.sin(x) ** 2)
    return 1.0 + s - 0.1 * jnp.exp(-jnp.sum(x**2))


def cosine_mixture(x):
    return -(0.1 * jnp.sum(jnp.cos(5 * PI * x)) - jnp.sum(x**2))


def exponential(x):
    return -jnp.exp(-0.5 * jnp.sum(x**2))


def qing(x):
    i = _i1(x)
    return jnp.sum((x**2 - i) ** 2)


def katsuura(x):
    n = _n(x)
    k = jnp.arange(1, 33, dtype=x.dtype)
    two_k = 2.0**k
    term = jnp.sum(
        jnp.abs(two_k[None, :] * x[:, None] - jnp.round(two_k[None, :] * x[:, None]))
        / two_k[None, :],
        axis=1,
    )
    i = _i1(x)
    return jnp.prod(1.0 + i * term) - 1.0


def whitley(x):
    xi = x[:, None]
    xj = x[None, :]
    t = 100 * (xi**2 - xj) ** 2 + (1 - xj) ** 2
    return jnp.sum(t**2 / 4000.0 - jnp.cos(t) + 1.0)


def vincent(x):
    return -jnp.sum(jnp.sin(10.0 * jnp.log(x)))


def pinter(x):
    n = _n(x)
    i = _i1(x)
    x_prev = jnp.concatenate([x[-1:], x[:-1]])
    x_next = jnp.concatenate([x[1:], x[:1]])
    a = x_prev * jnp.sin(x) + jnp.sin(x_next)
    b = x_prev**2 - 2 * x + 3 * x_next - jnp.cos(x) + 1.0
    return (
        jnp.sum(i * x**2)
        + jnp.sum(20.0 * i * jnp.sin(a) ** 2)
        + jnp.sum(i * jnp.log10(1.0 + i * b**2))
    )


def xin_she_yang_n1(x):
    i = _i1(x)
    # deterministic variant (reference uses eps_i = 1)
    return jnp.sum(jnp.abs(x) ** i)


def xin_she_yang_n2(x):
    return jnp.sum(jnp.abs(x)) * jnp.exp(-jnp.sum(jnp.sin(x**2)))


def xin_she_yang_n3(x, m=5.0, beta=15.0):
    t1 = jnp.exp(-jnp.sum((x / beta) ** (2 * m)))
    t2 = 2.0 * jnp.exp(-jnp.sum(x**2)) * jnp.prod(jnp.cos(x) ** 2)
    return t1 - t2


def xin_she_yang_n4(x):
    t1 = jnp.sum(jnp.sin(x) ** 2)
    t2 = jnp.exp(-jnp.sum(x**2))
    t3 = jnp.exp(-jnp.sum(jnp.sin(jnp.sqrt(jnp.abs(x))) ** 2))
    return (t1 - t2) * t3


def happycat(x, alpha=0.125):
    n = _n(x)
    r2 = jnp.sum(x**2)
    s = jnp.sum(x)
    return jnp.abs(r2 - n) ** (2 * alpha) + (0.5 * r2 + s) / n + 0.5


def happy_cat(x):
    """Reference's happycat.rs uses |r2-n|^0.25 — alpha = 0.125."""
    return happycat(x, alpha=0.125)


def expanded_griewank_rosenbrock(x):
    x_next = jnp.concatenate([x[1:], x[:1]])
    t = 100.0 * (x**2 - x_next) ** 2 + (x - 1.0) ** 2
    return jnp.sum(t**2 / 4000.0 - jnp.cos(t) + 1.0)


def forrester_2008(x):
    a = x[0]
    return (6 * a - 2) ** 2 * jnp.sin(12 * a - 4)


def gramacy_lee_2012(x):
    a = x[0]
    return jnp.sin(10 * PI * a) / (2 * a) + (a - 1) ** 4


def gramacy_lee_function(x):
    return gramacy_lee_2012(x)


def langermann(x):
    a = jnp.asarray([[3.0, 5.0], [5.0, 2.0], [2.0, 1.0], [1.0, 4.0], [7.0, 9.0]], x.dtype)
    c = jnp.asarray([1.0, 2.0, 5.0, 2.0, 3.0], x.dtype)
    d2 = jnp.sum((x[None, :] - a) ** 2, axis=1)
    return -jnp.sum(c * jnp.exp(-d2 / PI) * jnp.cos(PI * d2))


def dejong_f5_foxholes(x):
    a_row = jnp.asarray([-32.0, -16.0, 0.0, 16.0, 32.0], x.dtype)
    a1 = jnp.tile(a_row, 5)
    a2 = jnp.repeat(a_row, 5)
    j = jnp.arange(1.0, 26.0)
    denom = j + (x[0] - a1) ** 6 + (x[1] - a2) ** 6
    return 1.0 / (0.002 + jnp.sum(1.0 / denom))


def shekel(x, m=10):
    a = jnp.asarray(
        [
            [4, 4, 4, 4], [1, 1, 1, 1], [8, 8, 8, 8], [6, 6, 6, 6], [3, 7, 3, 7],
            [2, 9, 2, 9], [5, 5, 3, 3], [8, 1, 8, 1], [6, 2, 6, 2], [7, 3.6, 7, 3.6],
        ],
        x.dtype,
    )[:m]
    c = jnp.asarray([0.1, 0.2, 0.2, 0.4, 0.4, 0.6, 0.3, 0.7, 0.5, 0.5], x.dtype)[:m]
    return -jnp.sum(1.0 / (jnp.sum((x[None, :] - a) ** 2, axis=1) + c))


_HARTMAN3_A = [[3, 10, 30], [0.1, 10, 35], [3, 10, 30], [0.1, 10, 35]]
_HARTMAN3_P = [
    [0.3689, 0.117, 0.2673],
    [0.4699, 0.4387, 0.747],
    [0.1091, 0.8732, 0.5547],
    [0.03815, 0.5743, 0.8828],
]
_HARTMAN6_A = [
    [10, 3, 17, 3.5, 1.7, 8],
    [0.05, 10, 17, 0.1, 8, 14],
    [3, 3.5, 1.7, 10, 17, 8],
    [17, 8, 0.05, 10, 0.1, 14],
]
_HARTMAN6_P = [
    [0.1312, 0.1696, 0.5569, 0.0124, 0.8283, 0.5886],
    [0.2329, 0.4135, 0.8307, 0.3736, 0.1004, 0.9991],
    [0.2348, 0.1451, 0.3522, 0.2883, 0.3047, 0.6650],
    [0.4047, 0.8828, 0.8732, 0.5743, 0.1091, 0.0381],
]
_HARTMAN_C = [1.0, 1.2, 3.0, 3.2]


def _hartman(x, a, p):
    a = jnp.asarray(a, x.dtype)
    p = jnp.asarray(p, x.dtype)
    c = jnp.asarray(_HARTMAN_C, x.dtype)
    inner = jnp.sum(a * (x[None, :] - p) ** 2, axis=1)
    return -jnp.sum(c * jnp.exp(-inner))


def hartman_3d(x):
    return _hartman(x, _HARTMAN3_A, _HARTMAN3_P)


def hartman_6d(x):
    return _hartman(x, _HARTMAN6_A, _HARTMAN6_P)


def hartman_4d(x):
    """4-D slice of the 6-D Hartmann family (first four columns)."""
    a = jnp.asarray(_HARTMAN6_A, x.dtype)[:, :4]
    p = jnp.asarray(_HARTMAN6_P, x.dtype)[:, :4]
    c = jnp.asarray(_HARTMAN_C, x.dtype)
    inner = jnp.sum(a * (x[None, :] - p) ** 2, axis=1)
    return -jnp.sum(c * jnp.exp(-inner))


# ------------------------------------------------------ constrained family

def binh_korn_weighted(x):
    """Binh–Korn bi-objective scalarized (equal weights)."""
    f1 = 4 * x[0] ** 2 + 4 * x[1] ** 2
    f2 = (x[0] - 5) ** 2 + (x[1] - 5) ** 2
    return 0.5 * f1 + 0.5 * f2


def binh_korn_constraint1(x):
    """(x-5)^2 + y^2 <= 25 -> g <= 0."""
    return (x[0] - 5) ** 2 + x[1] ** 2 - 25.0


def binh_korn_constraint2(x):
    """(x-8)^2 + (y+3)^2 >= 7.7 -> g <= 0."""
    return 7.7 - (x[0] - 8) ** 2 - (x[1] + 3) ** 2


def keanes_bump_objective(x):
    num = jnp.abs(jnp.sum(jnp.cos(x) ** 4) - 2.0 * jnp.prod(jnp.cos(x) ** 2))
    den = jnp.sqrt(jnp.sum(_i1(x) * x**2))
    return -num / jnp.maximum(den, 1e-30)


def keanes_bump_constraint1(x):
    """prod x > 0.75 -> g <= 0."""
    return 0.75 - jnp.prod(x)


def keanes_bump_constraint2(x):
    """sum x < 7.5 n -> g <= 0."""
    return jnp.sum(x) - 7.5 * _n(x)


def mishras_bird_objective(x):
    a, b = x[0], x[1]
    return (
        jnp.sin(b) * jnp.exp((1 - jnp.cos(a)) ** 2)
        + jnp.cos(a) * jnp.exp((1 - jnp.sin(b)) ** 2)
        + (a - b) ** 2
    )


def mishras_bird_constraint(x):
    """(x+5)^2 + (y+5)^2 < 25 -> g <= 0."""
    return (x[0] + 5) ** 2 + (x[1] + 5) ** 2 - 25.0


def rosenbrock_objective(x):
    return rosenbrock(x)


def rosenbrock_disk_constraint(x):
    """x^2 + y^2 <= 2 -> g <= 0."""
    return x[0] ** 2 + x[1] ** 2 - 2.0


def lampinen_simplified(x):
    head = jnp.sum(5.0 * x[:4] - x[:4] ** 2)
    tail = -jnp.sum(x[4:])
    return -(head + tail)
