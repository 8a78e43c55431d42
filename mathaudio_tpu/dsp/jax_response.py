"""jnp-traceable biquad responses — RBJ coefficients and magnitude
response as pure functions of (f0, Q, gain), so filter parameters can be
optimization variables (the speaker-EQ fitting path: DE over PEQ
parameters against a target SPL, driving dsp + optim together).

Same math as dsp.iir.Biquad but differentiable/vmappable; host Biquad
objects remain the API for fixed filters.
"""

from __future__ import annotations

import jax.numpy as jnp

from mathaudio_tpu.dsp.iir import SRATE


def _response_db_from_coeffs(b0, b1, b2, a1, a2, freqs, srate):
    phi = jnp.sin(jnp.pi * freqs / srate) ** 2
    phi2 = phi * phi
    r_up = (
        (b0 + b1 + b2) ** 2
        - 4.0 * (b0 * b1 + 4.0 * b0 * b2 + b1 * b2) * phi
        + 16.0 * b0 * b2 * phi2
    )
    r_dw = (
        (1.0 + a1 + a2) ** 2
        - 4.0 * (a1 + 4.0 * a2 + a1 * a2) * phi
        + 16.0 * a2 * phi2
    )
    return 10.0 * jnp.log10(jnp.maximum(r_up / r_dw, 1e-20))


def peak_coeffs(f0, q, gain_db, srate=SRATE):
    a = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * jnp.pi * f0 / srate
    alpha = jnp.sin(w0) / (2.0 * q)
    cs = jnp.cos(w0)
    a0 = 1.0 + alpha / a
    return (
        (1.0 + alpha * a) / a0, -2.0 * cs / a0, (1.0 - alpha * a) / a0,
        -2.0 * cs / a0, (1.0 - alpha / a) / a0,
    )


def lowshelf_coeffs(f0, q, gain_db, srate=SRATE):
    a = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * jnp.pi * f0 / srate
    sn, cs = jnp.sin(w0), jnp.cos(w0)
    beta = jnp.sqrt(a + a)
    b0 = a * ((a + 1) - (a - 1) * cs + beta * sn)
    b1 = 2 * a * ((a - 1) - (a + 1) * cs)
    b2 = a * ((a + 1) - (a - 1) * cs - beta * sn)
    a0 = (a + 1) + (a - 1) * cs + beta * sn
    a1 = -2 * ((a - 1) + (a + 1) * cs)
    a2 = (a + 1) + (a - 1) * cs - beta * sn
    return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0


def highshelf_coeffs(f0, q, gain_db, srate=SRATE):
    a = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * jnp.pi * f0 / srate
    sn, cs = jnp.sin(w0), jnp.cos(w0)
    beta = jnp.sqrt(a + a)
    b0 = a * ((a + 1) + (a - 1) * cs + beta * sn)
    b1 = -2 * a * ((a - 1) + (a + 1) * cs)
    b2 = a * ((a + 1) + (a - 1) * cs - beta * sn)
    a0 = (a + 1) - (a - 1) * cs + beta * sn
    a1 = 2 * ((a - 1) - (a + 1) * cs)
    a2 = (a + 1) - (a - 1) * cs - beta * sn
    return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0


_COEFF_FNS = {"PK": peak_coeffs, "LS": lowshelf_coeffs, "HS": highshelf_coeffs}


def biquad_response_db(kind: str, f0, q, gain_db, freqs, srate=SRATE):
    """dB magnitude response of one parametric filter at ``freqs``."""
    b0, b1, b2, a1, a2 = _COEFF_FNS[kind](f0, q, gain_db, srate)
    return _response_db_from_coeffs(b0, b1, b2, a1, a2, freqs, srate)


def peq_response_db(kinds, params, freqs, srate=SRATE):
    """Total dB response of a parametric EQ.

    kinds: static list of filter kinds ('PK'/'LS'/'HS'); params: (n, 3)
    array of (log10 f0, Q, gain_dB) — log-frequency parametrization keeps
    DE search spaces well-scaled.
    """
    total = jnp.zeros_like(freqs)
    for i, kind in enumerate(kinds):
        f0 = 10.0 ** params[i, 0]
        total = total + biquad_response_db(kind, f0, params[i, 1], params[i, 2], freqs, srate)
    return total
