"""IIR/FIR engine tests.

Mirrors math-iir-fir in-crate tests: biquad gain at center frequency
(mod.rs:20-24, tolerance 0.1 dB), scan-vs-sequential equivalence,
designer cascades, exporter formats, loudness/preamp gains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from mathaudio_tpu.dsp import (
    Biquad,
    BiquadFilterType,
    SRATE,
    bw2q,
    q2bw,
    peq_spl,
    compute_peq_response,
    peq_preamp_gain,
    peq_preamp_gain_max,
    peq_loudness_gain,
    peq_butterworth_lowpass,
    peq_butterworth_highpass,
    peq_linkwitzriley_lowpass,
    peq_format_apo,
    peq_format_rme_channel,
    peq_format_rme_room,
    peq_format_aupreset,
    biquad_process_block,
    biquad_cascade_block,
    peq_coeff_matrix,
    Fir,
    FirFilterType,
)

FT = BiquadFilterType


def seq_filter(bq, x, state=(0.0, 0.0, 0.0, 0.0)):
    """Direct Form I reference implementation (numpy, sequential)."""
    x1, x2, y1, y2 = state
    y = np.zeros_like(x)
    for i, xi in enumerate(x):
        yi = bq.b0 * xi + bq.b1 * x1 + bq.b2 * x2 - bq.a1 * y1 - bq.a2 * y2
        x2, x1 = x1, xi
        y2, y1 = y1, yi
        y[i] = yi
    return y


class TestBiquad:
    def test_peak_gain_at_center(self):
        # |log_result(f0) - gain| < 0.1 dB (mod.rs:20-24)
        for gain in [-6.0, 3.0, 6.0, 12.0]:
            bq = Biquad(FT.PEAK, 1000.0, SRATE, 1.0, gain)
            assert abs(float(bq.log_result(1000.0)) - gain) < 0.1

    def test_vs_scipy_sos(self):
        bq = Biquad(FT.PEAK, 1000.0, SRATE, 1.4, 5.0)
        w, h = sps.sosfreqz([[bq.b0, bq.b1, bq.b2, 1.0, bq.a1, bq.a2]], worN=512, fs=SRATE)
        ours = np.asarray(bq.np_log_result(jnp.asarray(w[1:])))
        ref = 20 * np.log10(np.maximum(np.abs(h[1:]), 1e-20))
        np.testing.assert_allclose(ours, ref, atol=1e-8)

    def test_lowpass_monotone_rolloff(self):
        bq = Biquad(FT.LOWPASS, 1000.0, SRATE, 0.0, 0.0)
        assert abs(float(bq.log_result(20.0))) < 0.1
        assert float(bq.log_result(10000.0)) < -30.0
        # default Q applied
        assert abs(bq.q - 1 / np.sqrt(2)) < 1e-12

    def test_notch_forces_q30(self):
        bq = Biquad(FT.NOTCH, 1000.0, SRATE, 2.0, 0.0)
        assert bq.q == 30.0

    def test_bw_q_roundtrip(self):
        for q in [0.5, 0.707, 1.0, 2.0, 5.0]:
            assert abs(bw2q(q2bw(q)) - q) < 1e-10


class TestScanKernel:
    def test_scan_matches_sequential(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(512)
        bq = Biquad(FT.PEAK, 2000.0, SRATE, 1.0, 6.0)
        y_ref = seq_filter(bq, x)
        y, state = biquad_process_block(jnp.asarray(x), (bq.b0, bq.b1, bq.b2, bq.a1, bq.a2))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-9)

    def test_scan_state_carrying(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(256)
        bq = Biquad(FT.HIGHPASS, 500.0, SRATE, 0.0, 0.0)
        coeffs = (bq.b0, bq.b1, bq.b2, bq.a1, bq.a2)
        y_full, _ = biquad_process_block(jnp.asarray(x), coeffs)
        y1, st = biquad_process_block(jnp.asarray(x[:128]), coeffs)
        y2, _ = biquad_process_block(jnp.asarray(x[128:]), coeffs, state=st)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(y1), np.asarray(y2)]), np.asarray(y_full), atol=1e-9
        )

    def test_cascade(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(300)
        peq = peq_butterworth_lowpass(4, 2000.0, SRATE)
        cm = peq_coeff_matrix(peq, dtype=jnp.float64)
        y = np.asarray(biquad_cascade_block(jnp.asarray(x), cm))
        y_ref = x.copy()
        for _, bq in peq:
            y_ref = seq_filter(bq, y_ref)
        np.testing.assert_allclose(y, y_ref, atol=1e-8)

    def test_impulse_response_matches_scipy(self):
        bq = Biquad(FT.PEAK, 1000.0, SRATE, 1.0, 6.0)
        imp = np.zeros(64)
        imp[0] = 1.0
        y, _ = biquad_process_block(jnp.asarray(imp), (bq.b0, bq.b1, bq.b2, bq.a1, bq.a2))
        ref = sps.lfilter([bq.b0, bq.b1, bq.b2], [1.0, bq.a1, bq.a2], imp)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


class TestPeq:
    def _peq(self):
        return [
            (1.0, Biquad(FT.PEAK, 100.0, SRATE, 1.0, 3.0)),
            (1.0, Biquad(FT.PEAK, 1000.0, SRATE, 2.0, -4.0)),
            (1.0, Biquad(FT.HIGHSHELF, 8000.0, SRATE, 0.0, 2.0)),
        ]

    def test_peq_spl_additive(self):
        peq = self._peq()
        freqs = jnp.asarray([100.0, 1000.0, 8000.0])
        total = np.asarray(peq_spl(freqs, peq))
        parts = sum(np.asarray(bq.np_log_result(freqs)) * w for w, bq in peq)
        np.testing.assert_allclose(total, parts, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(compute_peq_response(freqs, peq, SRATE)), total, atol=1e-12
        )

    def test_preamp_gain_negative(self):
        peq = self._peq()
        g = peq_preamp_gain(peq)
        assert g <= 0.0
        g_max = peq_preamp_gain_max(peq)
        assert g_max <= g  # worst-case is more conservative

    def test_loudness_gain_sign(self):
        boost = [(1.0, Biquad(FT.PEAK, 1000.0, SRATE, 1.0, 6.0))]
        cut = [(1.0, Biquad(FT.PEAK, 1000.0, SRATE, 1.0, -6.0))]
        assert peq_loudness_gain(boost, "k") < 0.0
        assert peq_loudness_gain(cut, "k") > 0.0
        assert peq_loudness_gain([], "k") == 0.0

    def test_butterworth_crossover_sums_flat(self):
        # LR4 LP + HP sum to flat (0 dB) — the crossover property
        lp = peq_linkwitzriley_lowpass(4, 1000.0, SRATE)
        from mathaudio_tpu.dsp import peq_linkwitzriley_highpass

        hp = peq_linkwitzriley_highpass(4, 1000.0, SRATE)
        freqs = jnp.logspace(jnp.log10(20.0), jnp.log10(20000.0), 100)
        h_lp = 10 ** (np.asarray(peq_spl(freqs, lp)) / 20)
        h_hp = 10 ** (np.asarray(peq_spl(freqs, hp)) / 20)
        # allpass magnitude: |LP| + |HP| phase-aligned for LR
        total_db = 20 * np.log10(h_lp + h_hp)
        np.testing.assert_allclose(total_db, 0.0, atol=0.1)

    def test_butterworth_cutoff(self):
        for order in [2, 4, 6]:
            lp = peq_butterworth_lowpass(order, 1000.0, SRATE)
            at_fc = float(peq_spl(jnp.asarray([1000.0]), lp)[0])
            assert abs(at_fc - (-3.01)) < 0.1, f"order {order}: {at_fc}"


class TestFormats:
    def _peq(self):
        return [
            (1.0, Biquad(FT.PEAK, 100.0, SRATE, 1.0, 3.0)),
            (1.0, Biquad(FT.LOWPASS, 8000.0, SRATE, 0.0, 0.0)),
        ]

    def test_apo(self):
        s = peq_format_apo("# test", self._peq())
        assert "Preamp:" in s
        assert "Filter  1: ON PK Fc   100 Hz Gain +3.00 dB Q 1.00" in s
        assert "Filter  2: ON LP Fc  8000 Hz" in s

    def test_rme_channel(self):
        s = peq_format_rme_channel(self._peq())
        for needle in ["<Preset>", "<Equalizer>", "LC Grade", "Band1 Freq", "</Preset>"]:
            assert needle in s

    def test_rme_room(self):
        s = peq_format_rme_room(self._peq())
        assert "Room EQ L" in s and "Room EQ R" in s
        assert s.count("REQ Band9 Freq") == 2  # padded to exactly 9 bands

    def test_aupreset(self):
        s = peq_format_aupreset(self._peq(), "myeq")
        assert "<plist" in s and "myeq" in s
        assert "<integer>2</integer>" in s  # numberOfBands
        import base64, re

        m = re.search(r"<data>\n(.*?)\n\t</data>", s, re.S)
        raw = base64.b64decode("".join(m.group(1).split()))
        # header: 4 ints + float, then 81 (id, value) pairs... 80 params
        assert len(raw) == 20 + 80 * 8


class TestFir:
    def test_lowpass_response(self):
        f = Fir(FirFilterType.LOWPASS, 1000.0, SRATE, num_taps=101)
        lo = float(f.np_log_result(jnp.asarray([100.0]))[0])
        hi = float(f.np_log_result(jnp.asarray([5000.0]))[0])
        assert abs(lo) < 0.1
        assert hi < -40.0

    def test_highpass_response(self):
        f = Fir(FirFilterType.HIGHPASS, 1000.0, SRATE, num_taps=101)
        lo = float(f.np_log_result(jnp.asarray([100.0]))[0])
        hi = float(f.np_log_result(jnp.asarray([10000.0]))[0])
        assert lo < -40.0
        assert abs(hi) < 0.5

    def test_process_matches_scipy(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(400)
        f = Fir(FirFilterType.LOWPASS, 2000.0, SRATE, num_taps=51)
        y, _ = f.process_block(jnp.asarray(x))
        ref = sps.lfilter(f.taps, [1.0], x)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-10)

    def test_block_state_carrying(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(256)
        f = Fir(FirFilterType.BANDPASS, 2000.0, SRATE, num_taps=31, bandwidth=1000.0)
        y_full, _ = f.process_block(jnp.asarray(x))
        y1, st = f.process_block(jnp.asarray(x[:100]))
        y2, _ = f.process_block(jnp.asarray(x[100:]), state=st)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(y1), np.asarray(y2)]), np.asarray(y_full), atol=1e-12
        )


class TestTryNew:
    def test_validation(self):
        import pytest as _pytest

        Biquad.try_new(FT.PEAK, 1000.0, SRATE, 2.0, 3.0)  # valid
        with _pytest.raises(ValueError):
            Biquad.try_new(FT.PEAK, 30000.0, SRATE, 2.0, 0.0)  # above Nyquist
        with _pytest.raises(ValueError):
            Biquad.try_new(FT.PEAK, 1000.0, -1.0, 2.0, 0.0)
        with _pytest.raises(ValueError):
            Biquad.try_new(FT.PEAK, 1000.0, SRATE, -2.0, 0.0)
        with _pytest.raises(ValueError):
            Biquad.try_new(FT.PEAK, 1000.0, SRATE, 2.0, float("inf"))


class TestAutoEq:
    def test_fit_peq_recovers_target(self):
        """End-to-end speaker-EQ flow: DE fits a 3-filter PEQ to a response
        synthesized from a known PEQ; fitted curve within 0.35 dB RMS."""
        from mathaudio_tpu.optim import fit_peq

        truth = [
            (1.0, Biquad(FT.LOWSHELF, 120.0, SRATE, 0.9, 4.0)),
            (1.0, Biquad(FT.PEAK, 1800.0, SRATE, 1.5, -5.0)),
            (1.0, Biquad(FT.HIGHSHELF, 9000.0, SRATE, 0.8, 2.5)),
        ]
        freqs = np.logspace(np.log10(20.0), np.log10(20000.0), 96)
        target = np.asarray(peq_spl(jnp.asarray(freqs), truth))
        res = fit_peq(freqs, target, n_filters=3, maxiter=500, seed=4)
        assert res.rms_error_db < 0.35, res.rms_error_db
        fitted = np.asarray(res.response_db(freqs))
        np.testing.assert_allclose(fitted, target, atol=1.0)

    def test_jax_response_matches_biquad(self):
        from mathaudio_tpu.dsp.jax_response import biquad_response_db

        freqs = jnp.logspace(jnp.log10(30.0), jnp.log10(18000.0), 50)
        for kind, ft in [("PK", FT.PEAK), ("LS", FT.LOWSHELF), ("HS", FT.HIGHSHELF)]:
            bq = Biquad(ft, 1500.0, SRATE, 1.1, 5.5)
            ours = np.asarray(biquad_response_db(kind, 1500.0, 1.1, 5.5, freqs))
            ref = np.asarray(bq.np_log_result(freqs))
            np.testing.assert_allclose(ours, ref, atol=1e-10, err_msg=kind)


class TestFilterTypeAsymptotics:
    """Response asymptotics for every RBJ biquad type (iir.rs:21 types;
    the reference tests these per-type in its in-crate suite)."""

    def _mag_db(self, bq, freqs):
        return np.asarray(bq.log_result(jnp.asarray(freqs, jnp.float64)))

    def test_lowpass_highpass_asymptotes(self):
        lp = Biquad(FT.LOWPASS, 1000.0, SRATE, 0.7071, 0.0)
        hp = Biquad(FT.HIGHPASS, 1000.0, SRATE, 0.7071, 0.0)
        lo, hi = self._mag_db(lp, [20.0, 20000.0]), self._mag_db(hp, [20.0, 20000.0])
        assert abs(lo[0]) < 0.1 and lo[1] < -40  # LP: flat below, dead above
        assert hi[0] < -40 and abs(hi[1]) < 0.6  # HP: dead below, flat above

    def test_bandpass_peaks_at_center(self):
        bp = Biquad(FT.BANDPASS, 1000.0, SRATE, 2.0, 0.0)
        g = self._mag_db(bp, [100.0, 1000.0, 10000.0])
        assert g[1] > g[0] + 10 and g[1] > g[2] + 10
        assert abs(g[1]) < 0.1  # unity at center

    def test_notch_kills_center(self):
        nt = Biquad(FT.NOTCH, 1000.0, SRATE, 30.0, 0.0)
        g = self._mag_db(nt, [500.0, 1000.0, 2000.0])
        assert g[1] < -30 and abs(g[0]) < 0.5 and abs(g[2]) < 0.5

    def test_shelves_land_on_gain(self):
        ls = Biquad(FT.LOWSHELF, 1000.0, SRATE, 0.7071, 6.0)
        hs = Biquad(FT.HIGHSHELF, 1000.0, SRATE, 0.7071, -6.0)
        gl = self._mag_db(ls, [20.0, 20000.0])
        gh = self._mag_db(hs, [20.0, 20000.0])
        assert abs(gl[0] - 6.0) < 0.3 and abs(gl[1]) < 0.3
        assert abs(gh[0]) < 0.3 and abs(gh[1] + 6.0) < 0.3

    def test_peak_symmetric_inverse(self):
        """A +g and -g peak at the same (f0, Q) cancel exactly."""
        up = Biquad(FT.PEAK, 1000.0, SRATE, 1.0, 5.0)
        dn = Biquad(FT.PEAK, 1000.0, SRATE, 1.0, -5.0)
        freqs = np.logspace(np.log10(20), np.log10(20000), 64)
        total = self._mag_db(up, freqs) + self._mag_db(dn, freqs)
        np.testing.assert_allclose(total, 0.0, atol=1e-10)


class TestShortBlocks:
    def test_single_sample_blocks_match_long_block(self):
        """Length-1 blocks chained through state must equal one long
        block (regression: the feed-forward delay-line slice produced a
        length-2 array for t=1 and associative_scan raised)."""
        bq = Biquad(FT.PEAK, 1000.0, SRATE, 1.0, 4.0)
        coeffs = (bq.b0, bq.b1, bq.b2, bq.a1, bq.a2)
        rng = np.random.default_rng(9)
        x = rng.standard_normal(16).astype(np.float64)
        y_long, _ = biquad_process_block(jnp.asarray(x), coeffs)
        state = None
        ys = []
        for xi in x:
            yi, state = biquad_process_block(jnp.asarray([xi]), coeffs, state)
            ys.append(float(yi[0]))
        np.testing.assert_allclose(ys, np.asarray(y_long), rtol=1e-10, atol=1e-12)


class TestBandLimiting:
    """filter_peqs_by_gain + RME room slot rules (iir.rs:1975-2160)."""

    def _pk(self, freq, gain):
        return (1.0, Biquad(FT.PEAK, freq, SRATE, 1.0, gain))

    def test_filter_peqs_under_limit_unchanged(self):
        from mathaudio_tpu.dsp import filter_peqs_by_gain

        peq = [self._pk(100.0 * (i + 1), 1.0 + i) for i in range(3)]
        assert filter_peqs_by_gain(peq, 5) == peq

    def test_filter_peqs_over_limit_keeps_largest_gains(self):
        from mathaudio_tpu.dsp import filter_peqs_by_gain

        peq = [self._pk(100.0 * (i + 1), float(i)) for i in range(12)]
        out = filter_peqs_by_gain(peq, 9)
        assert len(out) == 9
        kept = {bq.db_gain for _, bq in out}
        assert kept == {float(i) for i in range(3, 12)}
        # original order preserved
        assert [bq.freq for _, bq in out] == sorted(bq.freq for _, bq in out)

    def test_filter_peqs_priority_over_gain(self):
        """A low-gain shelf outranks high-gain peaks."""
        from mathaudio_tpu.dsp import filter_peqs_by_gain, get_filter_priority

        assert get_filter_priority(FT.LOWSHELF) > get_filter_priority(FT.PEAK)
        peq = [self._pk(100.0 * (i + 1), 10.0) for i in range(9)]
        peq.append((1.0, Biquad(FT.LOWSHELF, 80.0, SRATE, 0.0, 0.5)))
        out = filter_peqs_by_gain(peq, 9)
        assert any(bq.filter_type == FT.LOWSHELF for _, bq in out)
        assert len(out) == 9

    def _room_slots(self, peq):
        from mathaudio_tpu.dsp.formats import _enforce_rme_room_constraints

        return _enforce_rme_room_constraints(peq)

    def test_room_empty_pads_nine_neutral_pk(self):
        out = self._room_slots([])
        assert len(out) == 9
        assert all(bq.filter_type == FT.PEAK and bq.db_gain == 0.0 for _, bq in out)

    def test_room_no_shelves_keeps_pk_order(self):
        peq = [self._pk(100.0 * (i + 1), 1.0) for i in range(4)]
        out = self._room_slots(peq)
        assert len(out) == 9
        assert [bq.freq for _, bq in out[:4]] == [100.0, 200.0, 300.0, 400.0]

    def test_room_single_lowshelf_goes_to_slot_one(self):
        peq = [self._pk(500.0, 2.0), (1.0, Biquad(FT.LOWSHELF, 80.0, SRATE, 0.0, 4.0))]
        out = self._room_slots(peq)
        assert out[0][1].filter_type == FT.LOWSHELF
        assert out[1][1].filter_type == FT.PEAK and out[1][1].freq == 500.0
        assert out[8][1].filter_type == FT.PEAK  # only one non-PK -> slot 9 is PK

    def test_room_both_shelves_slot_one_and_nine(self):
        peq = [
            (1.0, Biquad(FT.HIGHSHELF, 8000.0, SRATE, 0.0, -3.0)),
            self._pk(500.0, 2.0),
            (1.0, Biquad(FT.LOWSHELF, 80.0, SRATE, 0.0, 4.0)),
        ]
        out = self._room_slots(peq)
        assert out[0][1].filter_type == FT.LOWSHELF  # lowest freq non-PK
        assert out[8][1].filter_type == FT.HIGHSHELF  # highest freq non-PK
        assert all(bq.filter_type == FT.PEAK for _, bq in out[1:8])

    def test_room_three_non_pk_picks_extremes(self):
        peq = [
            (1.0, Biquad(FT.LOWSHELF, 80.0, SRATE, 0.0, 4.0)),
            (1.0, Biquad(FT.HIGHPASS, 40.0, SRATE, 0.0, 0.0)),
            (1.0, Biquad(FT.HIGHSHELF, 8000.0, SRATE, 0.0, -3.0)),
        ]
        out = self._room_slots(peq)
        assert out[0][1].filter_type == FT.HIGHPASS and out[0][1].freq == 40.0
        assert out[8][1].filter_type == FT.HIGHSHELF

    def test_room_unsupported_type_becomes_pk(self):
        peq = [(1.0, Biquad(FT.NOTCH, 1000.0, SRATE, 0.0, 0.0))]
        out = self._room_slots(peq)
        assert out[0][1].filter_type == FT.PEAK
        assert out[0][1].freq == 1000.0

    def test_room_excess_pk_dropped(self):
        peq = [self._pk(100.0 * (i + 1), 1.0) for i in range(12)]
        out = self._room_slots(peq)
        assert len(out) == 9
        assert [bq.freq for _, bq in out] == [100.0 * (i + 1) for i in range(9)]


class TestWeightings:
    """A/K-weighting anchor values (iir.rs test_a_weighting/test_k_weighting)."""

    def test_a_weighting_zero_at_1khz(self):
        from mathaudio_tpu.dsp.iir import _a_weighting_db

        assert abs(float(_a_weighting_db(jnp.asarray(1000.0)))) < 0.05

    def test_a_weighting_rolls_off_low_frequencies(self):
        from mathaudio_tpu.dsp.iir import _a_weighting_db

        lo = float(_a_weighting_db(jnp.asarray(50.0)))
        assert -32.0 < lo < -28.0  # A(50 Hz) ~ -30.2 dB

    def test_k_weighting_boosts_highs(self):
        from mathaudio_tpu.dsp.iir import _k_weighting_db

        assert abs(float(_k_weighting_db(jnp.asarray(1000.0)))) < 1e-9  # flat mid band
        assert float(_k_weighting_db(jnp.asarray(10000.0))) > 2.0  # shelf boost ~ +4 dB
        assert float(_k_weighting_db(jnp.asarray(20.0))) < -10.0  # sub-38 Hz rolloff


class TestFirParity:
    """fir.rs tests not covered above: tap symmetry (linear phase),
    DC response, window properties, bank preamp, bandstop."""

    def test_taps_symmetric_linear_phase(self):
        for ft, kw in [
            (FirFilterType.LOWPASS, {}),
            (FirFilterType.HIGHPASS, {}),
            (FirFilterType.BANDPASS, {"bandwidth": 800.0}),
            (FirFilterType.BANDSTOP, {"bandwidth": 800.0}),
        ]:
            f = Fir(ft, 2000.0, SRATE, num_taps=51, **kw)
            np.testing.assert_allclose(f.taps, f.taps[::-1], atol=1e-12)

    def test_lowpass_dc_unity_highpass_dc_rejected(self):
        lp = Fir(FirFilterType.LOWPASS, 2000.0, SRATE, num_taps=101)
        hp = Fir(FirFilterType.HIGHPASS, 2000.0, SRATE, num_taps=101)
        assert abs(np.sum(lp.taps) - 1.0) < 1e-6  # DC gain 1
        # windowed-sinc HP: small residual DC leakage, strong in-band rejection
        assert abs(np.sum(hp.taps)) < 0.01
        assert float(hp.np_log_result(jnp.asarray([100.0]))[0]) < -40.0

    def test_bandstop_kills_center_passes_dc(self):
        bs = Fir(FirFilterType.BANDSTOP, 3000.0, SRATE, num_taps=151, bandwidth=1000.0)
        center = float(bs.np_log_result(jnp.asarray([3000.0]))[0])
        dc_ish = float(bs.np_log_result(jnp.asarray([100.0]))[0])
        assert center < -30.0
        assert abs(dc_ish) < 0.5

    def test_windows_properties(self):
        from mathaudio_tpu.dsp import generate_window
        from mathaudio_tpu.dsp.fir import WindowType

        n = 65
        for wt in WindowType:
            w = generate_window(wt, n)
            assert w.shape == (n,)
            np.testing.assert_allclose(w, w[::-1], atol=1e-12)  # symmetric
            assert w.max() <= 1.0 + 1e-12
            assert abs(w[n // 2] - w.max()) < 1e-12  # peak at center
        rect = generate_window(WindowType.RECTANGULAR, n)
        np.testing.assert_allclose(rect, 1.0)
        hann = generate_window(WindowType.HANN, n)
        assert abs(hann[0]) < 1e-12 and abs(hann[-1]) < 1e-12

    def test_fir_bank(self):
        from mathaudio_tpu.dsp import FirBank

        lp = Fir(FirFilterType.LOWPASS, 1000.0, SRATE, num_taps=101)
        hp = Fir(FirFilterType.HIGHPASS, 1000.0, SRATE, num_taps=101)
        bank = FirBank([(1.0, lp), (0.5, hp)])
        freqs = jnp.asarray([100.0, 10000.0])
        r = np.asarray(bank.np_log_result(freqs))
        # bank response is the weighted dB sum (fir.rs:708, like peq_spl)
        expect = np.asarray(lp.np_log_result(freqs)) + 0.5 * np.asarray(hp.np_log_result(freqs))
        np.testing.assert_allclose(r, expect, atol=1e-12)
        empty = FirBank([])
        assert float(empty.preamp_gain()) == 0.0
        assert bank.preamp_gain() <= 0.0
