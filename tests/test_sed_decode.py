"""Edge-case unit tests for the SED event decoder (SURVEY.md §4/§7)."""

import numpy as np

from sound_event_detection_dcase2017_task4_tpu import sed


def _probs(seq):
    """[T] list → [1, T, 1] array."""
    return np.asarray(seq, np.float32)[None, :, None]


class TestBinarize:
    def test_plain_threshold(self):
        p = _probs([0.1, 0.6, 0.7, 0.1])
        a = sed.binarize(p, 0.5, 0.5)
        np.testing.assert_array_equal(a[0, :, 0], [0, 1, 1, 0])

    def test_hysteresis_extends_to_low(self):
        p = _probs([0.25, 0.3, 0.9, 0.3, 0.25, 0.1])
        a = sed.binarize(p, 0.5, 0.2)
        np.testing.assert_array_equal(a[0, :, 0], [1, 1, 1, 1, 1, 0])

    def test_hysteresis_drops_unseeded_runs(self):
        # second run never crosses high threshold → dropped entirely
        p = _probs([0.9, 0.3, 0.0, 0.3, 0.4, 0.3, 0.0])
        a = sed.binarize(p, 0.5, 0.2)
        np.testing.assert_array_equal(a[0, :, 0], [1, 1, 0, 0, 0, 0, 0])

    def test_empty(self):
        p = _probs([0.0] * 8)
        a = sed.binarize(p, 0.5, 0.2)
        assert a.sum() == 0

    def test_all_active(self):
        p = _probs([0.9] * 8)
        a = sed.binarize(p, 0.5, 0.2)
        assert a.sum() == 8

    def test_gap_fill(self):
        p = _probs([0.9, 0.9, 0.0, 0.0, 0.9, 0.9])
        a = sed.binarize(p, 0.5, 0.2, n_smooth=3)      # gap of 2 < 3 → filled
        np.testing.assert_array_equal(a[0, :, 0], [1, 1, 1, 1, 1, 1])
        a2 = sed.binarize(p, 0.5, 0.2, n_smooth=2)     # gap of 2 ≥ 2 → kept
        np.testing.assert_array_equal(a2[0, :, 0], [1, 1, 0, 0, 1, 1])

    def test_leading_trailing_gaps_not_filled(self):
        p = _probs([0.0, 0.9, 0.9, 0.0])
        a = sed.binarize(p, 0.5, 0.2, n_smooth=5)
        np.testing.assert_array_equal(a[0, :, 0], [0, 1, 1, 0])

    def test_salt_removal(self):
        p = _probs([0.0, 0.9, 0.0, 0.9, 0.9, 0.9, 0.0])
        a = sed.binarize(p, 0.5, 0.5, n_salt=2)        # 1-frame run dropped
        np.testing.assert_array_equal(a[0, :, 0], [0, 0, 0, 1, 1, 1, 0])

    def test_smooth_then_salt_order(self):
        # two 1-frame seeds 2 apart: smoothing first merges them into a
        # 4-frame run, which then survives n_salt=3.
        p = _probs([0.9, 0.0, 0.0, 0.9, 0.0])
        a = sed.binarize(p, 0.5, 0.5, n_smooth=3, n_salt=3)
        np.testing.assert_array_equal(a[0, :, 0], [1, 1, 1, 1, 0])


class TestBinarizeJax:
    """The on-device decode must agree exactly with the numpy reference."""

    def test_matches_numpy_randomized(self):
        rng = np.random.RandomState(0)
        probs = rng.rand(4, 120, 5).astype(np.float32)
        # structured regions so hysteresis/smooth/salt all trigger
        probs[0, 10:30, 0] = 0.9
        probs[0, 32:34, 0] = 0.25
        probs[1, 50:52, 2] = 0.95
        for high, low, n_smooth, n_salt in [
            (0.5, 0.2, 1, 1), (0.5, 0.2, 5, 1), (0.5, 0.2, 1, 5),
            (0.8, 0.3, 10, 10), (0.5, 0.5, 3, 3), (0.9, 0.1, 7, 4),
        ]:
            ref = sed.binarize(probs, high, low, n_smooth, n_salt)
            out = np.asarray(sed.binarize_jax(probs, high, low,
                                              n_smooth, n_salt))
            np.testing.assert_array_equal(
                out, ref,
                err_msg=f"params {(high, low, n_smooth, n_salt)}")

    def test_per_class_thresholds(self):
        rng = np.random.RandomState(1)
        probs = rng.rand(2, 60, 3).astype(np.float32)
        high = np.array([0.9, 0.5, 0.7], np.float32)
        low = high * 0.5
        ref = sed.binarize(probs, high, low, 4, 4)
        out = np.asarray(sed.binarize_jax(probs, high, low, 4, 4))
        np.testing.assert_array_equal(out, ref)


class TestEvents:
    def test_runs_to_seconds(self):
        active = np.zeros((1, 300, 2), np.uint8)
        active[0, 100:250, 0] = 1
        active[0, 0:50, 1] = 1
        evts = sed.events_from_binary(active, frames_per_second=100,
                                      labels=["a", "b"])
        assert evts[0] == [(0.0, 0.5, "b"), (1.0, 2.5, "a")]

    def test_full_decode_roundtrip(self):
        probs = np.zeros((2, 400, 3), np.float32)
        probs[0, 120:260, 1] = 0.95
        probs[1, 10:90, 2] = 0.85
        evts = sed.frame_prediction_to_event_prediction(
            probs, {"sed_high_threshold": 0.5, "sed_low_threshold": 0.3,
                    "n_smooth": 5, "n_salt": 5},
            frames_per_second=100, labels=["x", "y", "z"])
        assert evts[0] == [(1.2, 2.6, "y")]
        assert evts[1] == [(0.1, 0.9, "z")]


class TestFuzzAgainstBruteForce:
    """Randomized decode vs an independent brute-force implementation."""

    @staticmethod
    def _brute(probs_1d, high, low, n_smooth, n_salt):
        t = len(probs_1d)
        act = [p >= low for p in probs_1d]
        seed = [p >= high for p in probs_1d]
        # hysteresis: keep active runs containing a seed
        keep = [False] * t
        i = 0
        while i < t:
            if act[i]:
                j = i
                while j < t and act[j]:
                    j += 1
                if any(seed[i:j]):
                    for k in range(i, j):
                        keep[k] = True
                i = j
            else:
                i += 1
        # fill enclosed gaps < n_smooth
        runs = []
        i = 0
        while i < t:
            if keep[i]:
                j = i
                while j < t and keep[j]:
                    j += 1
                runs.append((i, j))
                i = j
            else:
                i += 1
        for (s1, e1), (s2, e2) in zip(runs, runs[1:]):
            if s2 - e1 < n_smooth:
                for k in range(e1, s2):
                    keep[k] = True
        # remove runs < n_salt
        out = keep[:]
        i = 0
        while i < t:
            if out[i]:
                j = i
                while j < t and out[j]:
                    j += 1
                if j - i < n_salt:
                    for k in range(i, j):
                        out[k] = False
                i = j
            else:
                i += 1
        return np.asarray(out, np.uint8)

    def test_fuzz(self):
        rng = np.random.RandomState(42)
        for trial in range(50):
            t = rng.randint(5, 60)
            probs = rng.rand(1, t, 1).astype(np.float32)
            high = float(rng.uniform(0.4, 0.9))
            low = float(rng.uniform(0.1, high))
            n_smooth = int(rng.randint(1, 8))
            n_salt = int(rng.randint(1, 8))
            got = sed.binarize(probs, high, low, n_smooth, n_salt)[0, :, 0]
            exp = self._brute(probs[0, :, 0], high, low, n_smooth, n_salt)
            np.testing.assert_array_equal(
                got, exp,
                err_msg=f"trial {trial}: h={high:.2f} l={low:.2f} "
                        f"ns={n_smooth} na={n_salt} probs={probs[0,:,0]}")
            got_j = np.asarray(
                sed.binarize_jax(probs, high, low, n_smooth, n_salt))[0, :, 0]
            np.testing.assert_array_equal(got_j, exp)
