"""Small parity utilities: stats, index pickers, plotting, progress, npy data."""

import io

import numpy as np

from speech_enhancement_clskd_tpu.utils.stats import (
    get_mu_sig,
    max_index,
    min_index,
    near_avg_index,
)
from speech_enhancement_clskd_tpu.utils.plotting import (
    plot_error_to_numpy,
    plot_mask_to_numpy,
    plot_spectrogram_to_numpy,
)
from speech_enhancement_clskd_tpu.utils.progress import Bar
from speech_enhancement_clskd_tpu.data.npy_dataset import WaveDataset


def test_mu_sig(rng):
    d = [rng.standard_normal((100, 4)).astype(np.float32) * 3 + 1]
    mu, sig = get_mu_sig(d)
    np.testing.assert_allclose(np.float32(mu), d[0].mean(0), atol=1e-2)
    np.testing.assert_allclose(np.float32(sig), d[0].std(0), atol=2e-2)
    # unit-variance flooring
    flat = [np.ones((50, 2), np.float32)]
    _, sig2 = get_mu_sig(flat)
    np.testing.assert_array_equal(np.float32(sig2), [1.0, 1.0])


def test_index_pickers():
    a = [1.0, 5.0, 3.0, 5.0, 2.0]
    assert near_avg_index(a) == 2  # mean 3.2 -> closest 3.0
    assert max_index(a) == 3  # last max, reference semantics
    assert min_index(a) == 0


def test_plotting(rng):
    wav = rng.standard_normal(8000).astype(np.float32) * 0.3
    img = plot_spectrogram_to_numpy(wav)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    mask = rng.random((100, 257)).astype(np.float32)
    img2 = plot_mask_to_numpy(mask)
    assert img2.ndim == 3
    img3 = plot_error_to_numpy(wav, wav * 0.5)
    assert img3.ndim == 3


def test_progress_bar():
    buf = io.StringIO()
    items = list(Bar(range(5), batch_size=2, out=buf))
    assert items == [0, 1, 2, 3, 4]
    s = buf.getvalue()
    assert "10/10" in s and "ETA" in s


def test_npy_dataset(tmp_path, rng):
    pairs = np.array(
        [
            [rng.standard_normal(100).astype(np.float32),
             rng.standard_normal(100).astype(np.float32)]
            for _ in range(4)
        ]
    )
    p = str(tmp_path / "train_dataset.npy")
    np.save(p, pairs)
    ds = WaveDataset(p)
    assert len(ds) == 4
    noisy, clean = ds[1]
    assert noisy.shape == (100,) and clean.shape == (1, 100)
    np.testing.assert_array_equal(noisy, pairs[1][0])


class TestSyntheticHardProfile:
    """The 'hard' quality-proxy corpus (multi-type noise, wider SNR, reverb
    on the speech contribution; VERDICT r3 missing #1)."""

    def test_default_profile_unchanged(self):
        from speech_enhancement_clskd_tpu.data import (
            SyntheticEnhancementDataset,
        )

        a = SyntheticEnhancementDataset(size=4, segment=0.5, seed=3)
        b = SyntheticEnhancementDataset(size=4, segment=0.5, seed=3,
                                        profile="default")
        ma, sa = a[1]
        mb, sb = b[1]
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(sa, sb)

    def test_hard_profile_finite_and_harder(self):
        from speech_enhancement_clskd_tpu.data import (
            SyntheticEnhancementDataset,
        )

        ds = SyntheticEnhancementDataset(size=64, segment=0.5, seed=5,
                                         profile="hard")
        mses, count_differ = [], 0
        base = SyntheticEnhancementDataset(size=64, segment=0.5, seed=5)
        for i in range(16):
            mix, src = ds[i]
            assert np.isfinite(mix).all() and np.isfinite(src).all()
            assert np.abs(mix).max() <= 1.0 + 1e-6
            mses.append(float(np.mean((mix - src[0]) ** 2)))
            if not np.array_equal(mix, base[i][0]):
                count_differ += 1
        # the hard corpus is actually different and actually noisy
        assert count_differ >= 12
        assert np.mean(mses) > 0
        import pytest

        with pytest.raises(ValueError):
            SyntheticEnhancementDataset(profile="nonsense")
