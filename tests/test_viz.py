"""Visualization smoke tests (Agg backend, no display)."""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pyroved_tpu.utils import (make_img_grid, plot_grid_traversal,  # noqa: E402
                               plot_img_grid, plot_latent_predictions,
                               plot_spect_grid)


def test_make_img_grid_layout():
    imgs = np.arange(4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3)
    grid = make_img_grid(imgs, nrow=2, padding=1, pad_value=-1)
    assert grid.shape == (1 + 2 * 4, 1 + 2 * 4)
    # first tile lands at [1:4, 1:4]
    np.testing.assert_array_equal(grid[1:4, 1:4], imgs[0])
    np.testing.assert_array_equal(grid[1:4, 5:8], imgs[1])
    assert grid[0, 0] == -1  # padding value


def test_make_img_grid_rgb():
    imgs = np.arange(4 * 3 * 3 * 3, dtype=np.float32).reshape(4, 3, 3, 3)
    grid = make_img_grid(imgs, nrow=2, padding=1, pad_value=0)
    assert grid.shape == (1 + 2 * 4, 1 + 2 * 4, 3)
    np.testing.assert_array_equal(grid[1:4, 1:4], imgs[0])
    # singleton channel still collapses to 2-D
    assert make_img_grid(imgs[..., :1], nrow=2).ndim == 2
    # non-displayable channel counts raise instead of rendering garbage
    with pytest.raises(ValueError, match="channel"):
        make_img_grid(imgs[..., :2], nrow=2)


def test_plot_functions_smoke(monkeypatch):
    monkeypatch.setattr(plt, "show", lambda: None)
    imgs = np.random.default_rng(0).uniform(0, 1, (9, 8, 8)).astype(np.float32)
    plot_img_grid(imgs, 3, extent=[-1, 1, -1, 1])
    spectra = np.random.default_rng(1).uniform(0, 1, (9, 16)).astype(np.float32)
    plot_spect_grid(spectra, 3, ylim=(0, 1))
    plot_grid_traversal(imgs, 3, (8, 8), 3)
    plot_latent_predictions(np.random.default_rng(2).normal(size=9), 3)
    plt.close("all")
