"""Device butteraugli (metrics/butteraugli_jax.py) vs the host model."""

import numpy as np

from libjxl_tpu.metrics.butteraugli import (
    butteraugli_diffmap,
    butteraugli_score,
)
from libjxl_tpu.metrics.butteraugli_jax import (
    butteraugli_diffmap_jax,
    butteraugli_score_jax,
)


def _pair(h=96, w=128, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.stack([0.4 + 0.3 * np.sin(xx / 11 + c) * np.cos(yy / 7 - c)
                  for c in range(3)])
    a = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    b = np.clip(a + rng.normal(0, noise, a.shape), 0, 1)
    return a, b


def test_diffmap_matches_host_model():
    a, b = _pair()
    host = butteraugli_diffmap(a, b)
    dev = np.asarray(butteraugli_diffmap_jax(a, b))
    rel = np.abs(host - dev) / (np.abs(host) + 1e-3)
    assert rel.max() < 2e-3, rel.max()


def test_score_matches_host_model():
    for noise in (0.003, 0.03):
        a, b = _pair(noise=noise, seed=3)
        s_host = butteraugli_score(a, b)
        s_dev = butteraugli_score_jax(a, b)
        assert abs(s_host - s_dev) < 0.01 + 0.01 * s_host, (s_host, s_dev)


def test_identical_images_score_zero():
    a, _ = _pair()
    assert butteraugli_score_jax(a, a) < 1e-4
