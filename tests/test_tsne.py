"""Pure-numpy exact t-SNE (G3): cluster preservation + determinism.
No Spark session needed — the reduction is driver-side by design."""

import numpy as np

from bertseyeview_spark.functions.tsne import tsne_2d


def _two_clusters(n_per=20, dim=10, sep=8.0, seed=3):
    rng = np.random.RandomState(seed)
    a = rng.standard_normal((n_per, dim))
    b = rng.standard_normal((n_per, dim)) + sep
    return np.vstack([a, b])


def test_tsne_preserves_cluster_structure():
    x = _two_clusters()
    y = tsne_2d(x, n_iter=300, seed=0)
    a, b = y[:20], y[20:]
    intra = max(
        np.linalg.norm(a - a.mean(0), axis=1).mean(),
        np.linalg.norm(b - b.mean(0), axis=1).mean(),
    )
    inter = np.linalg.norm(a.mean(0) - b.mean(0))
    assert inter > 2 * intra  # clusters stay separated in 2-D


def test_tsne_deterministic_and_shapes():
    x = _two_clusters(n_per=8, dim=6)
    y1 = tsne_2d(x, n_iter=120, seed=1)
    y2 = tsne_2d(x, n_iter=120, seed=1)
    assert y1.shape == (16, 2)
    assert np.allclose(y1, y2)
    assert tsne_2d(np.zeros((1, 4))).shape == (1, 2)
    assert tsne_2d(np.zeros((0, 4))).shape == (0, 2)
