"""Synthetic dataset generators: determinism, shapes, skew properties."""

import numpy as np

from bpmf_tpu.datasets import synth_chembl, synth_movielens


def test_movielens_deterministic():
    a, _ = synth_movielens(n_users=500, n_movies=300, n_ratings=5000)
    b, _ = synth_movielens(n_users=500, n_movies=300, n_ratings=5000)
    assert (a != b).nnz == 0


def test_movielens_shapes_and_split():
    train, test = synth_movielens(n_users=400, n_movies=200, n_ratings=4000)
    assert train.shape == test.shape == (400, 200)
    assert train.nnz + test.nnz == 4000
    assert test.nnz == 400
    # no overlap between train and test
    overlap = train.multiply(test.astype(bool))
    assert overlap.nnz == 0
    vals = np.concatenate([train.tocoo().data, test.tocoo().data])
    assert vals.min() >= 1.0 and vals.max() <= 5.0


def test_chembl_skew():
    """Tall-skinny with extreme column-degree imbalance (breakpoint2
    territory, c++/bpmf.h:256)."""
    train, _ = synth_chembl(n_compounds=20000, n_proteins=80, n_ratings=60000)
    deg = np.diff(train.indptr)  # protein degrees
    assert deg.max() > 20 * np.median(deg[deg > 0])
