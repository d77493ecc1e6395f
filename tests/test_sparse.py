"""Bucketed padded-CSR layout tests (bpmf_tpu/sparse.py)."""

import numpy as np
import scipy.sparse as sp

from bpmf_tpu.sparse import bucketize, pad_count


def _coverage(side, m):
    """Reconstruct (item -> multiset of (nbr, val)) from buckets."""
    got = {}
    for b in side.buckets:
        for r in range(b.n_rows):
            slot = b.row_slot[r]
            gid = int(b.item_ids[slot])
            if b.slot_valid[slot] == 0:
                assert b.mask[r].sum() == 0
                continue
            for w in range(b.width):
                if b.mask[r, w]:
                    got.setdefault(gid, []).append((int(b.nbr[r, w]), float(b.val[r, w])))
    return got


def test_bucketize_covers_all_entries(rng):
    m = sp.random(50, 30, density=0.2, random_state=np.random.RandomState(1), format="csc")
    side = bucketize(m, np.arange(30), scratch_id=30)
    got = _coverage(side, m)
    mc = m.tocsc()
    for j in range(30):
        col = mc.getcol(j).tocoo()
        want = sorted(zip(col.row.tolist(), col.data.tolist()))
        assert sorted(got.get(j, [])) == want
    assert side.num_nnz == m.nnz


def test_row_splitting():
    """Items with degree > max_bucket_width are split across rows sharing a
    slot (the chembl skew case, SURVEY.md §7 risk 2)."""
    rows = np.concatenate([np.arange(100), np.array([0, 1, 2])])
    cols = np.concatenate([np.zeros(100, int), np.array([1, 1, 1])])
    vals = np.arange(103, dtype=float) + 1
    m = sp.csc_matrix((vals, (rows, cols)), shape=(100, 2))
    side = bucketize(m, np.arange(2), scratch_id=2, max_bucket_width=16)
    assert any(b.split for b in side.buckets)
    got = _coverage(side, m)
    assert len(got[0]) == 100  # all 100 entries present despite width 16
    assert len(got[1]) == 3
    # split rows of item 0 share one slot
    wide = [b for b in side.buckets if b.split][0]
    slots_item0 = {
        int(wide.row_slot[r])
        for r in range(wide.n_rows)
        if wide.mask[r].sum() and int(wide.item_ids[wide.row_slot[r]]) == 0
    }
    assert len(slots_item0) == 1


def test_degree_zero_items():
    m = sp.csc_matrix((5, 4))  # empty
    side = bucketize(m, np.arange(4), scratch_id=4)
    assert side.num == 4
    total_valid = sum(int(b.slot_valid.sum()) for b in side.buckets)
    assert total_valid == 4
    for b in side.buckets:
        assert b.mask.sum() == 0


def test_padding_slots_are_scratch():
    m = sp.random(20, 9, density=0.3, random_state=np.random.RandomState(2), format="csc")
    side = bucketize(m, np.arange(9), scratch_id=9)
    for b in side.buckets:
        pad = b.slot_valid == 0
        assert (b.item_ids[pad] == 9).all()


def test_pad_count():
    assert pad_count(1) == 8
    assert pad_count(8) == 8
    assert pad_count(9) == 16
