"""Loader parity tests (reference dataset.py:43-107 semantics)."""

import numpy as np

from hcspmm_tpu.graphs import io
from hcspmm_tpu.graphs.dataset import GraphDataset


def test_txt_loader_is_one_indexed_dst_src(tmp_path):
    # reference dataset.py:52-53: line "a,b" means edge (src=b-1 -> dst=a-1)
    p = tmp_path / "g.txt"
    p.write_text("2,1\n3,1\n3,2\n")
    src, dst, n = io.load_edges_txt(str(p))
    assert n == 3
    assert sorted(zip(src.tolist(), dst.tolist())) == [(0, 1), (0, 2), (1, 2)]


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "g.npz")
    src = np.array([0, 1, 2], np.int32)
    dst = np.array([1, 2, 0], np.int32)
    io.save_edges_npz(p, src, dst, 5)
    s2, d2, n2 = io.load_edges_npz(p)
    assert n2 == 5
    np.testing.assert_array_equal(s2, src)
    np.testing.assert_array_equal(d2, dst)


def test_to_csr_merges_duplicates():
    src = np.array([0, 0, 0, 1], np.int32)
    dst = np.array([1, 1, 2, 0], np.int32)
    rp, ci = io.to_csr(src, dst, 3)
    assert rp.tolist() == [0, 2, 3, 3]   # duplicate (0,1) merged
    assert ci.tolist() == [1, 2, 0]


def test_dataset_from_txt(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("2,1\n1,2\n3,2\n2,3\n")
    ds = GraphDataset.from_txt(str(p), dim=8, num_classes=4)
    assert ds.num_nodes == 3
    assert ds.x.shape == (3, 8)
    assert ds.y.shape == (3,)
    assert (ds.y == 1).all()            # all-ones labels (main reference quirk)
    assert ds.train_mask.all()          # train = 100% of nodes
    assert ds.degrees_sqrt is not None


def test_synthetic_blocks_structure():
    src, dst, n = io.synthetic_blocks(1000, 6.0, block_size=100, seed=0,
                                      shuffle=False)
    assert n == 1000
    # edges stay within their block when unshuffled
    assert (np.abs(src // 100 - dst // 100) == 0).all()
    src2, dst2, _ = io.synthetic_blocks(1000, 6.0, block_size=100, seed=0,
                                        shuffle=True)
    assert not (np.abs(src2 // 100 - dst2 // 100) == 0).all()
