import jax
import numpy as np

from hcspmm_tpu.models.net import Net, init_net_params
from hcspmm_tpu.utils.checkpoint import load_pytree, save_pytree


def test_checkpoint_roundtrip(tmp_path):
    net = Net(model="gcn", num_features=12, hidden=8, num_classes=5, num_layers=3)
    params = init_net_params(net, jax.random.PRNGKey(7))
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, params, {"epoch": 42})
    loaded, meta = load_pytree(path)
    assert meta["epoch"] == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # tree structure preserved
    assert jax.tree.structure(params) == jax.tree.structure(loaded)


def test_checkpoint_nested_dict(tmp_path):
    tree = {"a": np.arange(3), "b": [np.ones((2, 2)), {"c": np.float32(1.5)}]}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    loaded, _ = load_pytree(path)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["b"][0], tree["b"][0])
    assert float(loaded["b"][1]["c"]) == 1.5
