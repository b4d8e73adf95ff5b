"""Keras HDF5 weight import test against a synthetic reference-format file."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from overlapnet_tpu.core.config import ModelConfig
from overlapnet_tpu.models import build_model, init_params, leg_output_width
from overlapnet_tpu.train.import_keras import import_keras_weights, read_keras_weights


def _leaf(params, *names):
    node = params["params"]
    for n in names:
        node = node[n]
    return np.asarray(node)


def make_keras_file(path, params):
    """Write an HDF5 file matching Keras 2.1.5 ``model.save()`` layout
    (the reference's model_geo.weight format, training.py:349):

      / attrs: keras_version, backend, model_config
      /model_weights attrs: layer_names (ALL layers, including weightless
          input/delta/flatten layers), keras_version, backend
      /model_weights/<layer> attrs: weight_names = [b'<layer>/kernel:0', ...]
      /model_weights/<layer>/<layer>/kernel:0 datasets (nested group via the
          slash in the dataset name)
      /optimizer_weights: Adagrad accumulators (must be ignored on import)

    Values are random but deterministic, shaped like our model's params."""
    rng = np.random.default_rng(0)
    layer_vars = {}
    p = params["params"]
    for conv in p["legs"]:
        layer_vars[conv] = {
            "kernel": rng.normal(size=p["legs"][conv]["kernel"].shape),
            "bias": rng.normal(size=p["legs"][conv]["bias"].shape),
        }
    for conv in ["c_conv1", "c_conv2", "c_conv3", "overlap_output"]:
        layer_vars[conv] = {
            "kernel": rng.normal(size=p["overlap_head"][conv]["kernel"].shape),
            "bias": rng.normal(size=p["overlap_head"][conv]["bias"].shape),
        }
    # weightless layers appear in layer_names with empty weight groups,
    # exactly like Keras writes them (reference generateNet.py:357-398)
    weightless = [
        "leg_input_l", "leg_input_r", "delta_layer",
        "normalized_correlation2d_1", "flatten_1", "orientation_output",
    ]
    with h5py.File(path, "w") as f:
        f.attrs["keras_version"] = b"2.1.5"
        f.attrs["backend"] = b"tensorflow"
        f.attrs["model_config"] = b'{"class_name": "Model", "config": {}}'
        g = f.create_group("model_weights")
        all_layers = weightless[:2] + list(layer_vars) + weightless[2:]
        g.attrs["layer_names"] = [n.encode() for n in all_layers]
        g.attrs["keras_version"] = b"2.1.5"
        g.attrs["backend"] = b"tensorflow"
        for layer in all_layers:
            lg = g.create_group(layer)
            names = []
            for var, arr in layer_vars.get(layer, {}).items():
                wn = f"{layer}/{var}:0"
                lg.create_dataset(wn, data=arr.astype(np.float32))
                names.append(wn.encode())
            lg.attrs["weight_names"] = names
        # optimizer state: present in model.save files, must not be imported
        og = f.create_group("optimizer_weights")
        og.attrs["weight_names"] = [b"training/Adagrad/accumulator_0:0"]
        og.create_dataset(
            "training/Adagrad/accumulator_0:0",
            data=np.full(p["legs"]["s_conv1"]["kernel"].shape, 9.9, np.float32),
        )
    return layer_vars


@pytest.fixture(scope="module")
def model_setup():
    cfg = ModelConfig(input_width=360)
    return cfg, init_params(cfg, num_channels=4, rng=0)


def test_roundtrip_import(model_setup, tmp_path):
    cfg, params = model_setup
    path = str(tmp_path / "model_geo.weight")
    truth = make_keras_file(path, params)

    flat = read_keras_weights(path)
    assert "s_conv1/kernel" in flat
    # optimizer accumulators live outside model_weights and must not leak in
    assert not any("accumulator" in k.lower() for k in flat)

    new = import_keras_weights(path, params)
    for conv, vs in truth.items():
        group = "legs" if conv.startswith("s_") else "overlap_head"
        np.testing.assert_allclose(
            _leaf(new, group, conv, "kernel"), vs["kernel"], rtol=1e-6
        )
        np.testing.assert_allclose(
            _leaf(new, group, conv, "bias"), vs["bias"], rtol=1e-6
        )
    # imported params still run
    import jax.numpy as jnp

    model = build_model(cfg)
    x = jnp.zeros((1, 64, cfg.input_width, 4))
    overlap, orient = model.apply(new, x, x)
    assert overlap.shape == (1, 1) and orient.shape == (1, leg_output_width(cfg))
    assert np.isfinite(np.asarray(overlap)).all()


def test_shape_mismatch_raises(model_setup, tmp_path):
    cfg, params = model_setup
    path = str(tmp_path / "bad.weight")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = [b"s_conv1"]
        lg = g.create_group("s_conv1")
        lg.create_dataset("s_conv1/kernel:0", data=np.zeros((3, 3, 1, 1), np.float32))
        lg.attrs["weight_names"] = [b"s_conv1/kernel:0"]
    with pytest.raises(ValueError, match="Shape mismatch"):
        import_keras_weights(path, params)


def test_no_match_raises(model_setup, tmp_path):
    cfg, params = model_setup
    path = str(tmp_path / "empty.weight")
    with h5py.File(path, "w") as f:
        f.create_group("model_weights").attrs["layer_names"] = []
    with pytest.raises(ValueError, match="No layers"):
        import_keras_weights(path, params)