"""Tests for the weight converter (synthetic torch-shaped state dicts),
timers, device monitor, misc utils, and the torchvision/resnet path."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")

from wild_visual_navigation_tpu.feature_extractor import FeatureExtractor
from wild_visual_navigation_tpu.models.resnet import make_resnet
from wild_visual_navigation_tpu.ops.segment_ops import segment_grid, segment_pyramid_pool
from wild_visual_navigation_tpu.utils.device_monitor import DeviceMonitor, SystemLevelDeviceMonitor, accumulate_memory
from wild_visual_navigation_tpu.utils.misc import create_experiment_folder, flatten_dict, get_confidence
from wild_visual_navigation_tpu.utils.timers import ClassContextTimer, ClassTimer, Timer, accumulate_time


def _synthetic_dino_sd(D=384, depth=12, patch=8, grid=28, heads=6, layerscale=False, registers=0):
    rng = np.random.RandomState(0)
    sd = {
        "cls_token": rng.randn(1, 1, D).astype(np.float32),
        "pos_embed": rng.randn(1, 1 + grid * grid, D).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(D, 3, patch, patch).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(D).astype(np.float32),
        "norm.weight": rng.randn(D).astype(np.float32),
        "norm.bias": rng.randn(D).astype(np.float32),
    }
    if registers:
        sd["register_tokens"] = rng.randn(1, registers, D).astype(np.float32)
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = rng.randn(D).astype(np.float32)
        sd[f"{b}.norm1.bias"] = rng.randn(D).astype(np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.randn(3 * D, D).astype(np.float32)
        sd[f"{b}.attn.qkv.bias"] = rng.randn(3 * D).astype(np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.randn(D, D).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.randn(D).astype(np.float32)
        sd[f"{b}.norm2.weight"] = rng.randn(D).astype(np.float32)
        sd[f"{b}.norm2.bias"] = rng.randn(D).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.randn(4 * D, D).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.randn(4 * D).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.randn(D, 4 * D).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.randn(D).astype(np.float32)
        if layerscale:
            sd[f"{b}.ls1.gamma"] = rng.randn(D).astype(np.float32)
            sd[f"{b}.ls2.gamma"] = rng.randn(D).astype(np.float32)
    return sd


def test_convert_dino_structure():
    from convert_dino_weights import convert_dino_state_dict, verify_against_model

    sd = _synthetic_dino_sd()
    params = convert_dino_state_dict(sd)
    assert verify_against_model(params, "dino", "vit_small", 8, input_size=64)
    # and it actually runs
    from wild_visual_navigation_tpu.models.vit import make_vit

    vit = make_vit("dino", "vit_small", 8, attention_impl="xla")
    out = vit.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.zeros((1, 3, 32, 32)))
    assert out["patch_tokens"].shape == (1, 16, 384)


def test_convert_dinov2_with_layerscale_and_registers():
    from convert_dino_weights import convert_dino_state_dict, verify_against_model

    sd = _synthetic_dino_sd(D=384, depth=12, patch=14, grid=37, layerscale=True, registers=0)
    params = convert_dino_state_dict(sd)
    assert verify_against_model(params, "dinov2", "vit_small", 14, input_size=56)


def test_convert_linear_transpose_semantics():
    """flax Dense(x) = x @ kernel + b must equal torch Linear: x @ W.T + b."""
    from convert_dino_weights import convert_dino_state_dict

    sd = _synthetic_dino_sd(D=8, depth=1, patch=8, grid=4, heads=2)
    params = convert_dino_state_dict(sd)
    W = sd["blocks.0.attn.qkv.weight"]
    kernel = params["params"]["block_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(kernel), W.T)


def test_resnet_pyramid_and_pooling():
    model = make_resnet("resnet18")
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(1), img)
    pyr = model.apply(params, img)
    assert pyr["layer1"].shape == (1, 64, 16, 16)
    assert pyr["layer4"].shape == (1, 512, 2, 2)
    seg = segment_grid(64, 64, cell_size=32)
    feat, valid = segment_pyramid_pool({k: v[0] for k, v in pyr.items()}, seg, 4)
    assert feat.shape == (4, 64 + 128 + 256 + 512)
    assert bool(valid.all())
    assert np.isfinite(np.asarray(feat)).all()


def test_facade_torchvision():
    fe = FeatureExtractor(
        key=jax.random.PRNGKey(0), segmentation_type="grid", feature_type="torchvision",
        input_size=64, cell_size=32, model_type="resnet18",
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    ex = fe.extract(img)
    assert ex.features.shape == (4, fe.feature_dim)


def test_convert_resnet_structure():
    import torch

    from convert_dino_weights import convert_resnet_state_dict

    # Build a torch-shaped resnet18 state dict from our flax shapes
    model = make_resnet("resnet18")
    img = jnp.zeros((1, 3, 64, 64))
    ref = model.init(jax.random.PRNGKey(0), img)

    rng = np.random.RandomState(0)
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = rng.randn(64).astype(np.float32)
    widths = [64, 128, 256, 512]
    for s, w in enumerate(widths, start=1):
        for b in range(2):
            pre = f"layer{s}.{b}"
            in_w = widths[s - 2] if (b == 0 and s > 1) else w
            sd[f"{pre}.conv1.weight"] = rng.randn(w, in_w, 3, 3).astype(np.float32)
            sd[f"{pre}.conv2.weight"] = rng.randn(w, w, 3, 3).astype(np.float32)
            for c in (1, 2):
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.bn{c}.{k}"] = rng.randn(w).astype(np.float32)
            if b == 0 and s > 1:
                sd[f"{pre}.downsample.0.weight"] = rng.randn(w, in_w, 1, 1).astype(np.float32)
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.downsample.1.{k}"] = rng.randn(w).astype(np.float32)
    params = convert_resnet_state_dict(sd)
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, params), img)
    assert out["layer4"].shape == (1, 512, 2, 2)


# ------------------------------------------------------------ timers etc


class _Thing:
    @accumulate_time
    def work(self, n):
        return sum(range(n))

    @accumulate_memory
    def alloc(self):
        return jnp.ones((16, 16))


def test_timers_accumulate_and_store(tmp_path):
    t = _Thing()
    for _ in range(3):
        t.work(1000)
    with ClassContextTimer(t, "block"):
        pass
    ct = ClassTimer([t], ["thing"])
    s = str(ct)
    assert "thing.work" in s and "n=3" in s
    path = ct.store(str(tmp_path))
    assert os.path.exists(path)
    assert "block" in open(path).read()


def test_device_monitor(tmp_path):
    t = _Thing()
    t.alloc()
    with DeviceMonitor("test", verbose=False) as m:
        _ = jnp.ones((8, 8))
    mon = SystemLevelDeviceMonitor([t], ["thing"])
    mon.update(step=0)
    path = mon.store(str(tmp_path))
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(str(tmp_path), "memory_thing.csv"))


def test_misc_utils(tmp_path):
    d = flatten_dict({"a": {"b": 1, "c": {"d": 2}}})
    assert d == {"a_b": 1, "a_c_d": 2}
    c = get_confidence(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(c, [0, 0.5, 1.0])
    p = create_experiment_folder("unit/test", timestamp=False, root=str(tmp_path))
    assert os.path.isdir(p)


def test_efficientnet_pyramid():
    from wild_visual_navigation_tpu.models.efficientnet import (
        efficientnet_pyramid_dim,
        make_efficientnet,
    )

    model = make_efficientnet("efficientnet_b0")
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), img)
    pyr = model.apply(params, img)
    assert pyr["layer1"].shape == (1, 24, 8, 8)
    assert pyr["layer2"].shape == (1, 40, 4, 4)
    assert pyr["layer3"].shape == (1, 112, 2, 2)
    assert pyr["layer4"].shape == (1, 320, 1, 1)
    assert efficientnet_pyramid_dim("efficientnet_b0") == 24 + 40 + 112 + 320
    assert np.isfinite(np.asarray(pyr["layer4"])).all()


def test_facade_efficientnet():
    fe = FeatureExtractor(
        key=jax.random.PRNGKey(0), segmentation_type="grid", feature_type="torchvision",
        input_size=64, cell_size=32, model_type="efficientnet_b0",
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    ex = fe.extract(img)
    assert ex.features.shape == (4, fe.feature_dim)


def test_config_surface_loads():
    """Every shipped YAML (default + 13 camera sets + robot profiles +
    resized variants — the reference's per-robot config surface) loads
    cleanly onto the node param dataclasses."""
    import glob

    from wild_visual_navigation_tpu.utils.loading import load_node_params

    inputs = sorted(glob.glob("configs/inputs/*.yaml"))
    assert len(inputs) == 13
    for overlay in inputs + sorted(glob.glob("configs/robots/*.yaml")) + [
        "configs/resized_all.yaml", "configs/resized_wide_angle_dual.yaml",
    ]:
        fe, ln = load_node_params("configs/default.yaml", overlay)
        assert fe.network_input_image_height in (224, 448)
        if "none" not in overlay:
            assert isinstance(fe.camera_topics, dict) and fe.camera_topics
            for cam, cfg in fe.camera_topics.items():
                assert "image_topic" in cfg and "scheduler_weight" in cfg
    # robot profiles override the footprint dimensions
    fe, ln = load_node_params("configs/default.yaml", "configs/robots/jackal.yaml")
    assert ln.robot_length == 0.5 and ln.base_frame == "base_link"
    fe, ln = load_node_params("configs/default.yaml", "configs/robots/anymal.yaml")
    assert ln.robot_length == 0.8 and ln.footprint_frame == "footprint"


def test_shipped_demo_checkpoint_loads():
    """assets/checkpoints/replay_demo_head.ckpt (trained by
    tools/train_demo_head.py on the replay world) must load onto
    quick_start's model shape — the shipped-checkpoint flow of the
    reference (quick_start.py:141-150)."""
    import pickle

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from wild_visual_navigation_tpu.models import get_model

    path = "assets/checkpoints/replay_demo_head.ckpt"
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload["step"] > 50
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 384, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, 384)))
    params = serialization.from_bytes(params, payload["params"])
    out = mlp.apply(params, jnp.ones((3, 384)))
    assert out.shape == (3, 1 + 384)
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()


def test_quickstart_golden_regression():
    """Deterministic end-to-end regression on the quick_start path
    (BASELINE config 1) against a committed golden — the tier SURVEY §4
    notes the reference lacks. Uses the shipped replay-trained head on
    the reference fixture image; loose tolerance absorbs cross-machine
    float variation. (The golden confidence is ~0 everywhere by design:
    the head was trained in the replay world, so the forest image is
    out-of-distribution and the confidence generator correctly reports
    'never seen this'.)"""
    import pickle

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from wild_visual_navigation_tpu.feature_extractor import FeatureExtractor
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops.resize import resize_image
    from wild_visual_navigation_tpu.utils import (
        ConfidenceConfig,
        confidence_init,
        reconstruction_confidence,
    )
    from wild_visual_navigation_tpu.utils.misc import load_test_image

    H = 112
    fe = FeatureExtractor(key=jax.random.PRNGKey(0), segmentation_type="slic", feature_type="dino",
                          input_size=H, patch_size=8, backbone_type="vit_small",
                          slic_num_components=100)
    model = get_model({"name": "SimpleMLP",
                       "simple_mlp_cfg": {"input_size": 384, "hidden_sizes": [256, 32, 1],
                                           "reconstruction": True}})
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 384)))
    cg = confidence_init()
    with open("assets/checkpoints/replay_demo_head.ckpt", "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params, payload["params"])
    cg = serialization.from_bytes(cg, payload["cg_state"])
    cfg = ConfidenceConfig(std_factor=0.5, method="latest_measurement")

    img = jnp.asarray(np.asarray(load_test_image())[..., ::6, ::6])
    ex = fe.extract(resize_image(img, H, None), return_dense_features=True)
    D_, Hh, Ww = ex.dense_features.shape
    x = ex.dense_features.reshape(D_, -1).T
    out = model.apply(params, x)
    trav = np.asarray(out[:, 0].reshape(Hh, Ww))
    conf = np.asarray(reconstruction_confidence(cfg, cg, x, out[:, 1:]).reshape(Hh, Ww))

    gold = np.load("assets/goldens/quickstart_forest_112.npz")
    assert trav.shape == gold["traversability"].shape
    assert np.abs(trav - gold["traversability"]).mean() < 0.02
    assert np.abs(conf - gold["confidence"]).mean() < 0.02
    # segmentation should agree for the vast majority of pixels (SLIC
    # label IDs are deterministic given the fixed init)
    seg_agree = (np.asarray(ex.segments) == gold["segments"]).mean()
    assert seg_agree > 0.95, seg_agree


def test_convert_reference_checkpoint_roundtrip(tmp_path):
    """tools/convert_reference_checkpoint.py: a reference-style .pt
    head (torch Linear/ReLU stack state dict, reference
    simple_mlp.py:10-39, plus the confidence_generator entry the
    released checkpoints carry, quick_start.py:141-150) converts to
    our payload and reproduces the torch forward to fp32 rounding."""
    import pickle

    import torch
    from flax import serialization

    from tools.convert_reference_checkpoint import convert_state_dict, main as convert_main
    from wild_visual_navigation_tpu.utils.confidence_generator import confidence_init

    D, hidden, nsig = 24, [48, 16], 1
    torch.manual_seed(0)
    # reference SimpleMLP structure: reconstruction=True widens the
    # last layer by input_size; sigmoid on the first nsig columns
    layers = torch.nn.Sequential(
        torch.nn.Linear(D, hidden[0]), torch.nn.ReLU(),
        torch.nn.Linear(hidden[0], hidden[1]), torch.nn.ReLU(),
        torch.nn.Linear(hidden[1], nsig + D),
    )
    sd = {f"layers.{i}.{p}": t for i, m in enumerate(layers)
          for p, t in getattr(m, "state_dict", dict)().items()}
    sd["confidence_generator"] = {
        "mean": torch.tensor(0.37), "std": torch.tensor(0.11), "var": torch.tensor(0.0121),
    }
    pt = tmp_path / "head.pt"
    torch.save(sd, pt)

    out = tmp_path / "head.ckpt"
    convert_main([str(pt), str(out)])

    with open(out, "rb") as f:
        payload = pickle.load(f)
    mlp, params0, _ = convert_state_dict(sd)
    assert payload["arch"] == {"input_size": D, "hidden_sizes": [48, 16, 1],
                               "reconstruction": True}
    params = serialization.from_bytes(params0, payload["params"])
    cg_state = serialization.from_bytes(confidence_init(), payload["cg_state"])
    assert abs(float(cg_state.mean) - 0.37) < 1e-6
    assert abs(float(cg_state.std) - 0.11) < 1e-6

    x = np.random.RandomState(1).randn(37, D).astype(np.float32)
    with torch.no_grad():
        ref = layers(torch.from_numpy(x))
        ref[:, :nsig] = torch.sigmoid(ref[:, :nsig])
    ours = mlp.apply(params, jnp.asarray(x))
    assert np.max(np.abs(np.asarray(ours) - ref.numpy())) < 1e-5


def test_convert_reference_checkpoint_no_reconstruction(tmp_path):
    """--no-reconstruction heads (last width == 1) convert and load:
    the arch payload records reconstruction=False and quick_start-style
    consumers produce all-ones confidence instead of crashing on an
    empty out[:, 1:]."""
    import pickle

    import torch
    from flax import serialization

    from tools.convert_reference_checkpoint import convert_state_dict, main as convert_main

    D = 12
    torch.manual_seed(1)
    layers = torch.nn.Sequential(
        torch.nn.Linear(D, 16), torch.nn.ReLU(), torch.nn.Linear(16, 1),
    )
    sd = {f"layers.{i}.{p}": t for i, m in enumerate(layers)
          for p, t in getattr(m, "state_dict", dict)().items()}
    pt = tmp_path / "head.pt"
    torch.save(sd, pt)
    out = tmp_path / "head.ckpt"
    convert_main([str(pt), str(out), "--no-reconstruction"])

    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["arch"] == {"input_size": D, "hidden_sizes": [16, 1],
                               "reconstruction": False}
    mlp, params0, _ = convert_state_dict(sd, reconstruction=False)
    params = serialization.from_bytes(params0, payload["params"])
    x = np.random.RandomState(2).randn(9, D).astype(np.float32)
    with torch.no_grad():
        ref = torch.sigmoid(layers(torch.from_numpy(x)))
    ours = mlp.apply(params, jnp.asarray(x))
    assert ours.shape == (9, 1)
    assert np.max(np.abs(np.asarray(ours) - ref.numpy())) < 1e-5
