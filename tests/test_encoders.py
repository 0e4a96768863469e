"""Encoder backbones: torch ground truth for the VGG trunk, shape contracts,
and torchvision state_dict converter mappings (synthetic weights — the
zero-egress test environment has no pretrained checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu.models import encoders


def test_vgg16_matches_torch_conv_stack():
    """Our NHWC trunk vs a torch Sequential with the exact torchvision
    config-D layout (conv indices 0..26, truncated after conv5_2+ReLU)."""
    torch = pytest.importorskip("torch")
    nn = torch.nn

    layers, cin = [], 3
    for ch in encoders._VGG_CHANNELS:
        if ch == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, ch, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = ch
    seq = nn.Sequential(*layers)

    sd = {f"features.{i}.{k}": v for i, m in enumerate(seq) for k, v in m.state_dict().items()}
    sd = {k: v.numpy() for k, v in sd.items()}
    params = encoders.from_torch_vgg16(sd)

    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(encoders.vgg16_features(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = seq(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    B, C, H, W = theirs.shape
    theirs = theirs.transpose(0, 2, 3, 1).reshape(B, H * W, C)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_resnet152_shape_and_block_count():
    params = encoders.init_resnet152(jax.random.PRNGKey(0))
    assert [len(l) for l in params["layers"]] == [3, 8, 36, 3]
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    out = encoders.resnet152_features(params, x)
    assert out.shape == (1, 2048)


def test_inception_v3_shape():
    params = encoders.init_inception_v3(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((1, 139, 139, 3)), jnp.float32)
    out = encoders.inception_v3_features(params, x)
    assert out.shape == (1, 2048)


def _fake_torch_sd_resnet152():
    """Synthetic state_dict with torchvision resnet152 names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.01

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, (n, w) in enumerate(zip([3, 8, 36, 3], [64, 128, 256, 512]), start=1):
        for bi in range(n):
            pre = f"layer{li}.{bi}"
            conv(f"{pre}.conv1", w, cin, 1)
            bn(f"{pre}.bn1", w)
            conv(f"{pre}.conv2", w, w, 3)
            bn(f"{pre}.bn2", w)
            conv(f"{pre}.conv3", w * 4, w, 1)
            bn(f"{pre}.bn3", w * 4)
            if bi == 0:
                conv(f"{pre}.downsample.0", w * 4, cin, 1)
                bn(f"{pre}.downsample.1", w * 4)
            cin = w * 4
    return sd


def test_from_torch_resnet152_converter():
    sd = _fake_torch_sd_resnet152()
    params = encoders.from_torch_resnet152(sd)
    assert [len(l) for l in params["layers"]] == [3, 8, 36, 3]
    # spot-check weight transposition: torch [cout,cin,kh,kw] -> HWIO
    assert params["stem_conv"]["w"].shape == (7, 7, 3, 64)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)
    out = encoders.resnet152_features(params, x)
    assert out.shape == (1, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_from_torch_inception_converter_roundtrip():
    """Init -> fake torch sd (inverse transpose) -> convert -> identical."""
    params = encoders.init_inception_v3(jax.random.PRNGKey(0))
    sd = {}
    for block, bp in params.items():
        if "conv" in bp:  # stem BasicConv2d
            branches = {"": bp}
        else:
            branches = bp
        for br, cp in branches.items():
            name = f"{block}.{br}" if br else block
            sd[f"{name}.conv.weight"] = np.asarray(cp["conv"]["w"]).transpose(3, 2, 0, 1)
            sd[f"{name}.bn.weight"] = np.asarray(cp["bn"]["scale"])
            sd[f"{name}.bn.bias"] = np.asarray(cp["bn"]["bias"])
            sd[f"{name}.bn.running_mean"] = np.asarray(cp["bn"]["mean"])
            sd[f"{name}.bn.running_var"] = np.asarray(cp["bn"]["var"])
    restored = encoders.from_torch_inception_v3(sd)
    x = jnp.asarray(np.random.default_rng(0).random((1, 139, 139, 3)), jnp.float32)
    a = np.asarray(encoders.inception_v3_features(params, x))
    b = np.asarray(encoders.inception_v3_features(restored, x))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bf16_trunk_close_to_fp32():
    params = encoders.init_vgg16(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
    f32 = np.asarray(encoders.vgg16_features(params, jnp.asarray(x)))
    bf = np.asarray(
        encoders.vgg16_features(params, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32)
    )
    denom = np.abs(f32).mean() + 1e-6
    assert np.abs(f32 - bf).mean() / denom < 0.05


def test_encoder_weights_config_wiring(tmp_path):
    """cfg.encoder_weights loads a torchvision state_dict into the frozen
    backbone (Trainer + Captioner paths)."""
    torch = pytest.importorskip("torch")
    nn = torch.nn

    layers, cin = [], 3
    for ch in encoders._VGG_CHANNELS:
        if ch == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, ch, 3, padding=1))
            layers.append(nn.ReLU())
            cin = ch
    seq = nn.Sequential(*layers)
    sd = {f"features.{i}.{k}": v for i, m in enumerate(seq) for k, v in m.state_dict().items()}
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.train.trainer import Trainer
    from show_and_tell_tpu.models.registry import build_model

    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, encoder_weights=path,
        expr_dir=str(tmp_path), max_epochs=0,
    )
    model = build_model(cfg, 9)
    t = Trainer(cfg, model, [], eval_fn=None)
    got = np.asarray(jax.tree.leaves(t.frozen)[0])
    want = np.asarray(sd["features.0.bias"])
    # first leaf of the converted tree is conv0's bias ('b' sorts before 'w')
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_avg_pool_matches_torch_count_include_pad():
    """Inception branch_pool parity: torch F.avg_pool2d defaults to
    count_include_pad=True (divide by k*k even at padded borders); our
    avg_pool default must match or imported Inception-v3 weights drift at
    every feature-map border."""
    torch = pytest.importorskip("torch")
    from show_and_tell_tpu.models.layers import avg_pool

    x = np.random.default_rng(0).random((2, 7, 7, 5)).astype(np.float32)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    ours = np.asarray(avg_pool(jnp.asarray(x), 3, 1, pad))
    with torch.no_grad():
        theirs = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 1, padding=1
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # the explicit opt-out divides by the valid-cell count instead
    excl = np.asarray(avg_pool(jnp.asarray(x), 3, 1, pad, count_include_pad=False))
    with torch.no_grad():
        theirs_excl = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 1, padding=1,
            count_include_pad=False,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(excl, theirs_excl, atol=1e-6)


@pytest.mark.parametrize(
    "k,stride,pad,cin",
    [(3, 1, "SAME", 3), (7, 2, 3, 3), (3, 2, "VALID", 3), (1, 1, "SAME", 4)],
)
def test_conv2d_im2col_stem_path_matches_lax_conv(k, stride, pad, cin):
    """The small-C_in im2col path (stem convs) must equal
    lax.conv_general_dilated across stride/padding shapes: VGG 3x3s1,
    ResNet 7x7s2p3, Inception 3x3s2 VALID."""
    from show_and_tell_tpu.models.layers import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 20, 20, cin)), jnp.float32)
    p = {
        "w": jnp.asarray(rng.standard_normal((k, k, cin, 16)) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32),
    }
    got = np.asarray(conv2d(p, x, stride=stride, padding=pad))
    padding = [(pad, pad), (pad, pad)] if isinstance(pad, int) else pad
    want = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
