"""Reference-checkpoint EXPORT (ckpt/torch_export.py): bit-exact
round-trip through torch_import, and strict load + logit parity against
the ACTUAL reference modules (the reverse direction of
tests/test_torch_import.py — a TPU-trained model going back to torch)."""

import sys

import numpy as np
import pytest
import torch

from show_and_tell_tpu.ckpt import torch_export, torch_import
from show_and_tell_tpu.config import Config


@pytest.fixture()
def reference_model2(monkeypatch):
    """Same shim recipe as tests/test_torch_import.py."""
    import types

    def _vgg16_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=True))
                in_ch = v
        return torch.nn.Sequential(*layers)

    class _VGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg16 = lambda pretrained=False, **kw: _VGG()
    tv.models = tvm
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.models", tvm)
    monkeypatch.syspath_prepend("/root/reference")
    sys.modules.pop("model2", None)
    import model2

    yield model2
    sys.modules.pop("model2", None)


def _tree_allclose(a, b, atol=0.0):
    if isinstance(a, dict):
        assert set(a) == set(b), (sorted(a), sorted(b))
        for k in a:
            _tree_allclose(a[k], b[k], atol)
    elif isinstance(a, list):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _tree_allclose(x, y, atol)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_sat_export_import_roundtrip_bit_exact():
    import jax

    from show_and_tell_tpu.models.registry import build_model

    cfg = Config(embed_size=512, hidden_size=1024, dtype="float32")
    model = build_model(cfg, 40)
    params, frozen = model.init(jax.random.PRNGKey(0))
    sd = torch_export.export_show_attend_tell(params, frozen)
    back, frozen_back = torch_import.import_show_attend_tell(sd)
    _tree_allclose(back, params)
    _tree_allclose(frozen_back, frozen)


def test_sat_export_strict_loads_into_reference(reference_model2, tmp_path):
    """Our trained tree -> state_dict -> the reference's OWN module with
    strict=True -> identical teacher-forced logits on shared features."""
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.models.registry import build_model

    V, B, L, T = 40, 3, 9, 5
    cfg = Config(embed_size=512, hidden_size=1024, dtype="float32")
    ours = build_model(cfg, V)
    params, frozen = ours.init(jax.random.PRNGKey(3))

    path = str(tmp_path / "exported.pth")
    torch_export.export_checkpoint(cfg, params, path, frozen=frozen)
    sd = torch.load(path, map_location="cpu", weights_only=True)

    ref = reference_model2.ShowAttendTellModel(
        hidden_size=1024, context_size=512, vocab_size=V,
        embed_size=512, opt=None, feature_size=[L, 512],
    )
    ref.load_state_dict(sd, strict=True)  # every reference key present
    ref.eval()

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, L, 512)).astype(np.float32)
    captions = rng.integers(1, V, (B, T)).astype(np.int32)
    lengths = np.full((B,), T, np.int32)

    with torch.no_grad():
        f_t = torch.from_numpy(feats)
        ctx_enc = torch.bmm(
            f_t, ref.image_att_w.unsqueeze(0).expand(B, 512, 512)
        )
        h, c = ref.init_lstm(f_t)
        emb = ref.embedding(torch.from_numpy(captions.astype(np.int64)))
        ref_logits = []
        for t in range(T - 1):
            context, _ = ref.attention_layer(f_t, ctx_enc, h)
            h, c = ref.lstmcell(torch.cat([emb[:, t], context], 1), (h, c))
            ref_logits.append(ref.output_layer(context, h))
        ref_logits = torch.stack(ref_logits, 1).numpy()

    logits, mask, _ = ours.decode_train(
        params, jnp.asarray(feats), jnp.asarray(captions), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)
    assert bool(mask.all())


def test_show_tell_export_loads_into_torch_decoder():
    """Decoder export strict-loads into torch modules with the reference
    DecoderRNN's exact key names and reproduces our logits."""
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.models.show_tell import ShowTellModel

    E, H, V, B, T, NL = 16, 24, 30, 4, 6, 2
    cfg = Config(
        embed_size=E, hidden_size=H, num_layers=NL,
        model="show_tell", encoder="resnet152", dtype="float32",
    )
    ours = ShowTellModel(cfg, V)
    params, _ = ours.init(jax.random.PRNGKey(1))

    sd = torch_export.export_show_tell(params, num_layers=NL)
    dec_sd, enc_sd = torch_export.split_show_tell(sd)
    assert "resnet.fc.weight" in enc_sd and "bn.weight" in enc_sd

    embed = torch.nn.Embedding(V, E)
    lstm = torch.nn.LSTM(E, H, NL, batch_first=True)
    linear = torch.nn.Linear(H, V)
    holder = torch.nn.Module()
    holder.embed, holder.lstm, holder.linear = embed, lstm, linear
    holder.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in dec_sd.items()},
        strict=True,
    )

    rng = np.random.default_rng(2)
    feat = rng.standard_normal((B, E)).astype(np.float32)
    captions = rng.integers(1, V, (B, T)).astype(np.int32)
    lengths = np.full((B,), T, np.int32)
    with torch.no_grad():
        emb = embed(torch.from_numpy(captions.astype(np.int64)))
        inp = torch.cat([torch.from_numpy(feat)[:, None, :], emb[:, 1:-1]], 1)
        hiddens, _ = lstm(inp)
        ref_logits = linear(hiddens).numpy()

    logits, _ = ours.decode_train(
        params, jnp.asarray(feat), jnp.asarray(captions), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)


def test_export_cli_round_trips_through_torch_checkpoint(tmp_path):
    """expr-dir checkpoint -> cli.export_torch -> Config(torch_checkpoint=
    exported) serves the SAME greedy captions: the full reverse-migration
    workflow at the argv level."""
    import jax

    from show_and_tell_tpu import ckpt as ckpt_mod
    from show_and_tell_tpu.cli.export_torch import main as export_main
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.rng import KeyChain
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words([f"w{i}" for i in range(36)])
    vp = str(tmp_path / "vocab.json")
    vocab.save(vp)
    cfg = Config(
        embed_size=512, hidden_size=1024, crop_size=64, max_decode_len=4,
        beam_size=2, dtype="float32",
    )
    from show_and_tell_tpu.models.registry import build_model

    model = build_model(cfg, len(vocab))
    # the CLI re-inits with the same seed, so the frozen trunk matches
    params, frozen = model.init(KeyChain(cfg.random_seed).key("init"))
    expr = str(tmp_path / "expr")
    ckpt_mod.save_best(expr, params, None, {"best_val_score": 1.0})

    out = str(tmp_path / "model-best.pth")
    with pytest.raises(SystemExit, match="requires a value"):
        export_main(["--vocab_path", vp, "--export_path"])
    exported = export_main([
        "--vocab_path", vp, "--load_model_path", expr,
        "--embed_size", "512", "--hidden_size", "1024",
        "--crop_size", "64", "--max_decode_len", "4", "--beam_size", "2",
        "--dtype", "float32", f"--export_path={out}",  # = form (review fix)
    ])
    assert exported == out

    imgs = (np.random.default_rng(0).random((2, 256, 256, 3)) * 255).astype(
        np.uint8
    )
    cap_a = Captioner.from_checkpoint(cfg, expr, vocab, bucket_sizes=(2,))
    cap_a.frozen = frozen
    caps_native = cap_a.caption_images(imgs, mode="greedy")

    cfg_b = cfg.replace(torch_checkpoint=out)
    cap_b = Captioner.from_checkpoint(cfg_b, None, vocab, bucket_sizes=(2,))
    caps_torch = cap_b.caption_images(imgs, mode="greedy")
    assert caps_torch == caps_native
