"""Reference-checkpoint import: weight mapping + cross-implementation
logit parity against the ACTUAL reference modules.

The strongest parity proof in the suite: build the reference's own
`model2.ShowAttendTellModel` (imported from /root/reference, torchvision
shimmed — same recipe as benchmarks/reference_baseline.py), export its
state_dict, import it with ckpt.torch_import, and check OUR model computes
the same teacher-forced logits and the same encoder features. Conditioning
deviations (fresh-vs-stale decode context) don't enter: the compared math
is step-identical.
"""

import sys

import numpy as np
import pytest
import torch

from show_and_tell_tpu.ckpt import torch_import
from show_and_tell_tpu.config import Config


@pytest.fixture()
def reference_model2(monkeypatch):
    """Import /root/reference/model2.py with a torchvision shim (full VGG16
    features stack, random weights); restore sys.modules afterward."""
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


def _build_reference_sat(model2, vocab=40):
    torch.manual_seed(0)
    m = model2.ShowAttendTellModel(
        hidden_size=1024, context_size=512, vocab_size=vocab,
        embed_size=512, opt=None, feature_size=[9, 512],
    )
    with torch.no_grad():  # model2.py:20,25 leave these uninitialised
        m.image_att_w.uniform_(-0.1, 0.1)
        m.weight_att.uniform_(-0.1, 0.1)
    m.eval()
    return m


def test_import_show_attend_tell_logit_parity(reference_model2):
    import jax.numpy as jnp

    from show_and_tell_tpu.models.show_attend_tell import ShowAttendTellModel

    V, B, L, T = 40, 3, 9, 5
    ref = _build_reference_sat(reference_model2, vocab=V)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    trainable, frozen = torch_import.import_show_attend_tell(sd)
    assert frozen is not None  # encoder.* present in a full state_dict

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, L, 512)).astype(np.float32)
    captions = rng.integers(1, V, (B, T)).astype(np.int32)
    lengths = np.full((B,), T, np.int32)

    # --- torch side: the reference's per-step math on the same features ---
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
        ref_logits = torch.stack(ref_logits, 1).numpy()  # [B, T-1, V]

    # --- our side: decode_train on the imported params ---
    cfg = Config(embed_size=512, hidden_size=1024, dtype="float32")
    ours = ShowAttendTellModel(cfg, V)
    logits, mask, _ = ours.decode_train(
        trainable, jnp.asarray(feats), jnp.asarray(captions), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)
    assert bool(mask.all())


def test_import_show_attend_tell_encoder_features(reference_model2):
    import jax.numpy as jnp

    from show_and_tell_tpu.models.encoders import vgg16_features

    ref = _build_reference_sat(reference_model2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    _, frozen = torch_import.import_show_attend_tell(sd)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        f_t = ref.encoder(torch.from_numpy(img))  # [1, 512, 4, 4]
        f_t = f_t.view(1, 512, -1).transpose(2, 1).numpy()  # [1, 16, 512]
    f_j = np.asarray(
        vgg16_features(frozen, jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(f_j, f_t, atol=2e-3)


def test_import_show_tell_decoder_parity():
    import jax.numpy as jnp

    from show_and_tell_tpu.models.show_tell import ShowTellModel

    E, H, V, B, T, NL = 16, 24, 30, 4, 6, 2
    torch.manual_seed(1)
    embed = torch.nn.Embedding(V, E)
    lstm = torch.nn.LSTM(E, H, NL, batch_first=True)
    linear = torch.nn.Linear(H, V)
    sd = {}
    for name, mod in (("embed", embed), ("lstm", lstm), ("linear", linear)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()

    trainable, batch_stats, frozen = torch_import.import_show_tell(sd, num_layers=NL)
    assert batch_stats is None and frozen is None

    rng = np.random.default_rng(2)
    feat = rng.standard_normal((B, E)).astype(np.float32)
    captions = rng.integers(1, V, (B, T)).astype(np.int32)
    lengths = np.full((B,), T, np.int32)

    # torch side, replicating OUR conditioning (inputs: feature then
    # emb(c_1..c_{T-2}) — <start> never an input, show_tell.py decode_train)
    with torch.no_grad():
        emb = embed(torch.from_numpy(captions.astype(np.int64)))
        inp = torch.cat([torch.from_numpy(feat)[:, None, :], emb[:, 1:-1]], 1)
        hiddens, _ = lstm(inp)
        ref_logits = linear(hiddens).numpy()  # [B, T-1, V]

    cfg = Config(
        embed_size=E, hidden_size=H, num_layers=NL,
        model="show_tell", dtype="float32",
    )
    ours = ShowTellModel(cfg, V)
    base, _ = ours.init(__import__("jax").random.PRNGKey(0))
    # graft the imported decoder onto a full tree (proj/bn untouched)
    merged = {**base, **trainable}
    logits, mask = ours.decode_train(
        merged, jnp.asarray(feat), jnp.asarray(captions), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)


def test_load_reference_checkpoint_file(reference_model2, tmp_path):
    """torch.save round trip incl. the DataParallel ``module.`` prefix
    (train.py:44 wraps the model before state_dict is saved)."""
    ref = _build_reference_sat(reference_model2)
    wrapped = {f"module.{k}": v for k, v in ref.state_dict().items()}
    path = str(tmp_path / "model-best.pth")
    torch.save(wrapped, path)
    trainable, frozen = torch_import.load_reference_checkpoint(path)
    assert frozen is not None
    assert trainable["embed"].shape == (40, 512)
    assert trainable["lstm"]["w"].shape == (2048, 4096)
    np.testing.assert_allclose(
        np.asarray(trainable["att"]["w_img"]),
        ref.image_att_w.detach().numpy(),
        atol=0,
    )


def test_captioner_serves_reference_checkpoint(reference_model2, tmp_path):
    """The one-flag migration: Config(torch_checkpoint=...) serves a
    reference-trained model-best.pth end to end (frozen trunk included)."""
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary

    ref = _build_reference_sat(reference_model2)  # vocab 40
    path = str(tmp_path / "model-best.pth")
    torch.save(ref.state_dict(), path)
    vocab = Vocabulary.from_words([f"w{i}" for i in range(36)])
    assert len(vocab) == 40
    cfg = Config(
        embed_size=512, hidden_size=1024, crop_size=64, max_decode_len=4,
        beam_size=2, dtype="float32", torch_checkpoint=path,
    )
    cap = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2,))
    imgs = (np.random.default_rng(0).random((2, 256, 256, 3)) * 255).astype(np.uint8)
    caps = cap.caption_images(imgs, mode="greedy")
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_trainer_finetunes_from_reference_checkpoint(reference_model2, tmp_path):
    """Config.torch_checkpoint seeds TRAINING too (review fix: serve and
    evaluate honored the flag but the Trainer silently ignored it, so a
    "fine-tune the reference checkpoint" run trained from random weights)."""
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.trainer import Trainer

    ref = _build_reference_sat(reference_model2)
    path = str(tmp_path / "model-best.pth")
    torch.save(ref.state_dict(), path)
    cfg = Config(
        embed_size=512, hidden_size=1024, crop_size=64, dtype="float32",
        torch_checkpoint=path, expr_dir=str(tmp_path / "expr"),
    )
    model = build_model(cfg, 40)
    t = Trainer(cfg, model, [], eval_fn=None)
    np.testing.assert_allclose(
        np.asarray(t.state.params["att"]["w_img"]),
        ref.image_att_w.detach().numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(t.state.params["embed"]),
        ref.embedding.weight.detach().numpy(),
        atol=1e-6,
    )
