"""show_and_tell_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A from-scratch rebuild of the capabilities of ``incredible-vision/show-and-tell``
(reference layout: ``main.py`` / ``train.py`` / ``models.py`` / ``model2.py`` /
``eval.py`` / ``preprocess.py`` / ``data_loader.py`` / ``pycocoevalcap``),
re-architected for TPU hardware:

- Models are Flax modules compiled with ``jax.jit``; the LSTM hot loop is a
  ``lax.scan`` over a fused 4-gate cell (XLA-fused by default — measured
  faster than the hand kernels at these shapes; the Pallas cell and fused
  attention kernels ship numerics-verified as opt-ins, see ops/ and
  docs/KERNELS.md).
- Decoding (greedy + batched beam search) runs fully on device with static
  shapes (the reference's ``sample_beam`` is an empty stub, model2.py:113-114).
- Scaling is SPMD over a ``jax.sharding.Mesh`` (axes ``data``/``model``) with
  XLA-inserted collectives over ICI — replacing the reference's
  single-process ``nn.DataParallel`` (train.py:44).
- The COCO caption metric suite (PTB tokenization, BLEU, METEOR, ROUGE-L,
  CIDEr, SPICE) is reimplemented JVM-free with a C++ fast path.
"""

__version__ = "0.1.0"

from show_and_tell_tpu.config import Config, parse_config, save_config  # noqa: F401
from show_and_tell_tpu.utils.vocab import Vocabulary  # noqa: F401
