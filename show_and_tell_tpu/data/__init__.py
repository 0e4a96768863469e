from show_and_tell_tpu.data.preprocess import build_vocab, preprocess  # noqa: F401
from show_and_tell_tpu.data.dataset import CocoCaptionDataset  # noqa: F401
from show_and_tell_tpu.data.pipeline import make_loader  # noqa: F401
