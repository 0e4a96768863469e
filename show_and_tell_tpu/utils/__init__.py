from show_and_tell_tpu.utils.vocab import Vocabulary  # noqa: F401
from show_and_tell_tpu.utils.logging import setup_logging  # noqa: F401
from show_and_tell_tpu.utils.rng import KeyChain  # noqa: F401
from show_and_tell_tpu.utils.experiment import make_experiment_dir  # noqa: F401
